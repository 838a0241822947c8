"""Procedural textures: improved Perlin noise and the Worley stone texture.

Mirrors PerlinNoise (reference: src/Perlin.h:13-54, Ken Perlin's improved
noise with the standard 512-entry permutation table) and StoneTexture
(src/StoneTexture.cpp:10-109: F2-F1 Worley cellular distance thresholded into
stone/grout, modulated by Perlin noise).

`perlin_noise` / `stone_lookup` are jnp functions usable inside jit (batched
over arbitrary shapes). `bake_stone_texture` rasterizes the stone texture into
a bitmap for the flat texture pool — on TPU a baked texture is a gather, which
beats re-evaluating a 100-cell Worley search per hit; the bake resolution is
the reference's own 256-cell domain so no detail is lost.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Ken Perlin's permutation table (public domain, also src/Perlin.cpp:3-38)
_PERM = np.array([
    151, 160, 137, 91, 90, 15, 131, 13, 201, 95, 96, 53, 194, 233, 7, 225,
    140, 36, 103, 30, 69, 142, 8, 99, 37, 240, 21, 10, 23, 190, 6, 148,
    247, 120, 234, 75, 0, 26, 197, 62, 94, 252, 219, 203, 117, 35, 11, 32,
    57, 177, 33, 88, 237, 149, 56, 87, 174, 20, 125, 136, 171, 168, 68, 175,
    74, 165, 71, 134, 139, 48, 27, 166, 77, 146, 158, 231, 83, 111, 229, 122,
    60, 211, 133, 230, 220, 105, 92, 41, 55, 46, 245, 40, 244, 102, 143, 54,
    65, 25, 63, 161, 1, 216, 80, 73, 209, 76, 132, 187, 208, 89, 18, 169,
    200, 196, 135, 130, 116, 188, 159, 86, 164, 100, 109, 198, 173, 186, 3, 64,
    52, 217, 226, 250, 124, 123, 5, 202, 38, 147, 118, 126, 255, 82, 85, 212,
    207, 206, 59, 227, 47, 16, 58, 17, 182, 189, 28, 42, 223, 183, 170, 213,
    119, 248, 152, 2, 44, 154, 163, 70, 221, 153, 101, 155, 167, 43, 172, 9,
    129, 22, 39, 253, 19, 98, 108, 110, 79, 113, 224, 232, 178, 185, 112, 104,
    218, 246, 97, 228, 251, 34, 242, 193, 238, 210, 144, 12, 191, 179, 162, 241,
    81, 51, 145, 235, 249, 14, 239, 107, 49, 192, 214, 31, 181, 199, 106, 157,
    184, 84, 204, 176, 115, 121, 50, 45, 127, 4, 150, 254, 138, 236, 205, 93,
    222, 114, 67, 29, 24, 72, 243, 141, 128, 195, 78, 66, 215, 61, 156, 180,
], np.int32)
_PERM512 = jnp.asarray(np.concatenate([_PERM, _PERM]))


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def _grad(h, x, y, z):
    """Gradient dot product (src/Perlin.h:45-51), branchless."""
    h = h & 15
    u = jnp.where(h < 8, x, y)
    v = jnp.where(h < 4, y, jnp.where((h == 12) | (h == 14), x, z))
    return jnp.where(h & 1 == 0, u, -u) + jnp.where(h & 2 == 0, v, -v)


def perlin_noise(x, y, z):
    """Improved Perlin noise, batched over any shape (src/Perlin.h:16-40)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    z = jnp.asarray(z, jnp.float32)
    xf = jnp.floor(x)
    yf = jnp.floor(y)
    zf = jnp.floor(z)
    X = xf.astype(jnp.int32) & 255
    Y = yf.astype(jnp.int32) & 255
    Z = zf.astype(jnp.int32) & 255
    x = x - xf
    y = y - yf
    z = z - zf
    u = _fade(x)
    v = _fade(y)
    w = _fade(z)
    p = _PERM512
    A = p[X] + Y
    AA = p[A] + Z
    AB = p[A + 1] + Z
    B = p[X + 1] + Y
    BA = p[B] + Z
    BB = p[B + 1] + Z

    def lerp(t, a, b):
        return a + t * (b - a)

    return lerp(w,
                lerp(v,
                     lerp(u, _grad(p[AA], x, y, z),
                          _grad(p[BA], x - 1, y, z)),
                     lerp(u, _grad(p[AB], x, y - 1, z),
                          _grad(p[BB], x - 1, y - 1, z))),
                lerp(v,
                     lerp(u, _grad(p[AA + 1], x, y, z - 1),
                          _grad(p[BA + 1], x - 1, y, z - 1)),
                     lerp(u, _grad(p[AB + 1], x, y - 1, z - 1),
                          _grad(p[BB + 1], x - 1, y - 1, z - 1))))


TEX_SIZE = 256  # reference StoneTexture domain (src/StoneTexture.h)

STONE_RGB = (160 / 255.0, 82 / 255.0, 45 / 255.0)   # src/StoneTexture.cpp:11-13
GROUT_RGB = (250 / 255.0, 235 / 255.0, 215 / 255.0)  # src/StoneTexture.cpp:16-18


def make_stone_cells(num_cells: int = 100, seed: int = 3163513):
    """Random Worley cell centers in the 256^2 domain + the F2-F1
    normalization bounds (src/StoneTexture.cpp:20-53). The reference uses
    libc rand(); we use a fixed-seed generator for reproducibility."""
    rng = np.random.default_rng(seed)
    pts = rng.integers(0, TEX_SIZE, size=(num_cells, 2)).astype(np.float32)
    # normalization pass over the full domain (vectorized numpy)
    w = np.arange(TEX_SIZE, dtype=np.float32)
    gx, gy = np.meshgrid(w, w, indexing='ij')
    d2 = (pts[:, 0][:, None, None] - gx) ** 2 \
        + (pts[:, 1][:, None, None] - gy) ** 2   # (C, S, S)
    part = np.partition(d2, 1, axis=0)
    f21 = np.sqrt(part[1]) - np.sqrt(part[0])
    return pts, float(f21.min()), float(f21.max())


def stone_lookup(u, v, cells, min_d, max_d, num_cells=100):
    """Worley F2-F1 stone/grout color (src/StoneTexture.cpp:61-104), jnp.

    u, v: arrays of texture coords; cells: (C, 2) centers.
    """
    u = u - jnp.trunc(u)
    v = v - jnp.trunc(v)
    u = jnp.where(u < 0, u + 1.0, u)
    v = jnp.where(v < 0, v + 1.0, v)
    v = 1.0 - v
    px = u * TEX_SIZE
    py = v * TEX_SIZE
    d2 = (cells[:, 0] - px[..., None]) ** 2 + (cells[:, 1] - py[..., None]) ** 2
    # F1/F2 + argmin without sort: two-pass min
    f1 = jnp.min(d2, axis=-1)
    cell = jnp.argmin(d2, axis=-1)
    d2_masked = jnp.where(d2 == f1[..., None], jnp.inf, d2)
    f2 = jnp.min(d2_masked, axis=-1)
    fd = jnp.sqrt(f2) - jnp.sqrt(f1)
    mask = jnp.where((fd - min_d) / (max_d - min_d) > 0.05, 1.0, 0.0)
    cn = 0.5 * perlin_noise(255.0 * cell.astype(jnp.float32) / num_cells,
                            jnp.ones_like(px), jnp.ones_like(px))
    grout = 0.5 + 0.5 * perlin_noise(255.0 * u, 255.0 * v, jnp.ones_like(px))
    sn = 0.05 * perlin_noise(64.0 * u, 64.0 * v, jnp.ones_like(px))
    st = jnp.asarray(STONE_RGB)
    gr = jnp.asarray(GROUT_RGB)
    cmod = jnp.stack([cn, cn * 0.2, cn * 0.1], -1)
    return sn[..., None] + (st + cmod) * mask[..., None] \
        + gr * ((1.0 - mask) * grout)[..., None]


def bake_stone_texture(num_cells: int = 100, size: int = 512,
                       seed: int = 3163513) -> np.ndarray:
    """Rasterize the stone texture -> (size, size, 3) float32, top-row-first
    (ready for SceneBuilder.add_texture)."""
    cells, mn, mx = make_stone_cells(num_cells, seed)
    # sample at texel centers in user-uv space; the loader convention is
    # top-row-first with a v flip at lookup, so bake rows v=1..0
    us = (np.arange(size) + 0.5) / size
    vs = 1.0 - (np.arange(size) + 0.5) / size
    uu, vv = np.meshgrid(us, vs, indexing='xy')
    img = stone_lookup(jnp.asarray(uu), jnp.asarray(vv), jnp.asarray(cells),
                       mn, mx, num_cells)
    return np.asarray(img, np.float32)


def bake_perlin_texture(size: int = 512, scale: float = 8.0,
                        z: float = 0.5) -> np.ndarray:
    """Grayscale Perlin bitmap in [0,1] for the texture pool."""
    us = (np.arange(size) + 0.5) / size * scale
    uu, vv = np.meshgrid(us, us, indexing='xy')
    img = 0.5 + 0.5 * perlin_noise(jnp.asarray(uu), jnp.asarray(vv),
                                   jnp.full_like(jnp.asarray(uu), z))
    return np.asarray(img, np.float32)[..., None]
