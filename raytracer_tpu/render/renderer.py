"""Image-level render loops: uniform spp and reference-style adaptive.

Replaces Scene::raytraceImage's OpenMP bucket farm (src/Scene.cpp:86-217)
with ray-tile wavefronts: the image is flattened to a padded ray array,
processed tile-by-tile under lax.map (bounds peak memory the way 32x32
buckets bounded cache footprint), and sampled by a lax.scan over spp.
Multi-chip sharding wraps `render_tiles` via shard_map (see parallel/).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.types import Scene, Camera, RenderSettings
from ..core import vecmath as vm
from . import camera as cam_mod
from . import integrator


def _pixel_coords(settings: RenderSettings):
    W, H = settings.width, settings.height
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing='ij')
    return xs.reshape(-1), ys.reshape(-1)  # row 0 = bottom scanline


def _pad(x, tile):
    R = x.shape[0]
    pad = (-R) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x


@partial(jax.jit, static_argnames=('settings', 'spp'))
def render(scene: Scene, cam: Camera, settings: RenderSettings,
           key: jax.Array, spp: int = 1) -> jax.Array:
    """Uniform-spp render -> (H, W, 3) linear radiance.

    Each sample jitters uniformly in the pixel (the reference's adaptive
    quadrants collapse to [0,1) for the uniform mode) with per-sample DOF and
    shutter-time draws (src/Camera.cpp:116-175).
    """
    W, H = settings.width, settings.height
    px, py = _pixel_coords(settings)
    R = W * H
    tile = min(settings.ray_tile, R + (-R) % settings.ray_tile)
    px = _pad(px, tile)
    py = _pad(py, tile)
    n_tiles = px.shape[0] // tile

    def tile_fn(ti):
        start = ti * tile
        pxt = jax.lax.dynamic_slice(px, (start,), (tile,))
        pyt = jax.lax.dynamic_slice(py, (start,), (tile,))

        def body(acc, s):
            k = jax.random.fold_in(jax.random.fold_in(key, ti), s)
            k1, k2 = jax.random.split(k)
            rands = jax.random.uniform(k1, (tile, 5))
            o, d, t = cam_mod.eye_rays(cam, W, H, pxt, pyt,
                                       0.0, 1.0, 0.0, 1.0, rands)
            L = integrator.radiance(scene, settings, o, d, t, k2)
            return acc + L, None

        acc, _ = jax.lax.scan(body, jnp.zeros((tile, 3), jnp.float32),
                              jnp.arange(spp, dtype=jnp.int32))
        return acc / spp

    img = jax.lax.map(tile_fn, jnp.arange(n_tiles, dtype=jnp.int32))
    return img.reshape(-1, 3)[:R].reshape(H, W, 3)


@partial(jax.jit, static_argnames=('settings',))
def render_center(scene: Scene, cam: Camera, settings: RenderSettings,
                  key: jax.Array) -> jax.Array:
    """Deterministic center-of-pixel render (reference eyeRay path) — the
    CPU-runnable golden-test mode (BASELINE config #1)."""
    W, H = settings.width, settings.height
    o, d, t = cam_mod.center_rays(cam, W, H)
    L = integrator.radiance(scene, settings, o, d, t, key)
    return L.reshape(H, W, 3)


ADAPTIVE_CHUNK = 1024


@partial(jax.jit, static_argnames=('settings', 'with_counts'))
def render_adaptive(scene: Scene, cam: Camera, settings: RenderSettings,
                    key: jax.Array, with_counts: bool = False):
    """Adaptive progressive supersampling (Scene::adaptiveSampleScene,
    src/Scene.cpp:250-293).

    Levels k = 2..maxSubdivs add k^2 stratified samples; a pixel stops
    refining when the gamma-space max-channel delta drops below the noise
    threshold. The batched equivalent of the reference's per-pixel early
    exit: before each level the still-active pixels are COMPACTED to the
    front (argsort on the active mask) and only ceil(n_active/CHUNK) fixed
    -size chunks are rendered under a dynamic-trip-count while_loop, so the
    per-level cost scales with the unconverged pixel count instead of the
    image size. Per-pixel RNG keys (fold_in by pixel id) make the estimator
    independent of the compaction layout.

    Not reverse-mode differentiable (dynamic while_loop); training uses
    `render`. with_counts=True also returns the per-pixel sample counts.
    """
    W, H = settings.width, settings.height
    px, py = _pixel_coords(settings)
    R = W * H
    tile = min(settings.ray_tile, R + (-R) % settings.ray_tile)
    px = _pad(px, tile)
    py = _pad(py, tile)
    n_tiles = px.shape[0] // tile
    # largest divisor of tile <= ADAPTIVE_CHUNK: the lvl1 fori and the
    # compacted chunk loops cover the tile in exact CH-sized pieces (a
    # non-divisor CH would leave tail pixels unsampled at level 1)
    CH = max(c for c in range(1, min(ADAPTIVE_CHUNK, tile) + 1)
             if tile % c == 0)

    def tile_fn(ti):
        start = ti * tile
        pxt = jax.lax.dynamic_slice(px, (start,), (tile,))
        pyt = jax.lax.dynamic_slice(py, (start,), (tile,))
        kt = jax.random.fold_in(key, ti)

        def sample_ids(ids, lo_x, hi_x, lo_y, hi_y, kcell):
            """One stratified sample for the CH pixels `ids`."""
            keys = jax.vmap(jax.random.fold_in, (None, 0))(kcell, ids)
            rands = jax.vmap(
                lambda k: jax.random.uniform(k, (5,)))(keys)
            o, d, t = cam_mod.eye_rays(cam, W, H, pxt[ids], pyt[ids],
                                       lo_x, hi_x, lo_y, hi_y, rands)
            return integrator.radiance(scene, settings, o, d, t, kcell)

        # level 1: one center-quadrant sample for every pixel, CH at a time
        k0 = jax.random.fold_in(kt, 0)
        init = jnp.zeros((tile, 3), jnp.float32)

        def lvl1_body(c, acc):
            ids = jax.lax.dynamic_slice(jnp.arange(tile, dtype=jnp.int32),
                                        (c * CH,), (CH,))
            L = sample_ids(ids, 0.5, 0.5, 0.5, 0.5, k0)
            return acc.at[ids].set(L)

        result = jax.lax.fori_loop(0, tile // CH, lvl1_body, init)
        active = jnp.ones(tile, bool)
        counts = jnp.ones(tile, jnp.int32)

        def get_sum(n):  # sum of squares 1..n (src/Scene.cpp:245-248)
            return n * (n + 1) * (2 * n + 1) / 6.0

        for level in range(2, settings.max_subdivs + 1):
            kl = jax.random.fold_in(kt, level)
            n_pre = get_sum(level - 1)
            n_now = level * level
            # compact: active pixel ids first (stable sort keeps raster order)
            order = jnp.argsort(~active).astype(jnp.int32)
            n_act = jnp.sum(active.astype(jnp.int32))
            n_chunks = (n_act + CH - 1) // CH

            def chunk_body(state):
                c, result, active, counts = state
                ids = jax.lax.dynamic_slice(order, (c * CH,), (CH,))
                upd = active[ids]
                cur = jnp.zeros((CH, 3), jnp.float32)
                for i in range(level):
                    for j in range(level):
                        off = 1.0 / level
                        cur = cur + sample_ids(
                            ids, i * off, (i + 1) * off, j * off,
                            (j + 1) * off,
                            jax.random.fold_in(kl, i * level + j))
                old = result[ids]
                new = (old * n_pre + cur) / (n_pre + n_now)
                delta = jnp.abs(vm.linear_to_gamma_f(old)
                                - vm.linear_to_gamma_f(new))
                converged = jnp.max(delta, axis=-1) < settings.noise_threshold
                result = result.at[ids].set(jnp.where(upd[:, None], new, old))
                counts = counts.at[ids].add(jnp.where(upd, n_now, 0))
                if level >= settings.min_subdivs:
                    active = active.at[ids].set(upd & ~converged)
                return (c + 1, result, active, counts)

            _, result, active, counts = jax.lax.while_loop(
                lambda s: s[0] < n_chunks, chunk_body,
                (jnp.int32(0), result, active, counts))
        return result, counts

    img, counts = jax.lax.map(tile_fn, jnp.arange(n_tiles, dtype=jnp.int32))
    img = img.reshape(-1, 3)[:R].reshape(H, W, 3)
    if with_counts:
        return img, counts.reshape(-1)[:R].reshape(H, W)
    return img


def to_u8(img: jax.Array) -> jax.Array:
    """Linear radiance -> gamma 8-bit (reference Image::Map tone map)."""
    return vm.tone_map_u8(img)
