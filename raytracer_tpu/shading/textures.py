"""Device-side texture sampling from the flat texel pool.

Mirrors Texture::getLookup / getLookupAlpha / getLookupXYZ3
(reference: src/Texture.cpp:12-125): wrap to [0,1), flip v, bilinear filter
with tiled pixel fetch, lat-long env mapping. All functions are batched over
arbitrary leading axes and differentiable w.r.t. TexturePack.data.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import TexturePack
from ..core.vecmath import PI, INV_PI


def _fetch_pixel(tp: TexturePack, off, w, h, c, x, y):
    """Tiled pixel fetch -> (..., 4) RGBA (reference getPixel,
    src/Texture.cpp:100-125). x,y int32 arrays, may exceed bounds by one."""
    x = jnp.remainder(x, w)
    y = jnp.remainder(y, h)
    base = off + (y * w + x) * c
    # fetch up to 4 consecutive channels, clamped to the pool
    n = tp.data.shape[0]
    k = jnp.arange(4, dtype=jnp.int32)
    idx = jnp.clip(base[..., None] + jnp.minimum(k, c[..., None] - 1), 0, n - 1)
    vals = tp.data[idx]                                   # (..., 4)
    gray = c[..., None] == 1
    rgb = jnp.where(gray, vals[..., 0:1], vals[..., :3])
    alpha = jnp.where(c >= 4, vals[..., 3], 1.0)
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)


def _wrap_uv(u, v):
    u = u - jnp.trunc(u)
    v = v - jnp.trunc(v)
    u = jnp.where(u < 0, u + 1.0, u)
    v = jnp.where(v < 0, v + 1.0, v)
    return u, 1.0 - v  # v flip (src/Texture.cpp:53-54)


def tex_lookup(tp: TexturePack, tex_id, u, v):
    """Bilinear RGBA lookup -> (..., 4). tex_id < 0 is clamped to 0; callers
    mask the result (reference code checks the map pointer instead)."""
    tid = jnp.maximum(tex_id, 0)
    off = tp.offset[tid]
    w = tp.width[tid]
    h = tp.height[tid]
    c = tp.channels[tid]
    u, v = _wrap_uv(u, v)
    px = u * w
    py = v * h
    x1 = jnp.floor(px)
    y1 = jnp.floor(py)
    dx = (px - x1)[..., None]
    dy = (py - y1)[..., None]
    x1 = x1.astype(jnp.int32)
    y1 = y1.astype(jnp.int32)
    q11 = _fetch_pixel(tp, off, w, h, c, x1, y1)
    q21 = _fetch_pixel(tp, off, w, h, c, x1 + 1, y1)
    q12 = _fetch_pixel(tp, off, w, h, c, x1, y1 + 1)
    q22 = _fetch_pixel(tp, off, w, h, c, x1 + 1, y1 + 1)
    q1 = q11 * (1.0 - dx) + q21 * dx
    q2 = q12 * (1.0 - dx) + q22 * dx
    return q1 * (1.0 - dy) + q2 * dy


def tex_lookup3(tp: TexturePack, tex_id, u, v):
    return tex_lookup(tp, tex_id, u, v)[..., :3]


def tex_lookup_alpha(tp: TexturePack, tex_id, u, v):
    return tex_lookup(tp, tex_id, u, v)[..., 3]


def env_lookup(tp: TexturePack, tex_id, direction):
    """Lat-long environment lookup (src/Texture.cpp:90-98):
    theta = atan2(z, x) + pi; phi = acos(y); u = theta/2pi; v = 1 - phi/pi."""
    d = direction
    theta = jnp.arctan2(d[..., 2], d[..., 0]) + PI
    phi = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    u = theta * 0.5 * INV_PI
    v = 1.0 - phi * INV_PI
    return tex_lookup3(tp, tex_id, u, v)
