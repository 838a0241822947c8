"""Pallas TPU kernels for the hot intersection ops.

`mt_kernel` is the (RAY_TILE x TRI_TILE)-blocked Moller-Trumbore sweep — the
TPU analogue of the reference's SSE 4-wide triangle packets (src/BVH.cpp:1297).
On non-TPU backends the kernels run in interpreter mode so the test suite
exercises them on CPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.types import Scene
from ...core.vecmath import MIRO_TMAX
from ..intersect import Hit, brute_force_trace
from . import mt_kernel


def _interpret() -> bool:
    return jax.default_backend() != 'tpu'


def pallas_brute_trace(scene: Scene, o, d, time, tmin, tmax,
                       any_hit: bool = False) -> Hit:
    """Brute-force tracer backed by the Pallas MT kernel.

    Motion blur needs per-ray vertex lerp (ray-varying triangles break the
    (ray x tri) blocking) and alpha cutout needs texture gathers; both fall
    back to the jnp brute-force path. any_hit reuses the nearest-hit sweep
    (a hit is a hit; the wavefront shadow test only consumes hit.valid).
    """
    if scene.has_motion_blur or scene.has_alpha_maps:
        from ...utils import console
        console.debug(
            "intersector='pallas' downgraded to the jnp brute-force path "
            '(motion blur / alpha cutout are handled outside the MT '
            'kernel); use the cluster kernels for these scenes')
        return brute_force_trace(scene, o, d, time, tmin, tmax, any_hit)
    geom = jax.lax.stop_gradient(scene.geom)
    f = geom.face_v
    p0 = geom.vertices[f[:, 0]]
    p1 = geom.vertices[f[:, 1]]
    p2 = geom.vertices[f[:, 2]]
    valid = jnp.ones((f.shape[0],), jnp.int32)
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    tmin = jax.lax.stop_gradient(tmin)
    tmax = jax.lax.stop_gradient(tmax)
    t, tri, a, b = mt_kernel.mt_trace_pallas(o, d, p0, p1, p2, valid,
                                             tmin, tmax,
                                             interpret=_interpret())
    return Hit(t=t, tri=tri, inst=jnp.zeros_like(tri), a=a, b=b)
