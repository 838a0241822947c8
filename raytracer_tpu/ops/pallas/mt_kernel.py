"""Pallas TPU kernel: blocked ray x triangle Moller-Trumbore intersection.

The TPU generalization of the reference's hand-written SSE triangle packets
(intersect4, src/BVH.cpp:1297-1459; Havel-Herout single-ray SSE,
src/Object.cpp:45-107): where SSE tests 1 ray against 4 triangles per
instruction, this kernel tests a (RAY_TILE x TRI_TILE) block per VPU pass.

Layout: rays as (R, 1) column blocks, triangle vertex components as (1, T)
row blocks; every intermediate broadcasts to (RAY_TILE, TRI_TILE) elementwise
ops on the VPU — no gathers, triangles stream linearly through VMEM. The
grid is (ray_tiles, tri_tiles) with the output block pinned per ray tile, so
tri tiles accumulate a running best hit in place (the Pallas revisiting
pattern).

Used for: brute-force scenes (the reference's no-BVH linear fallback,
src/BVH.cpp:1114-1126), the golden-oracle path, and as the leaf-stage
building block for cluster-style acceleration. Traversal-selected hits are
re-derived differentiably by ops.intersect.refine_hit, so this kernel needs
no VJP (it returns ids + stop-gradient floats like every tracer here).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...core.vecmath import MIRO_TMAX

RAY_TILE = 256
TRI_TILE = 512
_BIG = 3.0e38  # plain float: jnp scalars would be captured as tracer consts



def _out_struct(shape, dtype, like):
    """ShapeDtypeStruct varying over the same mesh axes as `like` (required
    by shard_map's check_vma for pallas_call outputs)."""
    import jax
    vma = getattr(jax.typeof(like), 'vma', frozenset())
    try:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    except TypeError:  # older jax without the vma kwarg
        return jax.ShapeDtypeStruct(shape, dtype)

def _mt_block(o, d, p0, p1, p2, tmin, tmax):
    """Moller-Trumbore on an (RT, TT) block. o,d: [(RT,1)]*3; p*: [(1,TT)]*3
    per component. Returns (t, a, b, ok) each (RT, TT)."""
    ox, oy, oz = o
    dx, dy, dz = d
    e0x = p1[0] - p0[0]
    e0y = p1[1] - p0[1]
    e0z = p1[2] - p0[2]
    e1x = p2[0] - p0[0]
    e1y = p2[1] - p0[1]
    e1z = p2[2] - p0[2]
    # pvec = d x e1
    pvx = dy * e1z - dz * e1y
    pvy = dz * e1x - dx * e1z
    pvz = dx * e1y - dy * e1x
    det = e0x * pvx + e0y * pvy + e0z * pvz
    inv_det = 1.0 / det                       # inf on det==0; rejected below
    tvx = ox - p0[0]
    tvy = oy - p0[1]
    tvz = oz - p0[2]
    a = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    # qvec = tvec x e0
    qvx = tvy * e0z - tvz * e0y
    qvy = tvz * e0x - tvx * e0z
    qvz = tvx * e0y - tvy * e0x
    b = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (e1x * qvx + e1y * qvy + e1z * qvz) * inv_det
    ok = (a >= 0.0) & (a <= 1.0) & (b >= 0.0) & (a + b <= 1.0) \
        & (det != 0.0) & (t >= tmin) & (t < tmax)
    return t, a, b, ok


def _kernel(o_ref, d_ref, p0_ref, p1_ref, p2_ref, valid_ref, tmin_ref,
            tmax_ref, t_out, tri_out, a_out, b_out):
    import jax.experimental.pallas as pl

    jt = pl.program_id(1)

    @pl.when(jt == 0)
    def _():
        t_out[:] = jnp.full_like(t_out, _BIG)
        tri_out[:] = jnp.full_like(tri_out, -1)
        a_out[:] = jnp.zeros_like(a_out)
        b_out[:] = jnp.zeros_like(b_out)

    o = (o_ref[:, 0:1], o_ref[:, 1:2], o_ref[:, 2:3])       # (RT,1) each
    d = (d_ref[:, 0:1], d_ref[:, 1:2], d_ref[:, 2:3])
    p0 = (p0_ref[0:1, :], p0_ref[1:2, :], p0_ref[2:3, :])   # (1,TT) each
    p1 = (p1_ref[0:1, :], p1_ref[1:2, :], p1_ref[2:3, :])
    p2 = (p2_ref[0:1, :], p2_ref[1:2, :], p2_ref[2:3, :])
    tmin = tmin_ref[:, 0:1]
    tmax = jnp.minimum(tmax_ref[:, 0:1], t_out[:, 0:1])

    t, a, b, ok = _mt_block(o, d, p0, p1, p2, tmin, tmax)
    ok = ok & (valid_ref[0:1, :] > 0)
    t = jnp.where(ok, t, _BIG)

    # nearest lane per ray (reference picks min-t lane, src/BVH.cpp:1372-1395)
    best = jnp.min(t, axis=1, keepdims=True)                 # (RT,1)
    found = best < t_out[:, 0:1]
    # index of the winning lane: first argmin
    tt = t.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    lane_sel = jnp.min(jnp.where(t <= best, lane, tt), axis=1, keepdims=True)
    lane_sel = jnp.minimum(lane_sel, tt - 1)
    one_hot = lane == lane_sel
    pick = lambda x: jnp.sum(jnp.where(one_hot, x, 0.0), axis=1,
                             keepdims=True)
    tri_id = jt * tt + lane_sel
    t_out[:] = jnp.where(found, best, t_out[:])
    tri_out[:] = jnp.where(found, tri_id, tri_out[:])
    a_out[:] = jnp.where(found, pick(a), a_out[:])
    b_out[:] = jnp.where(found, pick(b), b_out[:])


@functools.partial(jax.jit, static_argnames=('interpret',))
def mt_trace_pallas(o, d, p0, p1, p2, valid, tmin, tmax, interpret=False):
    """All-pairs nearest-hit search: rays (R,3) x triangles (T,3 per corner).

    valid: (T,) bool/int — padding lanes. Returns (t, tri, a, b) with
    t=MIRO_TMAX / tri=-1 on miss. Non-differentiable (ids + pinned floats).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = o.shape[0]
    T = p0.shape[0]
    rpad = (-R) % RAY_TILE
    tpad = (-T) % TRI_TILE
    f32 = jnp.float32

    o = jnp.pad(o.astype(f32), ((0, rpad), (0, 0)))
    d = jnp.pad(d.astype(f32), ((0, rpad), (0, 0)), constant_values=1.0)
    tmin = jnp.pad(jnp.broadcast_to(tmin, (R,)).astype(f32)[:, None],
                   ((0, rpad), (0, 0)))
    tmax = jnp.pad(jnp.broadcast_to(tmax, (R,)).astype(f32)[:, None],
                   ((0, rpad), (0, 0)))
    # triangle components transposed to (3, T) rows for (1, TT) lane blocks
    p0 = jnp.pad(p0.astype(f32), ((0, tpad), (0, 0))).T
    p1 = jnp.pad(p1.astype(f32), ((0, tpad), (0, 0))).T
    p2 = jnp.pad(p2.astype(f32), ((0, tpad), (0, 0))).T
    valid = jnp.pad(valid.astype(jnp.int32), (0, tpad))[None, :]

    Rp, Tp = R + rpad, T + tpad
    grid = (Rp // RAY_TILE, Tp // TRI_TILE)

    ray_spec = pl.BlockSpec((RAY_TILE, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    ray3_spec = pl.BlockSpec((RAY_TILE, 3), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((3, TRI_TILE), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)
    valid_spec = pl.BlockSpec((1, TRI_TILE), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM)
    out_f = pl.BlockSpec((RAY_TILE, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)

    t, tri, a, b = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[ray3_spec, ray3_spec, tri_spec, tri_spec, tri_spec,
                  valid_spec, ray_spec, ray_spec],
        out_specs=(out_f, pl.BlockSpec((RAY_TILE, 1), lambda i, j: (i, 0),
                                       memory_space=pltpu.VMEM), out_f, out_f),
        out_shape=tuple(_out_struct((Rp, 1), dt, o)
                        for dt in (f32, jnp.int32, f32, f32)),
        interpret=interpret,
    )(o, d, p0, p1, p2, valid, tmin, tmax)

    t = t[:R, 0]
    tri = tri[:R, 0]
    miss = tri < 0
    t = jnp.where(miss, MIRO_TMAX, t)
    return t, tri, a[:R, 0], b[:R, 0]
