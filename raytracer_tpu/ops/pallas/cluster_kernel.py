"""Block-coherent cluster traversal as a Pallas TPU kernel.

The VMEM-resident version of ops/cluster_trace.py: the whole cluster table
(AABBs + padded SoA Moller-Trumbore basis, ~2.5 MB for a 64k-triangle scene)
lives in VMEM for the duration of a ray block, so the per-iteration cluster
reads that cost 40+ MB/iteration of HBM traffic in the XLA version are free.

Algorithm per ray block (grid dimension = ray blocks of RB rays):
  1. dense cull: slab-test all RB rays against all M cluster boxes -> a
     (RB, M) near-t key matrix (BIG = miss). One vector op, no gathers.
     This is the reference QBVH 4-box SSE test (src/BVH.cpp:391-414)
     widened to RB x M on the VPU.
  2. sweep: while any (ray, cluster) pair has near < best_t, pick the
     globally nearest viable cluster (scalar argmin — block-coherent, like
     a CPU packet tracer), MT-test its contiguous 128-triangle slab against
     ALL rays of the block (the reference TriCache4 intersect4,
     src/BVH.cpp:1297-1459, widened 4 -> 128 lanes), update per-ray bests,
     retire the cluster. Each iteration retires one cluster, so the loop is
     bounded by M and typically exits after the handful of clusters the
     block's rays actually overlap.

Rays live on sublanes (RB, 1), triangles/clusters on lanes (1, C)/(1, M);
cluster data rows are scalar-indexed dynamic slices (no per-lane gathers —
the one addressing mode the VPU cannot do).

Motion blur lerps the MT basis by per-ray time (linear in the vertices, so
identical to lerping vertices, reference src/MBObject.cpp:26-107).
Alpha-cutout scenes are handled outside the kernel (callers re-trace past
cutout hits); two-level instanced scenes use the BVH path instead.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.types import Scene
from ...core.vecmath import MIRO_TMAX
from ..intersect import Hit

BIG = np.float32(3e38)
# 32-ray blocks measured fastest on v5e (sponza_hd, 32k rays, fetch-timed,
# KPOP=4): 0.90/0.75 Mray/s coherent/incoherent vs 0.56/0.38 at the old
# rb=256/KPOP=1 — the near-ordered sweep retires clusters for the WHOLE
# block, so small blocks waste fewer MT lanes on rays that don't overlap
# the chosen cluster; the dense cull cost is rb-invariant (R x M total)
DEF_RB = 32


def _kernel(bb_ref, p0_ref, e1_ref, e2_ref, q0_ref, q1_ref, q2_ref, tri_ref,
            rays_ref, t_out, tri_out, a_out, b_out,
            *, any_hit: bool, mb: bool, M: int, C: int, RB: int):
    f32 = jnp.float32

    def ray_row(i):
        return rays_ref[i, :].reshape(RB, 1)

    ox, oy, oz = ray_row(0), ray_row(1), ray_row(2)
    dx, dy, dz = ray_row(3), ray_row(4), ray_row(5)
    tmin, tmax = ray_row(6), ray_row(7)
    time = ray_row(8)

    # miss defaults; whole block skipped when every ray is disabled
    # (tmax < 0: dead wavefront lanes, finished alpha-march rays, padding)
    t_out[0, 0, :] = jnp.full((RB,), f32(MIRO_TMAX))
    tri_out[0, 0, :] = jnp.full((RB,), -1, jnp.int32)
    a_out[0, 0, :] = jnp.zeros((RB,), f32)
    b_out[0, 0, :] = jnp.zeros((RB,), f32)

    @pl.when(jnp.any(tmax > 0.0))
    def _block_body():
        _trace_block(ox, oy, oz, dx, dy, dz, tmin, tmax, time,
                     bb_ref, p0_ref, e1_ref, e2_ref, q0_ref, q1_ref,
                     q2_ref, tri_ref, t_out, tri_out, a_out, b_out,
                     any_hit=any_hit, mb=mb, M=M, C=C, RB=RB)


def _trace_block(ox, oy, oz, dx, dy, dz, tmin, tmax, time,
                 bb_ref, p0_ref, e1_ref, e2_ref, q0_ref, q1_ref, q2_ref,
                 tri_ref, t_out, tri_out, a_out, b_out,
                 *, any_hit: bool, mb: bool, M: int, C: int, RB: int):
    f32 = jnp.float32

    def rcp(v):
        tiny = f32(1e-20)
        return 1.0 / jnp.where(jnp.abs(v) < tiny,
                               jnp.where(v < 0, -tiny, tiny), v)

    ix, iy, iz = rcp(dx), rcp(dy), rcp(dz)

    # ---- phase 1: dense cull -> (RB, M) near-t keys
    def slab(axis, o_c, inv_c):
        lo = bb_ref[axis, :].reshape(1, M)
        hi = bb_ref[3 + axis, :].reshape(1, M)
        t0 = (lo - o_c) * inv_c
        t1 = (hi - o_c) * inv_c
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    n0, f0 = slab(0, ox, ix)
    n1, f1 = slab(1, oy, iy)
    n2, f2 = slab(2, oz, iz)
    near = jnp.maximum(jnp.maximum(n0, n1), n2)
    far = jnp.minimum(jnp.minimum(f0, f1), f2)
    ok_box = (near <= far) & (far >= tmin) & (near <= tmax)
    key = jnp.where(ok_box, jnp.maximum(near, 0.0), BIG)   # (RB, M)

    lane_m = jax.lax.broadcasted_iota(jnp.int32, (RB, M), 1)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

    best_t0 = jnp.minimum(tmax, f32(MIRO_TMAX))            # (RB, 1)
    state = (key, best_t0, jnp.full((RB, 1), -1, jnp.int32),
             jnp.zeros((RB, 1), f32), jnp.zeros((RB, 1), f32))

    def viable(key, best_t, best_tri):
        v = key < best_t
        if any_hit:
            v = v & (best_tri < 0)
        return v

    def cond(s):
        key, best_t, best_tri, _, _ = s
        return jnp.any(viable(key, best_t, best_tri))

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
    KPOP = 4  # clusters retired per (RB, M) re-mask — amortizes the
              # expensive per-iteration viability mask + column min over
              # several cheap (1, M) queue pops + MT tests

    def mt_cluster(c, best):
        """MT-test cluster c's (3, C) slab vs all RB rays, update bests."""
        best_t, best_tri, best_a, best_b = best
        p0 = p0_ref[pl.ds(3 * c, 3), :]                    # (3, C)
        e1 = e1_ref[pl.ds(3 * c, 3), :]
        e2 = e2_ref[pl.ds(3 * c, 3), :]

        def comp(m3, i):
            return m3[i, :].reshape(1, C)

        if mb:
            q0 = q0_ref[pl.ds(3 * c, 3), :]
            q1 = q1_ref[pl.ds(3 * c, 3), :]
            q2 = q2_ref[pl.ds(3 * c, 3), :]
            # (RB, C) lerped basis per component
            p0x = comp(p0, 0) + time * (comp(q0, 0) - comp(p0, 0))
            p0y = comp(p0, 1) + time * (comp(q0, 1) - comp(p0, 1))
            p0z = comp(p0, 2) + time * (comp(q0, 2) - comp(p0, 2))
            e1x = comp(e1, 0) + time * (comp(q1, 0) - comp(e1, 0))
            e1y = comp(e1, 1) + time * (comp(q1, 1) - comp(e1, 1))
            e1z = comp(e1, 2) + time * (comp(q1, 2) - comp(e1, 2))
            e2x = comp(e2, 0) + time * (comp(q2, 0) - comp(e2, 0))
            e2y = comp(e2, 1) + time * (comp(q2, 1) - comp(e2, 1))
            e2z = comp(e2, 2) + time * (comp(q2, 2) - comp(e2, 2))
        else:
            p0x, p0y, p0z = comp(p0, 0), comp(p0, 1), comp(p0, 2)
            e1x, e1y, e1z = comp(e1, 0), comp(e1, 1), comp(e1, 2)
            e2x, e2y, e2z = comp(e2, 0), comp(e2, 1), comp(e2, 2)

        # pvec = d x e2
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = 1.0 / det
        tvx = ox - p0x
        tvy = oy - p0y
        tvz = oz - p0z
        a = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        # qvec = tvec x e1
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        b = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

        tid = tri_ref[c, :].reshape(1, C)
        ok = (a >= 0.0) & (a <= 1.0) & (b >= 0.0) & (a + b <= 1.0) \
            & (det != 0.0) & (tid >= 0) & (t >= tmin) & (t < best_t)
        th = jnp.where(ok, t, BIG)                         # (RB, C)
        tmin_c = jnp.min(th, axis=1, keepdims=True)        # (RB, 1)
        jsel = jnp.argmin(th, axis=1).reshape(RB, 1)       # (RB, 1)
        got = tmin_c < BIG
        sel = lane_c == jsel                               # (RB, C)

        def pick(v, old):
            vj = jnp.sum(jnp.where(sel, v, 0.0), axis=1, keepdims=True)
            return jnp.where(got, vj, old)

        best_t = jnp.where(got, tmin_c, best_t)
        best_a = pick(a, best_a)
        best_b = pick(b, best_b)
        tidj = jnp.sum(jnp.where(sel, tid, 0), axis=1, keepdims=True)
        best_tri = jnp.where(got, tidj, best_tri)
        return (best_t, best_tri, best_a, best_b)

    def body(s):
        key, best_t, best_tri, best_a, best_b = s
        mkey = jnp.where(viable(key, best_t, best_tri), key, BIG)
        colmin = jnp.min(mkey, axis=0).reshape(1, M)
        retired = jnp.zeros((1, M), jnp.bool_)
        best = (best_t, best_tri, best_a, best_b)
        for _ in range(KPOP):
            c = jnp.argmin(colmin, axis=1)[0]              # scalar cluster id
            # later pops may already be non-viable (BIG) — the MT's own
            # t/best_t masks keep them harmless, and the pop is cheap
            eq = lane1 == c
            retired = retired | (eq & (colmin < BIG))
            colmin = jnp.where(eq, BIG, colmin)
            best = mt_cluster(c, best)
        best_t, best_tri, best_a, best_b = best
        key = jnp.where(retired, BIG, key)                 # retire clusters
        return (key, best_t, best_tri, best_a, best_b)

    key, best_t, best_tri, best_a, best_b = jax.lax.while_loop(
        cond, body, state)

    t_out[0, 0, :] = best_t.reshape(RB)
    tri_out[0, 0, :] = best_tri.reshape(RB)
    a_out[0, 0, :] = best_a.reshape(RB)
    b_out[0, 0, :] = best_b.reshape(RB)


@partial(jax.jit,
         static_argnames=('any_hit', 'rb', 'interpret', 'mb'))
def pallas_cluster_trace(scene: Scene, o, d, time, tmin, tmax,
                         any_hit: bool = False, rb: int = DEF_RB,
                         interpret: bool | None = None,
                         table=None, mb: bool | None = None) -> Hit:
    """Trace a wavefront with the VMEM-resident cluster kernel -> Hit.

    Single-level, non-alpha scenes; callers gate on scene flags
    (render.integrator.trace_fn). Gradients do not flow (ids + pinned
    floats; intersect.refine_hit recomputes differentiably).

    table overrides scene.clusters (e.g. the MB partition of a two-level
    scene, scene.mb_clusters); mb overrides the scene motion-blur flag for
    that table.
    """
    # Every input must be tangent-free: pallas_call has no JVP rule, so a
    # single differentiable operand (e.g. tmax=dist from a shadow ray whose
    # origin depends on vertices) makes scan linearization fail. Hit ids are
    # re-derived differentiably by intersect.refine_hit.
    cl = jax.lax.stop_gradient(table if table is not None else scene.clusters)
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    time = jax.lax.stop_gradient(time)
    tmin = jax.lax.stop_gradient(tmin)
    tmax = jax.lax.stop_gradient(tmax)
    R = o.shape[0]
    M, _, C = cl.p0.shape
    if mb is None:
        mb = scene.has_motion_blur
    f32 = jnp.float32
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'

    tmin = jnp.broadcast_to(jnp.asarray(tmin, f32), (R,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, f32), (R,))
    time = jnp.broadcast_to(jnp.asarray(time, f32), (R,))

    pad = (-R) % rb
    Rp = R + pad

    def padded(v, fill=0.0):
        return jnp.pad(v, ((0, pad),), constant_values=fill)

    rays = jnp.stack([padded(o[:, 0]), padded(o[:, 1]), padded(o[:, 2]),
                      padded(d[:, 0]), padded(d[:, 1]), padded(d[:, 2]),
                      padded(tmin), padded(tmax, -1.0), padded(time)])
    rays = rays.reshape(9, Rp // rb, rb).transpose(1, 0, 2)  # (nb, 9, RB)

    bb = jnp.concatenate([jnp.asarray(cl.bb_min, f32).T,
                          jnp.asarray(cl.bb_max, f32).T])    # (6, M)
    p0 = jnp.asarray(cl.p0, f32).reshape(M * 3, C)
    e1 = jnp.asarray(cl.e1, f32).reshape(M * 3, C)
    e2 = jnp.asarray(cl.e2, f32).reshape(M * 3, C)
    if mb:
        q0 = jnp.asarray(cl.p0_t1, f32).reshape(M * 3, C)
        q1 = jnp.asarray(cl.e1_t1, f32).reshape(M * 3, C)
        q2 = jnp.asarray(cl.e2_t1, f32).reshape(M * 3, C)
        mq = M
    else:
        # static: the kernel never reads the t=1 pose — pass tiny dummies
        # instead of aliasing p0/e1/e2 (duplicate operands are NOT deduped
        # in VMEM and would double the table footprint)
        q0 = q1 = q2 = jnp.zeros((3, C), f32)
        mq = 1
    tri = jnp.asarray(cl.tri, jnp.int32)

    nb = Rp // rb
    whole = lambda i: (0, 0)
    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((6, M), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((M * 3, C), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((M * 3, C), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((M * 3, C), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((mq * 3, C), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((mq * 3, C), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((mq * 3, C), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, C), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, rb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, rb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
    )

    def kern(bb_r, p0_r, e1_r, e2_r, q0_r, q1_r, q2_r, tri_r, rays_r,
             t_o, tri_o, a_o, b_o):
        _kernel(bb_r, p0_r, e1_r, e2_r, q0_r, q1_r, q2_r, tri_r,
                rays_r[0], t_o, tri_o, a_o, b_o,
                any_hit=any_hit, mb=mb, M=M, C=C, RB=rb)

    # under shard_map (check_vma=True) outputs must declare how they vary
    # over mesh axes: like the ray inputs (cluster tables are replicated)
    vma = getattr(jax.typeof(rays), 'vma', frozenset())

    def out_struct(dtype):
        try:
            return jax.ShapeDtypeStruct((nb, 1, rb), dtype, vma=vma)
        except TypeError:  # older jax without the vma kwarg
            return jax.ShapeDtypeStruct((nb, 1, rb), dtype)

    t, tri_id, a, b = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[out_struct(f32), out_struct(jnp.int32),
                   out_struct(f32), out_struct(f32)],
        interpret=interpret,
    )(bb, p0, e1, e2, q0, q1, q2, tri, rays)

    t = t.reshape(Rp)[:R]
    tri_id = tri_id.reshape(Rp)[:R]
    a = a.reshape(Rp)[:R]
    b = b.reshape(Rp)[:R]
    t = jnp.where(tri_id >= 0, t, MIRO_TMAX)
    return Hit(t=t, tri=tri_id, inst=jnp.zeros((R,), jnp.int32), a=a, b=b)
