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
  2. batched sweep: while any (ray, cluster) pair has near < best_t, pick
     the K lowest-lane viable clusters IN ONE VECTOR PASS (exclusive ranks
     via two small MXU matmuls against triangular one-matrices; no serial
     argmin chain), fetch their K contiguous 128-triangle slabs (cheap
     scalar-indexed dynamic slices), and Moller-Trumbore-test all K at
     once as a single (RB, K*C) pass (the reference TriCache4 intersect4,
     src/BVH.cpp:1297-1459, widened 4 -> K*128 lanes). Update per-ray
     bests, mark the K clusters processed, repeat.

Why K-batched, lane-ordered (round 5): ablation on v5e measured ~410 ns of
fixed loop overhead per sweep iteration plus ~235 ns per argmin pick,
against ~220 ns for an entire (RB, 128) MT test and near-zero for the
dynamic slab fetches — the round-4 kernel (one near-ordered cluster per
iteration, KPOP serial argmin pops) was loop-bound, not flop-bound. One
iteration now retires K=8+ clusters for one loop boundary and one
vectorized pick; per-ray best_t pruning between batches replaces strict
near-ordering (SAH lane order is spatially coherent, so early batches
still tighten best_t quickly).

Rays live on sublanes (RB, 1), triangles/clusters on lanes; cluster data
rows are scalar-indexed dynamic slices (no per-lane gathers — the one
addressing mode the VPU cannot do).

Motion blur lerps the MT basis by per-ray time (linear in the vertices, so
identical to lerping vertices, reference src/MBObject.cpp:26-107).
Alpha-cutout scenes are handled outside the kernel (callers re-trace past
cutout hits); two-level instanced scenes use icluster_kernel.
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
# 32-ray blocks measured fastest on v5e (sponza_hd, 32k rays, fetch-timed):
# the sweep retires clusters for the WHOLE block, so small blocks waste
# fewer MT lanes on rays that don't overlap the chosen clusters, while the
# dense cull cost is rb-invariant (R x M total)
DEF_RB = 32
DEF_KPOP = 16      # clusters MT-tested per (RB, kpop*C) batched pass


def _kernel(bb_ref, p0_ref, e1_ref, e2_ref, q0_ref, q1_ref, q2_ref, tri_ref,
            ltri_ref, lid_ref, rays_ref, t_out, tri_out, a_out, b_out,
            *, any_hit: bool, cheap_any: bool, need_ab: bool, mb: bool,
            kpop: int, M: int, S: int, C: int, RB: int):
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
                     q2_ref, tri_ref, ltri_ref, lid_ref,
                     t_out, tri_out, a_out, b_out,
                     any_hit=any_hit, cheap_any=cheap_any, need_ab=need_ab,
                     mb=mb, kpop=kpop, M=M, S=S, C=C, RB=RB)


def _trace_block(ox, oy, oz, dx, dy, dz, tmin, tmax, time,
                 bb_ref, p0_ref, e1_ref, e2_ref, q0_ref, q1_ref, q2_ref,
                 tri_ref, ltri_ref, lid_ref, t_out, tri_out, a_out, b_out,
                 *, any_hit: bool, cheap_any: bool, need_ab: bool, mb: bool,
                 kpop: int, M: int, S: int, C: int, RB: int):
    f32 = jnp.float32     # M == S * 128 (wrapper pads the table)

    def rcp(v):
        tiny = f32(1e-20)
        return 1.0 / jnp.where(jnp.abs(v) < tiny,
                               jnp.where(v < 0, -tiny, tiny), v)

    ix, iy, iz = rcp(dx), rcp(dy), rcp(dz)

    # ---- phase 1: dense cull -> (RB, M) near-t keys (loop-invariant)
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

    # exclusive-rank machinery (cumsum has no Pallas TPU lowering; one
    # 128x128 MXU matmul ranks a whole segment row, one SxS matmul offsets
    # the segments). The triangular matrices, lane-id table, and select
    # iota come in as INPUTS with constant index maps: in-kernel
    # broadcasted_iota chains get hoisted out of the pl.when skip branch
    # and re-evaluated on EVERY grid step — measured ~8-14us per DEAD
    # 32-ray block, which dominated late-bounce wavefronts.
    ltri = ltri_ref[0:128, :]                              # (128, 128) f32
    ltriS = ltri_ref[128:128 + S, 0:S] if S > 1 else None  # (S, S) f32
    lane_id = lid_ref[0:S, :]                              # (S, 128) i32
    iota_kc = jnp.concatenate(
        [lid_ref[S + k:S + k + 1, :] for k in range(kpop)],
        axis=1)                                            # (1, kpop*C) i32

    best_t0 = jnp.minimum(tmax, f32(MIRO_TMAX))            # (RB, 1)

    def viable9(best_t, best_tri, done9):
        """(S, 128) candidate mask: some ray's key beats its best t.

        Segment rows come from static 128-lane slices (a (1, Mp)->(S, 128)
        reshape is an unsupported Mosaic shape cast); slice starts are
        vreg-aligned so this lowers to plain register moves."""
        v = key < best_t                                   # (RB, M)
        if any_hit:
            v = v & (best_tri < 0)
        # assemble in f32 — i1 vector concat is an invalid register cast;
        # returns i32 0/1 (bool vectors can't be yielded through scf.while)
        vrow = jnp.max(jnp.where(v, 1.0, 0.0), axis=0).reshape(1, M)
        v9 = jnp.concatenate(
            [vrow[:, s * 128:(s + 1) * 128] for s in range(S)], axis=0)
        return ((v9 > 0.5) & (done9 == 0)).astype(jnp.int32)

    def mt_clusters(cs, best):
        """MT-test K clusters' slabs vs all RB rays in ONE (RB, K*C) pass.

        cs: list of K scalar cluster ids (duplicates are harmless — the
        t < best_t mask dedups)."""
        best_t, best_tri, best_a, best_b = best
        K = len(cs)
        KC = K * C
        cat = lambda refn: jnp.concatenate(
            [refn[pl.ds(3 * c, 3), :] for c in cs], axis=1)   # (3, K*C)
        p0 = cat(p0_ref)
        e1 = cat(e1_ref)
        e2 = cat(e2_ref)

        def comp(m3, i):
            return m3[i, :].reshape(1, KC)

        if mb:
            q0 = cat(q0_ref)
            q1 = cat(q1_ref)
            q2 = cat(q2_ref)
            # (RB, K*C) lerped basis per component
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

        tid = jnp.concatenate(
            [tri_ref[pl.ds(c, 1), :] for c in cs], axis=1)    # (1, K*C)
        ok = (a >= 0.0) & (a <= 1.0) & (b >= 0.0) & (a + b <= 1.0) \
            & (det != 0.0) & (tid >= 0) & (t >= tmin) & (t < best_t)

        if cheap_any:
            # shadow-ray fast path (callers only read tri >= 0): no argmin,
            # no attribute selects — one OR over lanes per ray
            got = jnp.any(ok, axis=1, keepdims=True)
            best_tri = jnp.where(got, 1, best_tri)
            return (best_t, best_tri, best_a, best_b)

        th = jnp.where(ok, t, BIG)                         # (RB, K*C)
        tmin_c = jnp.min(th, axis=1, keepdims=True)        # (RB, 1)
        jsel = jnp.argmin(th, axis=1).reshape(RB, 1)       # (RB, 1)
        got = tmin_c < BIG
        sel = iota_kc == jsel                              # (RB, K*C)

        def pick(v, old):
            vj = jnp.sum(jnp.where(sel, v, 0.0), axis=1, keepdims=True)
            return jnp.where(got, vj, old)

        best_t = jnp.where(got, tmin_c, best_t)
        if need_ab:
            # barycentrics of the winning lane; non-alpha scenes skip
            # these wide selects — the wrapper recomputes a/b from the
            # winning triangle in XLA (refine_hit-style), off the hot loop
            best_a = pick(a, best_a)
            best_b = pick(b, best_b)
        tidj = jnp.sum(jnp.where(sel, tid, 0), axis=1, keepdims=True)
        best_tri = jnp.where(got, tidj, best_tri)
        return (best_t, best_tri, best_a, best_b)

    done9 = jnp.zeros((S, 128), jnp.int32)
    v9 = viable9(best_t0, jnp.full((RB, 1), -1, jnp.int32), done9)
    state = (v9, done9, best_t0,
             jnp.full((RB, 1), -1, jnp.int32),
             jnp.zeros((RB, 1), f32), jnp.zeros((RB, 1), f32))

    def cond(s):
        v9, *_ = s
        return jnp.any(v9 > 0)

    def body(s):
        v9, done9, best_t, best_tri, best_a, best_b = s
        vb = v9 > 0
        # exclusive rank of each candidate lane among candidates
        vf = v9.astype(f32)                                # (S, 128)
        intra = jnp.dot(vf, ltri, preferred_element_type=f32)
        segc = jnp.sum(vf, axis=1, keepdims=True)          # (S, 1)
        if S > 1:
            segoff = jnp.dot(ltriS, segc, preferred_element_type=f32)
        else:
            segoff = jnp.zeros((S, 1), f32)
        rank = (intra + segoff).astype(jnp.int32)          # (S, 128)
        cs = []
        for k in range(0, kpop, 2):
            # two lane ids packed per scalar extract (15 bits each, so
            # M <= 32767): vector->scalar moves are ~60 ns apiece and
            # dominate the pick when unpacked. Batches short of kpop
            # re-test lane 0 — harmless (the t/best_t masks dedup).
            w = jnp.where(vb & (rank == k), lane_id, 0) \
                + jnp.where(vb & (rank == k + 1), lane_id * 32768, 0)
            jk = jnp.sum(w)
            cs.append(jnp.minimum(jk & 0x7FFF, M - 1))
            cs.append(jnp.minimum(jk >> 15, M - 1))
        done9 = done9 | (v9 * (rank < kpop))
        best_t, best_tri, best_a, best_b = mt_clusters(
            cs, (best_t, best_tri, best_a, best_b))
        v9 = viable9(best_t, best_tri, done9)
        return (v9, done9, best_t, best_tri, best_a, best_b)

    _, _, best_t, best_tri, best_a, best_b = jax.lax.while_loop(
        cond, body, state)

    t_out[0, 0, :] = best_t.reshape(RB)
    tri_out[0, 0, :] = best_tri.reshape(RB)
    a_out[0, 0, :] = best_a.reshape(RB)
    b_out[0, 0, :] = best_b.reshape(RB)


@partial(jax.jit,
         static_argnames=('any_hit', 'rb', 'interpret', 'mb', 'kpop'))
def pallas_cluster_trace(scene: Scene, o, d, time, tmin, tmax,
                         any_hit: bool = False, rb: int = DEF_RB,
                         interpret: bool | None = None,
                         table=None, mb: bool | None = None,
                         kpop: int = DEF_KPOP) -> Hit:
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
    S = -(-M // 128)
    assert S * 128 <= 32768, \
        'cluster table too large for packed picks — chunk it (_mb_chunks)'
    assert kpop % 2 == 0, 'kpop must be even (ids are extracted in pairs)'
    if mb is None:
        mb = scene.has_motion_blur
    # shadow rays in no-alpha scenes only need a boolean: skip the
    # per-cluster argmin + attribute selects (alpha_aware_trace DOES read
    # a/b/tri of any-hit hits, so alpha scenes keep the exact update)
    cheap_any = bool(any_hit) and not scene.has_alpha_maps
    # barycentric outputs only matter to the alpha re-trace march; other
    # callers go through intersect.refine_hit, and the wrapper recomputes
    # a/b from the winning triangle below — keeping two (RB, K*C)
    # select/sum chains out of every sweep iteration
    need_ab = bool(scene.has_alpha_maps)
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

    # lane-align the table: the kernel's rank pick needs M as a whole
    # number of 128-lane segment rows (in-kernel pads/reshapes are
    # unsupported Mosaic shape casts). Padding rows: far-away point boxes
    # (fail every slab test), degenerate triangles, id -1.
    padm = S * 128 - M

    def padrows(x, n, fill=0.0):
        return jnp.pad(x, ((0, n), (0, 0)), constant_values=fill)

    bb = jnp.concatenate([jnp.asarray(cl.bb_min, f32).T,
                          jnp.asarray(cl.bb_max, f32).T])    # (6, M)
    bb = jnp.pad(bb, ((0, 0), (0, padm)), constant_values=3e37)
    p0 = padrows(jnp.asarray(cl.p0, f32).reshape(M * 3, C), 3 * padm)
    e1 = padrows(jnp.asarray(cl.e1, f32).reshape(M * 3, C), 3 * padm)
    e2 = padrows(jnp.asarray(cl.e2, f32).reshape(M * 3, C), 3 * padm)
    if mb:
        q0 = padrows(jnp.asarray(cl.p0_t1, f32).reshape(M * 3, C), 3 * padm)
        q1 = padrows(jnp.asarray(cl.e1_t1, f32).reshape(M * 3, C), 3 * padm)
        q2 = padrows(jnp.asarray(cl.e2_t1, f32).reshape(M * 3, C), 3 * padm)
        mq = M + padm
    else:
        # static: the kernel never reads the t=1 pose — pass tiny dummies
        # instead of aliasing p0/e1/e2 (duplicate operands are NOT deduped
        # in VMEM and would double the table footprint)
        q0 = q1 = q2 = jnp.zeros((3, C), f32)
        mq = 1
    tri = padrows(jnp.asarray(cl.tri, jnp.int32), padm, -1)
    M = M + padm

    # constant tables for the rank pick / winner select (see _trace_block:
    # in-kernel iota chains are re-evaluated every grid step, even skipped)
    i128 = np.arange(128)
    ltri_tab = np.zeros((128 + S, 128), np.float32)
    ltri_tab[:128] = (i128[:, None] < i128[None, :])
    ltri_tab[128:128 + S, :S] = (np.arange(S)[:, None]
                                 < np.arange(S)[None, :])
    lid_tab = np.zeros((S + kpop, 128), np.int32)
    lid_tab[:S] = np.arange(S)[:, None] * 128 + i128[None, :]
    lid_tab[S:] = np.arange(kpop)[:, None] * 128 + i128[None, :]
    ltri_tab = jnp.asarray(ltri_tab)
    lid_tab = jnp.asarray(lid_tab)

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
            pl.BlockSpec((128 + S, 128), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((S + kpop, 128), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, rb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, rb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
    )

    def kern(bb_r, p0_r, e1_r, e2_r, q0_r, q1_r, q2_r, tri_r, ltri_r,
             lid_r, rays_r, t_o, tri_o, a_o, b_o):
        _kernel(bb_r, p0_r, e1_r, e2_r, q0_r, q1_r, q2_r, tri_r, ltri_r,
                lid_r, rays_r[0], t_o, tri_o, a_o, b_o,
                any_hit=any_hit, cheap_any=cheap_any, need_ab=need_ab,
                mb=mb, kpop=kpop, M=M, S=S, C=C, RB=rb)

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
    )(bb, p0, e1, e2, q0, q1, q2, tri, ltri_tab, lid_tab, rays)

    t = t.reshape(Rp)[:R]
    tri_id = tri_id.reshape(Rp)[:R]
    a = a.reshape(Rp)[:R]
    b = b.reshape(Rp)[:R]
    t = jnp.where(tri_id >= 0, t, MIRO_TMAX)
    if not (need_ab or cheap_any):
        # recompute barycentrics of the winning triangle in XLA (same MT
        # the kernel ran; forward-only — the whole Hit is tangent-free)
        from .. import intersect as isect
        p = jax.lax.stop_gradient(
            isect.gather_tri_verts(scene, jnp.maximum(tri_id, 0), time))
        _, a, b, _ = isect.mt_intersect(o, d, p[..., 0, :], p[..., 1, :],
                                        p[..., 2, :])
        valid = tri_id >= 0
        a = jnp.where(valid, a, 0.0)
        b = jnp.where(valid, b, 0.0)
    return Hit(t=t, tri=tri_id, inst=jnp.zeros((R,), jnp.int32), a=a, b=b)
