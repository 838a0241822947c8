"""Two-level (instanced) block-coherent cluster traversal as a Pallas kernel.

The instanced analogue of cluster_kernel.py, mirroring the reference's
two-level proxy traversal (src/ProxyObject.cpp:76-95 ray transform,
src/BVH.cpp:1305-1338 proxy lanes in intersect4) in block-coherent form.

The acceleration structure is a FLAT SEGMENT TABLE built host-side
(geometry/clusters.build_instanced_clusters): one entry per
(instance, chunk-of-KIN-prototype-clusters) with a world-space AABB.
Prototype cluster data is shared — VMEM holds ONE wide-layout copy per
prototype regardless of instance count (the reference's 1M-bunny memory
story, webpage "Instancing").

Per ray block (grid dim = ray blocks of RB rays):
  1. world cull: slab-test all RB rays against all E segment boxes ->
     (RB, E) near-t keys (the TLAS box test widened to the whole table).
  2. batched sweep (the round-5 design, see cluster_kernel.py): pick the
     kpop lowest-lane viable segments in one vectorized rank pass (ids
     packed two per scalar extract), read each segment's instance
     transform from SMEM (scalar loads — no vector->scalar moves),
     transform the block into each instance's OBJECT space (directions
     NOT renormalized, so t is identical in both spaces, the invariant
     the reference relies on), fetch each segment's (3, KIN*C) basis row
     block with one dynamic slice, and Moller-Trumbore-test all
     kpop*KIN*C lanes in ONE wide pass. Per-ray best_t pruning between
     batches replaces strict near-ordering.

Static geometry only: motion-blurred world triangles live in a separate
single-level table (scene.mb_clusters) traced by the MB-capable
cluster_kernel; render.integrator merges both hits by nearest t.
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
DEF_RB = 32
DEF_KPOP = 4       # segments per batched pass (= kpop*KIN clusters)


def _kernel(sbb_ref, smeta_ref, strf_ref, p0_ref, e1_ref, e2_ref, tri_ref,
            rays_ref, t_out, tri_out, inst_out, a_out, b_out,
            *, any_hit: bool, cheap_any: bool, need_ab: bool, kpop: int,
            kin: int, E: int, S: int, C: int, RB: int):
    f32 = jnp.float32

    def ray_row(i):
        return rays_ref[i, :].reshape(RB, 1)

    ox, oy, oz = ray_row(0), ray_row(1), ray_row(2)
    dx, dy, dz = ray_row(3), ray_row(4), ray_row(5)
    tmin, tmax = ray_row(6), ray_row(7)

    # miss defaults; whole block skipped when every ray is disabled
    # (tmax < 0: dead wavefront lanes, finished alpha-march rays, padding)
    t_out[0, 0, :] = jnp.full((RB,), f32(MIRO_TMAX))
    tri_out[0, 0, :] = jnp.full((RB,), -1, jnp.int32)
    inst_out[0, 0, :] = jnp.zeros((RB,), jnp.int32)
    a_out[0, 0, :] = jnp.zeros((RB,), f32)
    b_out[0, 0, :] = jnp.zeros((RB,), f32)

    @pl.when(jnp.any(tmax > 0.0))
    def _block_body():
        _trace_block(ox, oy, oz, dx, dy, dz, tmin, tmax,
                     sbb_ref, smeta_ref, strf_ref, p0_ref, e1_ref, e2_ref,
                     tri_ref, t_out, tri_out, inst_out, a_out, b_out,
                     any_hit=any_hit, cheap_any=cheap_any, need_ab=need_ab,
                     kpop=kpop, kin=kin, E=E, S=S, C=C, RB=RB)


def _trace_block(ox, oy, oz, dx, dy, dz, tmin, tmax,
                 sbb_ref, smeta_ref, strf_ref, p0_ref, e1_ref, e2_ref,
                 tri_ref, t_out, tri_out, inst_out, a_out, b_out,
                 *, any_hit: bool, cheap_any: bool, need_ab: bool,
                 kpop: int, kin: int, E: int, S: int, C: int, RB: int):
    f32 = jnp.float32     # E == S * 128 (builder lane-pads the table)
    CW = kin * C

    def rcp(v):
        tiny = f32(1e-20)
        return 1.0 / jnp.where(jnp.abs(v) < tiny,
                               jnp.where(v < 0, -tiny, tiny), v)

    ix, iy, iz = rcp(dx), rcp(dy), rcp(dz)

    # ---- phase 1: world cull -> (RB, E) segment near-t keys (invariant)
    near = jnp.full((RB, E), -jnp.inf, f32)
    far = jnp.full((RB, E), jnp.inf, f32)
    for ax, (oc, ic) in enumerate(((ox, ix), (oy, iy), (oz, iz))):
        lo = sbb_ref[ax, :].reshape(1, E)
        hi = sbb_ref[3 + ax, :].reshape(1, E)
        t0 = (lo - oc) * ic
        t1 = (hi - oc) * ic
        near = jnp.maximum(near, jnp.minimum(t0, t1))
        far = jnp.minimum(far, jnp.maximum(t0, t1))
    ok_box = (near <= far) & (far >= tmin) & (near <= tmax)
    key = jnp.where(ok_box, jnp.maximum(near, 0.0), BIG)   # (RB, E)

    ltri = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)).astype(f32)
    ltriS = (jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
             < jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)).astype(f32)
    lane_id = (jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0) * 128
               + jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1))

    best_t0 = jnp.minimum(tmax, f32(MIRO_TMAX))            # (RB, 1)
    KC = kpop * CW
    lane_kc = jax.lax.broadcasted_iota(jnp.int32, (RB, KC), 1)
    zcw1 = jnp.zeros((1, CW), f32)
    zcwR = jnp.zeros((RB, CW), f32)

    def viable9(best_t, best_tri, done9):
        v = key < best_t                                   # (RB, E)
        if any_hit:
            v = v & (best_tri < 0)
        vrow = jnp.max(jnp.where(v, 1.0, 0.0), axis=0).reshape(1, E)
        v9 = jnp.concatenate(
            [vrow[:, s * 128:(s + 1) * 128] for s in range(S)], axis=0)
        return ((v9 > 0.5) & (done9 == 0)).astype(jnp.int32)

    def mt_segments(es, best):
        """MT all kpop picked segments in ONE (RB, kpop*KIN*C) pass."""
        best_t, best_tri, best_inst, best_a, best_b = best
        oxl, oyl, ozl, dxl, dyl, dzl = [], [], [], [], [], []
        p0s, e1s, e2s, tids, insts = [], [], [], [], []
        for e in es:
            # SMEM tables are FLAT 1-D (2-D SMEM pads the minor dim to
            # 128 lanes — a (E, 3) window allocates E*512 bytes)
            rw = smeta_ref[3 * e + 1]                      # base cluster row
            srow = smeta_ref[3 * e + 2]                    # scene inst row
            m = [strf_ref[12 * e + j] for j in range(12)]  # per-ENTRY
            # world -> object; t preserved (direction not renormalized)
            oxl.append(m[0] * ox + m[1] * oy + m[2] * oz + m[3] + zcwR)
            oyl.append(m[4] * ox + m[5] * oy + m[6] * oz + m[7] + zcwR)
            ozl.append(m[8] * ox + m[9] * oy + m[10] * oz + m[11] + zcwR)
            dxl.append(m[0] * dx + m[1] * dy + m[2] * dz + zcwR)
            dyl.append(m[4] * dx + m[5] * dy + m[6] * dz + zcwR)
            dzl.append(m[8] * dx + m[9] * dy + m[10] * dz + zcwR)
            # per-cluster fetches from the 128-lane pool tables (the one
            # dynamic-slice shape Mosaic lowers without alignment proofs;
            # wider-lane memrefs reject dynamic sublane offsets)
            def loadc(ref, rw=rw):
                return jnp.concatenate(
                    [ref[pl.ds(3 * (rw + j), 3), :] for j in range(kin)],
                    axis=1)                                # (3, CW)

            p0s.append(loadc(p0_ref))
            e1s.append(loadc(e1_ref))
            e2s.append(loadc(e2_ref))
            tids.append(jnp.concatenate(
                [tri_ref[pl.ds(rw + j, 1), :] for j in range(kin)],
                axis=1))                                   # (1, CW)
            insts.append(srow + jnp.zeros((1, CW), jnp.int32))
        catR = lambda xs: jnp.concatenate(xs, axis=1)      # (RB, KC)
        oxw, oyw, ozw = catR(oxl), catR(oyl), catR(ozl)
        dxw, dyw, dzw = catR(dxl), catR(dyl), catR(dzl)
        p0 = catR(p0s)                                     # (3, KC)
        e1 = catR(e1s)
        e2 = catR(e2s)
        tid = catR(tids)                                   # (1, KC)
        instw = catR(insts)

        def comp(m3, i):
            return m3[i, :].reshape(1, KC)

        p0x, p0y, p0z = comp(p0, 0), comp(p0, 1), comp(p0, 2)
        e1x, e1y, e1z = comp(e1, 0), comp(e1, 1), comp(e1, 2)
        e2x, e2y, e2z = comp(e2, 0), comp(e2, 1), comp(e2, 2)

        # Moller-Trumbore in object space, t in world units
        pvx = dyw * e2z - dzw * e2y
        pvy = dzw * e2x - dxw * e2z
        pvz = dxw * e2y - dyw * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = 1.0 / det
        tvx = oxw - p0x
        tvy = oyw - p0y
        tvz = ozw - p0z
        a = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        b = (dxw * qvx + dyw * qvy + dzw * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

        ok = (a >= 0.0) & (a <= 1.0) & (b >= 0.0) & (a + b <= 1.0) \
            & (det != 0.0) & (tid >= 0) & (t >= tmin) & (t < best_t)

        if cheap_any:
            got = jnp.any(ok, axis=1, keepdims=True)
            best_tri = jnp.where(got, 1, best_tri)
            return (best_t, best_tri, best_inst, best_a, best_b)

        th = jnp.where(ok, t, BIG)                         # (RB, KC)
        tmin_c = jnp.min(th, axis=1, keepdims=True)
        jsel = jnp.argmin(th, axis=1).reshape(RB, 1)
        got = tmin_c < BIG
        sel = lane_kc == jsel

        def pick(v, old):
            vj = jnp.sum(jnp.where(sel, v, 0.0), axis=1, keepdims=True)
            return jnp.where(got, vj, old)

        best_t = jnp.where(got, tmin_c, best_t)
        if need_ab:
            best_a = pick(a, best_a)
            best_b = pick(b, best_b)
        tidj = jnp.sum(jnp.where(sel, tid, 0), axis=1, keepdims=True)
        best_tri = jnp.where(got, tidj, best_tri)
        instj = jnp.sum(jnp.where(sel, instw, 0), axis=1, keepdims=True)
        best_inst = jnp.where(got, instj, best_inst)
        return (best_t, best_tri, best_inst, best_a, best_b)

    done9 = jnp.zeros((S, 128), jnp.int32)
    v9 = viable9(best_t0, jnp.full((RB, 1), -1, jnp.int32), done9)
    state = (v9, done9, best_t0,
             jnp.full((RB, 1), -1, jnp.int32),
             jnp.zeros((RB, 1), jnp.int32),
             jnp.zeros((RB, 1), f32), jnp.zeros((RB, 1), f32))

    def cond(s):
        v9, *_ = s
        return jnp.any(v9 > 0)

    def body(s):
        v9, done9, best_t, best_tri, best_inst, best_a, best_b = s
        vb = v9 > 0
        vf = v9.astype(f32)
        intra = jnp.dot(vf, ltri, preferred_element_type=f32)
        segc = jnp.sum(vf, axis=1, keepdims=True)
        if S > 1:
            segoff = jnp.dot(ltriS, segc, preferred_element_type=f32)
        else:
            segoff = jnp.zeros((S, 1), f32)
        rank = (intra + segoff).astype(jnp.int32)
        es = []
        for k in range(0, kpop, 2):
            # two lane ids packed per scalar extract (15 bits: E <= 32767)
            w = jnp.where(vb & (rank == k), lane_id, 0) \
                + jnp.where(vb & (rank == k + 1), lane_id * 32768, 0)
            jk = jnp.sum(w)
            es.append(jnp.minimum(jk & 0x7FFF, E - 1))
            es.append(jnp.minimum(jk >> 15, E - 1))
        done9 = done9 | (v9 * (rank < kpop))
        best_t, best_tri, best_inst, best_a, best_b = mt_segments(
            es, (best_t, best_tri, best_inst, best_a, best_b))
        v9 = viable9(best_t, best_tri, done9)
        return (v9, done9, best_t, best_tri, best_inst, best_a, best_b)

    _, _, best_t, best_tri, best_inst, best_a, best_b = jax.lax.while_loop(
        cond, body, state)

    t_out[0, 0, :] = best_t.reshape(RB)
    tri_out[0, 0, :] = best_tri.reshape(RB)
    inst_out[0, 0, :] = best_inst.reshape(RB)
    a_out[0, 0, :] = best_a.reshape(RB)
    b_out[0, 0, :] = best_b.reshape(RB)


@partial(jax.jit, static_argnames=('any_hit', 'rb', 'interpret', 'kpop'))
def pallas_iseg_trace(scene: Scene, o, d, time, tmin, tmax,
                          any_hit: bool = False, rb: int = DEF_RB,
                          interpret: bool | None = None,
                          kpop: int = DEF_KPOP) -> Hit:
    """Trace a wavefront with the two-level instanced kernel -> Hit.

    Static instanced geometry only (scene.iclusters, already in kernel
    layout from geometry/clusters.build_instanced_clusters); callers trace
    scene.mb_clusters separately and merge (integrator.trace_fn). Gradients
    do not flow (ids + pinned floats; intersect.refine_hit recomputes
    differentiably, instance-aware).

    Segment tables beyond 32767 entries are sliced into sub-tables and
    the per-slice hits merged by nearest t (the instance-count scaling
    path: prototype data is shared, so VMEM holds one copy regardless).
    """
    icl = jax.lax.stop_gradient(scene.iclusters)
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    tmin = jax.lax.stop_gradient(tmin)
    tmax = jax.lax.stop_gradient(tmax)
    R = o.shape[0]
    E = icl.sbb.shape[1]
    Mtot, C = icl.tri.shape
    f32 = jnp.float32
    from ...geometry.clusters import KIN
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    cheap_any = bool(any_hit) and not scene.has_alpha_maps
    need_ab = bool(scene.has_alpha_maps)
    assert kpop % 2 == 0, 'kpop must be even (ids are extracted in pairs)'

    tmin = jnp.broadcast_to(jnp.asarray(tmin, f32), (R,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, f32), (R,))

    pad = (-R) % rb
    Rp = R + pad

    def padded(v, fill=0.0):
        return jnp.pad(v, ((0, pad),), constant_values=fill)

    rays = jnp.stack([padded(o[:, 0]), padded(o[:, 1]), padded(o[:, 2]),
                      padded(d[:, 0]), padded(d[:, 1]), padded(d[:, 2]),
                      padded(tmin), padded(tmax, -1.0),
                      jnp.zeros(Rp, f32)])
    rays = rays.reshape(9, Rp // rb, rb).transpose(1, 0, 2)   # (nb, 9, RB)
    nb = Rp // rb

    # ---- per-block bundle cull (ops/pallas/bundle.py): with coherent
    # camera blocks each block executes only the few slices its frustum
    # crosses instead of culling every slice's full (RB, E_s) table; sky
    # blocks skip everything
    from .bundle import make_block_culler, disable_blocks, box_union
    blocks_enabled = make_block_culler(rays)

    vma = getattr(jax.typeof(rays), 'vma', frozenset())

    def out_struct(dtype):
        try:
            return jax.ShapeDtypeStruct((nb, 1, rb), dtype, vma=vma)
        except TypeError:  # older jax without the vma kwarg
            return jax.ShapeDtypeStruct((nb, 1, rb), dtype)

    def run_slice(sbb, smeta, strf, E_s, rays_s):
        S = E_s // 128
        whole = lambda i: (0, 0)
        grid_spec = pl.GridSpec(
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((6, E_s), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((Mtot * 3, C), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((Mtot * 3, C), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((Mtot * 3, C), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((Mtot, C), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 9, rb), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, rb), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(5)
            ],
        )

        def kern(sbb_r, smeta_r, strf_r, p0_r, e1_r, e2_r, tri_r, rays_r,
                 t_o, tri_o, inst_o, a_o, b_o):
            _kernel(sbb_r, smeta_r, strf_r, p0_r, e1_r, e2_r, tri_r,
                    rays_r[0], t_o, tri_o, inst_o, a_o, b_o,
                    any_hit=any_hit, cheap_any=cheap_any, need_ab=need_ab,
                    kpop=kpop, kin=KIN, E=E_s, S=S, C=C, RB=rb)

        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[out_struct(f32), out_struct(jnp.int32),
                       out_struct(jnp.int32), out_struct(f32),
                       out_struct(f32)],
            interpret=interpret,
        )(sbb, jnp.asarray(smeta, jnp.int32).reshape(-1),
          jnp.asarray(strf, f32).reshape(-1), jnp.asarray(icl.p0, f32),
          jnp.asarray(icl.e1, f32), jnp.asarray(icl.e2, f32),
          jnp.asarray(icl.tri, jnp.int32), rays_s)

    # slice the segment table so (a) lane ids fit the 15-bit packed picks
    # and (b) the (RB, E) cull key matrix + temps fit scoped VMEM next to
    # the shared prototype tables (measured ~3 live (RB, E)-sized values)
    tables_b = (10 * Mtot * C + 128) * 4
    avail = 10 * 1024 * 1024 - tables_b
    # SMEM bound: per-slice smeta (3 i32) + strf (12 f32) rows must fit
    # the measured 1 MB SMEM (compile error at 1.24 MB: "would exceed
    # memory (size=1048576)"), less ~32 KB for grid bookkeeping
    smem_cap = (1024 - 32) * 1024 // ((3 + 12) * 4) // 128 * 128
    SLICE = min(32768 - 128, smem_cap,
                max(1024, avail // (3 * rb * 4) // 128 * 128))
    outs = None
    sbb_all = jnp.asarray(icl.sbb, f32)
    for lo in range(0, E, SLICE):
        hi = min(lo + SLICE, E)
        sbb_s = sbb_all[:, lo:hi]
        en = blocks_enabled(*box_union(sbb_s))
        rays_s = disable_blocks(rays, en)
        res = run_slice(sbb_s, icl.smeta[lo:hi], icl.strf[lo:hi], hi - lo,
                        rays_s)
        if outs is None:
            outs = res
        else:
            t0, tr0, i0, a0, b0 = outs
            t1, tr1, i1, a1, b1 = res
            take = (tr1 >= 0) & ((tr0 < 0) | (t1 < t0))
            outs = (jnp.where(take, t1, t0), jnp.where(take, tr1, tr0),
                    jnp.where(take, i1, i0), jnp.where(take, a1, a0),
                    jnp.where(take, b1, b0))

    t, tri_id, inst, a, b = outs
    t = t.reshape(Rp)[:R]
    tri_id = tri_id.reshape(Rp)[:R]
    inst = inst.reshape(Rp)[:R]
    a = a.reshape(Rp)[:R]
    b = b.reshape(Rp)[:R]
    t = jnp.where(tri_id >= 0, t, MIRO_TMAX)
    inst = jnp.where(tri_id >= 0, inst, 0)
    if not (need_ab or cheap_any):
        # recompute barycentrics of the winning triangle in XLA (instance
        # object space; forward-only — the whole Hit is tangent-free)
        from .. import intersect as isect
        p = jax.lax.stop_gradient(
            isect.gather_tri_verts(scene, jnp.maximum(tri_id, 0), time))
        mi = jax.lax.stop_gradient(
            scene.instances.m_inv[jnp.maximum(inst, 0)])
        oo = isect.transform_point(mi, o)
        dd = isect.transform_vector(mi, d)
        _, a, b, _ = isect.mt_intersect(oo, dd, p[..., 0, :], p[..., 1, :],
                                        p[..., 2, :])
        valid = tri_id >= 0
        a = jnp.where(valid, a, 0.0)
        b = jnp.where(valid, b, 0.0)
    return Hit(t=t, tri=tri_id, inst=inst, a=a, b=b)
