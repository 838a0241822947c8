"""Two-level (instanced) block-coherent cluster traversal as a Pallas kernel.

The instanced analogue of cluster_kernel.py, mirroring the reference's
two-level proxy traversal (src/ProxyObject.cpp:76-95 ray transform,
src/BVH.cpp:1305-1338 proxy lanes in intersect4) in block-coherent form:

Per ray block (grid dim = ray blocks of RB rays):
  1. world cull: slab-test all RB rays against all I instance WORLD boxes
     -> (RB, I) near-t keys (the reference's TLAS box test widened to the
     whole instance table on the VPU).
  2. outer sweep: while any (ray, instance) key beats the ray's best t,
     pick the globally nearest viable instance (scalar argmin —
     block-coherent), transform the whole block into its OBJECT space with
     the precomputed world->object affine read from SMEM (scalar loads —
     12 vector->scalar extracts per instance would cost ~0.7us).
     Directions are NOT renormalized, so the ray parameter t is identical
     in both spaces (the invariant the reference relies on).
  3. inner sweep (the round-5 batched design, see cluster_kernel.py):
     cull the object-space block against the prototype's cluster AABBs ->
     (RB, MP) keys, then retire kpop clusters per iteration — one
     vectorized exclusive-rank pick (ids packed two per scalar extract)
     and ONE wide (RB, kpop*C) Moller-Trumbore pass — with per-ray best_t
     pruning between batches. Prototype tables are shared: VMEM holds ONE
     copy per prototype regardless of instance count (the reference's
     1M-bunny memory story, webpage "Instancing").
  4. retire the instance, continue until no instance's entry beats best t.

This hierarchical kernel carries the deep-prototype scenes (forest trees:
hundreds of clusters per prototype — a flat per-chunk cull would test
every chunk box of every tree). Scenes with SHALLOW prototypes use the
flat segment kernel instead (iseg_kernel.py), which batches several
instances' geometry into each MT pass and scales to ~100k+ instances;
render.integrator picks per scene.

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
# 32-ray blocks: small blocks waste fewer MT lanes per sweep iteration
# (see cluster_kernel.DEF_RB) AND shrink the persistent (RB, I)
# instance-key matrix that dominates scoped VMEM at forest-scale instance
# counts
DEF_RB = 32
DEF_KPOP = 8       # clusters MT-tested per (RB, kpop*C) batched pass


def _kernel(ibb_ref, iminv_ref, imeta_ref, pbb_ref, pmeta_ref,
            p0_ref, e1_ref, e2_ref, tri_ref, rays_ref,
            t_out, tri_out, inst_out, a_out, b_out,
            *, any_hit: bool, cheap_any: bool, need_ab: bool, kpop: int,
            I: int, NI: int, MP: int, C: int, RB: int):
    f32 = jnp.float32

    def ray_row(i):
        return rays_ref[i, :].reshape(RB, 1)

    ox, oy, oz = ray_row(0), ray_row(1), ray_row(2)
    dx, dy, dz = ray_row(3), ray_row(4), ray_row(5)
    tmin, tmax = ray_row(6), ray_row(7)

    # miss defaults; whole block skipped when every ray is disabled
    # (tmax < 0 marks dead wavefront lanes, finished alpha-march rays, and
    # ray padding) — the alpha re-trace wrapper and the bounce loop both
    # rely on this to make follow-up passes nearly free
    t_out[0, 0, :] = jnp.full((RB,), f32(MIRO_TMAX))
    tri_out[0, 0, :] = jnp.full((RB,), -1, jnp.int32)
    inst_out[0, 0, :] = jnp.zeros((RB,), jnp.int32)
    a_out[0, 0, :] = jnp.zeros((RB,), f32)
    b_out[0, 0, :] = jnp.zeros((RB,), f32)

    @pl.when(jnp.any(tmax > 0.0))
    def _block_body():
        _trace_block(ox, oy, oz, dx, dy, dz, tmin, tmax,
                     iminv_ref, imeta_ref, ibb_ref, pbb_ref, pmeta_ref,
                     p0_ref, e1_ref, e2_ref, tri_ref,
                     t_out, tri_out, inst_out, a_out, b_out,
                     any_hit=any_hit, cheap_any=cheap_any, need_ab=need_ab,
                     kpop=kpop, I=I, NI=NI, MP=MP, C=C, RB=RB)


def _trace_block(ox, oy, oz, dx, dy, dz, tmin, tmax,
                 iminv_ref, imeta_ref, ibb_ref, pbb_ref, pmeta_ref,
                 p0_ref, e1_ref, e2_ref, tri_ref,
                 t_out, tri_out, inst_out, a_out, b_out,
                 *, any_hit: bool, cheap_any: bool, need_ab: bool,
                 kpop: int, I: int, NI: int, MP: int, C: int, RB: int):
    f32 = jnp.float32
    SM = MP // 128        # MP is lane-padded to whole 128-lane segments

    def rcp(v):
        tiny = f32(1e-20)
        return 1.0 / jnp.where(jnp.abs(v) < tiny,
                               jnp.where(v < 0, -tiny, tiny), v)

    # ---- phase 1: world cull -> (RB, I) instance near-t keys
    def slab6(bb_ref, row0, n_lanes, o3, d3):
        o1, o2, o3_ = o3
        d1, d2, d3_ = d3
        i1, i2, i3 = rcp(d1), rcp(d2), rcp(d3_)
        near = jnp.full((RB, n_lanes), -jnp.inf, f32)
        far = jnp.full((RB, n_lanes), jnp.inf, f32)
        for ax, (oc, ic) in enumerate(((o1, i1), (o2, i2), (o3_, i3))):
            lo = bb_ref[pl.ds(row0 + ax, 1), :].reshape(1, n_lanes)
            hi = bb_ref[pl.ds(row0 + 3 + ax, 1), :].reshape(1, n_lanes)
            t0 = (lo - oc) * ic
            t1 = (hi - oc) * ic
            near = jnp.maximum(near, jnp.minimum(t0, t1))
            far = jnp.minimum(far, jnp.maximum(t0, t1))
        ok = (near <= far) & (far >= tmin) & (near <= tmax)
        return jnp.where(ok, jnp.maximum(near, 0.0), BIG)

    ikey = slab6(ibb_ref, 0, I, (ox, oy, oz), (dx, dy, dz))   # (RB, I)

    lane_i = jax.lax.broadcasted_iota(jnp.int32, (RB, I), 1)
    lane1i = jax.lax.broadcasted_iota(jnp.int32, (1, I), 1)
    lane_m = jax.lax.broadcasted_iota(jnp.int32, (RB, MP), 1)
    KC = kpop * C
    lane_kc = jax.lax.broadcasted_iota(jnp.int32, (RB, KC), 1)
    # rank-pick machinery for the inner batched sweep (cluster_kernel.py)
    ltri = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)).astype(f32)
    ltriS = (jax.lax.broadcasted_iota(jnp.int32, (SM, SM), 0)
             < jax.lax.broadcasted_iota(jnp.int32, (SM, SM), 1)).astype(f32)
    lane_id9 = (jax.lax.broadcasted_iota(jnp.int32, (SM, 128), 0) * 128
                + jax.lax.broadcasted_iota(jnp.int32, (SM, 128), 1))

    # lane-padding guard: a degenerate padding box can still PASS the slab
    # test (min/max per axis un-inverts it), so mask by real instance count
    ikey = jnp.where(lane_i < NI, ikey, BIG)

    best_t0 = jnp.minimum(tmax, f32(MIRO_TMAX))               # (RB, 1)
    state = (ikey, best_t0,
             jnp.full((RB, 1), -1, jnp.int32),                # tri
             jnp.zeros((RB, 1), jnp.int32),                   # inst
             jnp.zeros((RB, 1), f32), jnp.zeros((RB, 1), f32))

    def viable(key, best_t, best_tri):
        v = key < best_t
        if any_hit:
            v = v & (best_tri < 0)
        return v

    def ocond(s):
        ikey, best_t, best_tri, _, _, _ = s
        return jnp.any(viable(ikey, best_t, best_tri))

    def obody(s):
        ikey, best_t, best_tri, best_inst, best_a, best_b = s
        mkey = jnp.where(viable(ikey, best_t, best_tri), ikey, BIG)
        colmin = jnp.min(mkey, axis=0).reshape(1, I)
        i = jnp.argmin(colmin, axis=1)[0]                     # scalar inst

        # instance metadata + world->object affine from SMEM (flat 1-D:
        # scalar loads; 2-D SMEM pads the minor dim to 128 lanes)
        p = imeta_ref[2 * i]
        iid = imeta_ref[2 * i + 1]
        off = pmeta_ref[2 * p]
        mlen = pmeta_ref[2 * p + 1]
        m = [iminv_ref[12 * i + j] for j in range(12)]
        oxl = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
        oyl = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
        ozl = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
        dxl = m[0] * dx + m[1] * dy + m[2] * dz
        dyl = m[4] * dx + m[5] * dy + m[6] * dz
        dzl = m[8] * dx + m[9] * dy + m[10] * dz

        # inner cull: object-space block vs this prototype's cluster boxes;
        # lanes beyond the prototype's cluster count masked out (their
        # padding boxes are not guaranteed to fail the slab test)
        ckey = slab6(pbb_ref, 6 * p, MP, (oxl, oyl, ozl), (dxl, dyl, dzl))
        ckey = jnp.where(lane_m < mlen, ckey, BIG)

        def viable9(best_t, best_tri, done9):
            v = viable(ckey, best_t, best_tri)                # (RB, MP)
            vrow = jnp.max(jnp.where(v, 1.0, 0.0), axis=0).reshape(1, MP)
            v9 = jnp.concatenate(
                [vrow[:, s * 128:(s + 1) * 128] for s in range(SM)],
                axis=0)
            return ((v9 > 0.5) & (done9 == 0)).astype(jnp.int32)

        def mt_clusters(cs, best):
            """One wide MT pass over kpop clusters in OBJECT space."""
            best_t, best_tri, best_inst, best_a, best_b = best
            cat = lambda ref: jnp.concatenate(
                [ref[pl.ds(3 * c, 3), :] for c in cs], axis=1)  # (3, KC)
            p0 = cat(p0_ref)
            e1 = cat(e1_ref)
            e2 = cat(e2_ref)

            def comp(m3, k):
                return m3[k, :].reshape(1, KC)

            p0x, p0y, p0z = comp(p0, 0), comp(p0, 1), comp(p0, 2)
            e1x, e1y, e1z = comp(e1, 0), comp(e1, 1), comp(e1, 2)
            e2x, e2y, e2z = comp(e2, 0), comp(e2, 1), comp(e2, 2)

            # Moller-Trumbore in object space, t in world units
            pvx = dyl * e2z - dzl * e2y
            pvy = dzl * e2x - dxl * e2z
            pvz = dxl * e2y - dyl * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = 1.0 / det
            tvx = oxl - p0x
            tvy = oyl - p0y
            tvz = ozl - p0z
            a = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            b = (dxl * qvx + dyl * qvy + dzl * qvz) * inv_det
            t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

            tid = jnp.concatenate(
                [tri_ref[pl.ds(c, 1), :] for c in cs], axis=1)  # (1, KC)
            ok = (a >= 0.0) & (a <= 1.0) & (b >= 0.0) & (a + b <= 1.0) \
                & (det != 0.0) & (tid >= 0) & (t >= tmin) & (t < best_t)

            if cheap_any:
                got = jnp.any(ok, axis=1, keepdims=True)
                best_tri = jnp.where(got, 1, best_tri)
                return (best_t, best_tri, best_inst, best_a, best_b)

            th = jnp.where(ok, t, BIG)                        # (RB, KC)
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
            best_inst = jnp.where(got, iid, best_inst)
            return (best_t, best_tri, best_inst, best_a, best_b)

        def icond(s2):
            v9, *_ = s2
            return jnp.any(v9 > 0)

        def ibody(s2):
            v9, done9, best_t, best_tri, best_inst, best_a, best_b = s2
            vb = v9 > 0
            vf = v9.astype(f32)
            intra = jnp.dot(vf, ltri, preferred_element_type=f32)
            segc = jnp.sum(vf, axis=1, keepdims=True)
            if SM > 1:
                segoff = jnp.dot(ltriS, segc, preferred_element_type=f32)
            else:
                segoff = jnp.zeros((SM, 1), f32)
            rank = (intra + segoff).astype(jnp.int32)
            cs = []
            for k in range(0, kpop, 2):
                # two lane ids packed per scalar extract (15 bits each)
                w = jnp.where(vb & (rank == k), lane_id9, 0) \
                    + jnp.where(vb & (rank == k + 1), lane_id9 * 32768, 0)
                jk = jnp.sum(w)
                cs.append(off + jnp.minimum(jk & 0x7FFF, MP - 1))
                cs.append(off + jnp.minimum(jk >> 15, MP - 1))
            done9 = done9 | (v9 * (rank < kpop))
            best = mt_clusters(cs, (best_t, best_tri, best_inst,
                                    best_a, best_b))
            best_t, best_tri, best_inst, best_a, best_b = best
            v9 = viable9(best_t, best_tri, done9)
            return (v9, done9, best_t, best_tri, best_inst,
                    best_a, best_b)

        done9 = jnp.zeros((SM, 128), jnp.int32)
        v9 = viable9(best_t, best_tri, done9)
        _, _, best_t, best_tri, best_inst, best_a, best_b = \
            jax.lax.while_loop(icond, ibody,
                               (v9, done9, best_t, best_tri, best_inst,
                                best_a, best_b))

        ikey = jnp.where(lane1i == i, BIG, ikey)              # retire inst
        return (ikey, best_t, best_tri, best_inst, best_a, best_b)

    _, best_t, best_tri, best_inst, best_a, best_b = jax.lax.while_loop(
        ocond, obody, state)

    t_out[0, 0, :] = best_t.reshape(RB)
    tri_out[0, 0, :] = best_tri.reshape(RB)
    inst_out[0, 0, :] = best_inst.reshape(RB)
    a_out[0, 0, :] = best_a.reshape(RB)
    b_out[0, 0, :] = best_b.reshape(RB)


@partial(jax.jit, static_argnames=('any_hit', 'rb', 'interpret', 'kpop'))
def pallas_icluster_trace(scene: Scene, o, d, time, tmin, tmax,
                          any_hit: bool = False, rb: int = DEF_RB,
                          interpret: bool | None = None,
                          kpop: int = DEF_KPOP) -> Hit:
    """Trace a wavefront with the two-level instanced kernel -> Hit.

    Static instanced geometry only (scene.iclusters, already in kernel
    layout from geometry/clusters.build_instanced_clusters); callers trace
    scene.mb_clusters separately and merge (integrator.trace_fn). Gradients
    do not flow (ids + pinned floats; intersect.refine_hit recomputes
    differentiably, instance-aware).
    """
    icl = jax.lax.stop_gradient(scene.iclusters)
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    tmin = jax.lax.stop_gradient(tmin)
    tmax = jax.lax.stop_gradient(tmax)
    R = o.shape[0]
    Mtot, C = icl.tri.shape
    I = icl.ibb.shape[1]
    MP = icl.pbb.shape[1]
    f32 = jnp.float32
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    cheap_any = bool(any_hit) and not scene.has_alpha_maps
    need_ab = bool(scene.has_alpha_maps)
    assert kpop % 2 == 0, 'kpop must be even (ids are extracted in pairs)'
    assert MP <= 32768, 'prototype too large for packed picks'

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

    # scene-bbox bundle cull (ops/pallas/bundle.py): blocks whose ray
    # bundle cannot enter the union of instance world boxes (sky blocks,
    # already-terminated alpha-march prefixes) skip the kernel's whole
    # (RB, I) instance cull, not just the sweep
    from .bundle import make_block_culler, disable_blocks, box_union
    rays = disable_blocks(
        rays, make_block_culler(rays)(*box_union(jnp.asarray(icl.ibb, f32))))

    nb = Rp // rb
    whole = lambda i: (0, 0)
    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((6, I), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((icl.pbb.shape[0], MP), whole,
                         memory_space=pltpu.VMEM),
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

    def kern(ibb_r, iminv_r, imeta_r, pbb_r, pmeta_r, p0_r, e1_r, e2_r,
             tri_r, rays_r, t_o, tri_o, inst_o, a_o, b_o):
        _kernel(ibb_r, iminv_r, imeta_r, pbb_r, pmeta_r, p0_r, e1_r, e2_r,
                tri_r, rays_r[0], t_o, tri_o, inst_o, a_o, b_o,
                any_hit=any_hit, cheap_any=cheap_any, need_ab=need_ab,
                kpop=kpop, I=I, NI=icl.num_instances, MP=MP, C=C,
                RB=rb)

    vma = getattr(jax.typeof(rays), 'vma', frozenset())

    def out_struct(dtype):
        try:
            return jax.ShapeDtypeStruct((nb, 1, rb), dtype, vma=vma)
        except TypeError:  # older jax without the vma kwarg
            return jax.ShapeDtypeStruct((nb, 1, rb), dtype)

    t, tri_id, inst, a, b = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[out_struct(f32), out_struct(jnp.int32),
                   out_struct(jnp.int32), out_struct(f32), out_struct(f32)],
        interpret=interpret,
    )(jnp.asarray(icl.ibb, f32), jnp.asarray(icl.iminv, f32).reshape(-1),
      jnp.asarray(icl.imeta, jnp.int32).reshape(-1),
      jnp.asarray(icl.pbb, f32),
      jnp.asarray(icl.pmeta, jnp.int32).reshape(-1),
      jnp.asarray(icl.p0, f32), jnp.asarray(icl.e1, f32),
      jnp.asarray(icl.e2, f32), jnp.asarray(icl.tri, jnp.int32), rays)

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
