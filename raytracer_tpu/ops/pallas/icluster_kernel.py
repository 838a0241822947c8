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
     the precomputed world->object affine. Directions are NOT renormalized,
     so the ray parameter t is identical in both spaces (the same invariant
     the reference relies on, src/ProxyObject.cpp:78-84).
  3. inner sweep: cull the object-space block against the instance's
     prototype cluster AABBs -> (RB, MP) keys, then run the single-level
     near-ordered cluster sweep (MT against contiguous 128-triangle slabs)
     updating the per-ray best (t, tri, inst, a, b). Prototype tables are
     shared: VMEM holds ONE copy per prototype regardless of instance count
     (the reference's 1M-bunny memory story, webpage "Instancing").
  4. retire the instance, continue until no instance's entry beats best t.

Front-to-back instance ordering + per-ray best-t pruning means a block
typically visits only the handful of instances its rays actually overlap.

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
# counts (RB=256 blew the 16 MB limit by 2.6 MB at I=1920)
DEF_RB = 32


def _kernel(ibb_ref, iminv_ref, imeta_ref, pbb_ref, pmeta_ref,
            p0_ref, e1_ref, e2_ref, tri_ref, rays_ref,
            t_out, tri_out, inst_out, a_out, b_out,
            *, any_hit: bool, I: int, NI: int, MP: int, C: int, RB: int):
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
                     any_hit=any_hit, I=I, NI=NI, MP=MP, C=C, RB=RB)


def _trace_block(ox, oy, oz, dx, dy, dz, tmin, tmax,
                 iminv_ref, imeta_ref, ibb_ref, pbb_ref, pmeta_ref,
                 p0_ref, e1_ref, e2_ref, tri_ref,
                 t_out, tri_out, inst_out, a_out, b_out,
                 *, any_hit: bool, I: int, NI: int, MP: int, C: int,
                 RB: int):
    f32 = jnp.float32

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
    lane_m = jax.lax.broadcasted_iota(jnp.int32, (RB, MP), 1)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

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

        # world -> object transform of the whole block (t preserved: the
        # direction is mapped by the same linear part, not renormalized)
        mi = iminv_ref[pl.ds(i, 1), :]                        # (1, 12)
        m = [mi[0, k] for k in range(12)]
        oxl = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
        oyl = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
        ozl = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
        dxl = m[0] * dx + m[1] * dy + m[2] * dz
        dyl = m[4] * dx + m[5] * dy + m[6] * dz
        dzl = m[8] * dx + m[9] * dy + m[10] * dz

        meta = imeta_ref[pl.ds(i, 1), :]                      # (1, 2) i32
        p = meta[0, 0]
        iid = meta[0, 1]
        pm = pmeta_ref[pl.ds(p, 1), :]                        # (1, 2) i32
        off = pm[0, 0]
        mlen = pm[0, 1]

        # inner cull: object-space block vs this prototype's cluster boxes;
        # lanes beyond the prototype's cluster count masked out (their
        # padding boxes are not guaranteed to fail the slab test)
        ckey = slab6(pbb_ref, 6 * p, MP, (oxl, oyl, ozl), (dxl, dyl, dzl))
        ckey = jnp.where(lane_m < mlen, ckey, BIG)

        def icond(s2):
            ckey, best_t, best_tri, *_ = s2
            return jnp.any(viable(ckey, best_t, best_tri))

        def ibody(s2):
            ckey, best_t, best_tri, best_inst, best_a, best_b = s2
            cmkey = jnp.where(viable(ckey, best_t, best_tri), ckey, BIG)
            ccol = jnp.min(cmkey, axis=0).reshape(1, MP)
            c = jnp.argmin(ccol, axis=1)[0]                   # local cluster

            row = 3 * (off + c)
            p0 = p0_ref[pl.ds(row, 3), :]                     # (3, C)
            e1 = e1_ref[pl.ds(row, 3), :]
            e2 = e2_ref[pl.ds(row, 3), :]

            def comp(m3, k):
                return m3[k, :].reshape(1, C)

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

            tid = tri_ref[pl.ds(off + c, 1), :].reshape(1, C)
            ok = (a >= 0.0) & (a <= 1.0) & (b >= 0.0) & (a + b <= 1.0) \
                & (det != 0.0) & (tid >= 0) & (t >= tmin) & (t < best_t)
            th = jnp.where(ok, t, BIG)                        # (RB, C)
            tmin_c = jnp.min(th, axis=1, keepdims=True)       # (RB, 1)
            jsel = jnp.argmin(th, axis=1).reshape(RB, 1)
            got = tmin_c < BIG
            sel = lane_c == jsel                              # (RB, C)

            def pick(v, old):
                vj = jnp.sum(jnp.where(sel, v, 0.0), axis=1, keepdims=True)
                return jnp.where(got, vj, old)

            best_t = jnp.where(got, tmin_c, best_t)
            best_a = pick(a, best_a)
            best_b = pick(b, best_b)
            tidj = jnp.sum(jnp.where(sel, tid, 0), axis=1, keepdims=True)
            best_tri = jnp.where(got, tidj, best_tri)
            best_inst = jnp.where(got, iid, best_inst)
            ckey = jnp.where(lane_m == c, BIG, ckey)          # retire cluster
            return (ckey, best_t, best_tri, best_inst, best_a, best_b)

        _, best_t, best_tri, best_inst, best_a, best_b = jax.lax.while_loop(
            icond, ibody,
            (ckey, best_t, best_tri, best_inst, best_a, best_b))

        ikey = jnp.where(lane_i == i, BIG, ikey)              # retire inst
        return (ikey, best_t, best_tri, best_inst, best_a, best_b)

    _, best_t, best_tri, best_inst, best_a, best_b = jax.lax.while_loop(
        ocond, obody, state)

    t_out[0, 0, :] = best_t.reshape(RB)
    tri_out[0, 0, :] = best_tri.reshape(RB)
    inst_out[0, 0, :] = best_inst.reshape(RB)
    a_out[0, 0, :] = best_a.reshape(RB)
    b_out[0, 0, :] = best_b.reshape(RB)


@partial(jax.jit, static_argnames=('any_hit', 'rb', 'interpret'))
def pallas_icluster_trace(scene: Scene, o, d, time, tmin, tmax,
                          any_hit: bool = False, rb: int = DEF_RB,
                          interpret: bool | None = None) -> Hit:
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
    P, MP = icl.pmeta.shape[0], icl.pbb.shape[1]
    f32 = jnp.float32
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'

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
    whole = lambda i: (0, 0)
    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((6, I), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((I, 12), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((I, 2), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((P * 6, MP), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 2), whole, memory_space=pltpu.VMEM),
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
                any_hit=any_hit, I=I, NI=icl.num_instances, MP=MP, C=C,
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
    )(jnp.asarray(icl.ibb, f32), jnp.asarray(icl.iminv, f32),
      jnp.asarray(icl.imeta, jnp.int32), jnp.asarray(icl.pbb, f32),
      jnp.asarray(icl.pmeta, jnp.int32), jnp.asarray(icl.p0, f32),
      jnp.asarray(icl.e1, f32), jnp.asarray(icl.e2, f32),
      jnp.asarray(icl.tri, jnp.int32), rays)

    t = t.reshape(Rp)[:R]
    tri_id = tri_id.reshape(Rp)[:R]
    inst = inst.reshape(Rp)[:R]
    a = a.reshape(Rp)[:R]
    b = b.reshape(Rp)[:R]
    t = jnp.where(tri_id >= 0, t, MIRO_TMAX)
    return Hit(t=t, tri=tri_id, inst=jnp.where(tri_id >= 0, inst, 0),
               a=a, b=b)
