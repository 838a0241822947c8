"""Ablate the per-iteration cost of the cluster sweep on real TPU.

Fixed fori_loop of N iterations (identical across variants), sponza-chunk
sized tables, rb=32 blocks. Variants isolate the cost of each sweep
ingredient:
  empty   : loop with carry only (loop overhead)
  mt0     : MT on a STATIC slab (no pick, no dynamic slice)
  dsmt    : counter-driven DYNAMIC slice + MT (no argmin/extract)
  pick    : viability mask + colmin + argmin + scalar extract, no MT
  full    : pick + dynamic slice + MT + best update (flat-kernel body)
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.scenes import registry
from raytracer_tpu.render import integrator

scene, cam, st = registry.make('sponza_proxy', width=64, height=36, hd=True)
tab = integrator._mb_chunks(scene.clusters, False)[0]
M, _, C = tab.p0.shape
print('M', M, 'C', C, flush=True)

RB = 32
NSUB = 4           # sub-sweeps per invocation for the 'full4' variant
R = 32 * 1024
NIT = 64
key = jax.random.PRNGKey(1)
k1, k2, k3 = jax.random.split(key, 3)
o = jnp.stack([jax.random.uniform(k1, (R,), minval=-9, maxval=9),
               jax.random.uniform(k2, (R,), minval=0.2, maxval=7.0),
               jax.random.uniform(k3, (R,), minval=-4, maxval=4)], 1)
d = jax.random.normal(jax.random.fold_in(key, 7), (R, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

BIG = np.float32(3e38)


def make_kernel(variant, sub=0):
    def kern(bb_ref, p0_ref, e1_ref, e2_ref, tri_ref, rays_ref,
             t_out):
        f32 = jnp.float32
        rays = rays_ref[0]

        def ray_row(i):
            return rays[i, sub * RB:(sub + 1) * RB].reshape(RB, 1)

        ox, oy, oz = ray_row(0), ray_row(1), ray_row(2)
        dx, dy, dz = ray_row(3), ray_row(4), ray_row(5)
        tmin = jnp.zeros((RB, 1), f32) + 1e-3

        def rcp(v):
            tiny = f32(1e-20)
            return 1.0 / jnp.where(jnp.abs(v) < tiny,
                                   jnp.where(v < 0, -tiny, tiny), v)

        ix, iy, iz = rcp(dx), rcp(dy), rcp(dz)

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
        ok_box = (near <= far) & (far >= tmin)
        key = jnp.where(ok_box, jnp.maximum(near, 0.0), BIG)

        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

        def mt(c, best_t, best_tri):
            p0 = p0_ref[pl.ds(3 * c, 3), :]
            e1 = e1_ref[pl.ds(3 * c, 3), :]
            e2 = e2_ref[pl.ds(3 * c, 3), :]

            def comp(m3, i):
                return m3[i, :].reshape(1, C)

            p0x, p0y, p0z = comp(p0, 0), comp(p0, 1), comp(p0, 2)
            e1x, e1y, e1z = comp(e1, 0), comp(e1, 1), comp(e1, 2)
            e2x, e2y, e2z = comp(e2, 0), comp(e2, 1), comp(e2, 2)
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = 1.0 / det
            tvx = ox - p0x
            tvy = oy - p0y
            tvz = oz - p0z
            a = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            b = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
            tid = tri_ref[c, :].reshape(1, C)
            ok = (a >= 0.0) & (a <= 1.0) & (b >= 0.0) & (a + b <= 1.0) \
                & (det != 0.0) & (tid >= 0) & (t >= tmin) & (t < best_t)
            th = jnp.where(ok, t, BIG)
            tmin_c = jnp.min(th, axis=1, keepdims=True)
            jsel = jnp.argmin(th, axis=1).reshape(RB, 1)
            got = tmin_c < BIG
            sel = lane_c == jsel
            best_t = jnp.where(got, tmin_c, best_t)
            tidj = jnp.sum(jnp.where(sel, tid, 0), axis=1, keepdims=True)
            best_tri = jnp.where(got, tidj, best_tri)
            return best_t, best_tri

        # pre-broadcast ray components to full (RB, C) registers
        zc = jnp.zeros((RB, C), f32)
        oxb, oyb, ozb = ox + zc, oy + zc, oz + zc
        dxb, dyb, dzb = dx + zc, dy + zc, dz + zc

        def mtb(c, best_t, best_tri):
            p0 = p0_ref[pl.ds(3 * c, 3), :]
            e1 = e1_ref[pl.ds(3 * c, 3), :]
            e2 = e2_ref[pl.ds(3 * c, 3), :]

            def comp(m3, i):
                return m3[i, :].reshape(1, C) + zc          # (RB, C)

            p0x, p0y, p0z = comp(p0, 0), comp(p0, 1), comp(p0, 2)
            e1x, e1y, e1z = comp(e1, 0), comp(e1, 1), comp(e1, 2)
            e2x, e2y, e2z = comp(e2, 0), comp(e2, 1), comp(e2, 2)
            pvx = dyb * e2z - dzb * e2y
            pvy = dzb * e2x - dxb * e2z
            pvz = dxb * e2y - dyb * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = 1.0 / det
            tvx = oxb - p0x
            tvy = oyb - p0y
            tvz = ozb - p0z
            a = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            b = (dxb * qvx + dyb * qvy + dzb * qvz) * inv_det
            t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
            tid = tri_ref[c, :].reshape(1, C)
            ok = (a >= 0.0) & (a <= 1.0) & (b >= 0.0) & (a + b <= 1.0) \
                & (det != 0.0) & (tid >= 0) & (t >= tmin) & (t < best_t)
            th = jnp.where(ok, t, BIG)
            tmin_c = jnp.min(th, axis=1, keepdims=True)
            jsel = jnp.argmin(th, axis=1).reshape(RB, 1)
            got = tmin_c < BIG
            sel = lane_c == jsel
            best_t = jnp.where(got, tmin_c, best_t)
            tidj = jnp.sum(jnp.where(sel, tid, 0), axis=1, keepdims=True)
            best_tri = jnp.where(got, tidj, best_tri)
            return best_t, best_tri

        KW = 8
        lane_kc = jax.lax.broadcasted_iota(jnp.int32, (RB, KW * C), 1)

        def mtw(cs, best_t, best_tri):
            """ONE wide MT over KW concatenated slabs."""
            cat = lambda ref: jnp.concatenate(
                [ref[pl.ds(3 * c, 3), :] for c in cs], axis=1)
            p0 = cat(p0_ref)
            e1 = cat(e1_ref)
            e2 = cat(e2_ref)
            KC = KW * C

            def comp(m3, i):
                return m3[i, :].reshape(1, KC)

            p0x, p0y, p0z = comp(p0, 0), comp(p0, 1), comp(p0, 2)
            e1x, e1y, e1z = comp(e1, 0), comp(e1, 1), comp(e1, 2)
            e2x, e2y, e2z = comp(e2, 0), comp(e2, 1), comp(e2, 2)
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = 1.0 / det
            tvx = ox - p0x
            tvy = oy - p0y
            tvz = oz - p0z
            a = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            b = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
            tid = jnp.concatenate(
                [tri_ref[pl.ds(c, 1), :] for c in cs], axis=1)
            ok = (a >= 0.0) & (a <= 1.0) & (b >= 0.0) & (a + b <= 1.0) \
                & (det != 0.0) & (tid >= 0) & (t >= tmin) & (t < best_t)
            th = jnp.where(ok, t, BIG)
            tmin_c = jnp.min(th, axis=1, keepdims=True)
            jsel = jnp.argmin(th, axis=1).reshape(RB, 1)
            got = tmin_c < BIG
            sel = lane_kc == jsel
            best_t = jnp.where(got, tmin_c, best_t)
            tidj = jnp.sum(jnp.where(sel, tid, 0), axis=1, keepdims=True)
            best_tri = jnp.where(got, tidj, best_tri)
            return best_t, best_tri

        S = M // 128  # probe: ignore the ragged tail segment (timing only)
        ltri = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
                < jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
                ).astype(f32)
        ltriS = (jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
                 < jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
                 ).astype(f32)
        lane_id9 = (jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0) * 128
                    + jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1))

        def pick8(best_t, packed):
            """rank-based pick of 8 ids, packed 2-per-extract."""
            v = key < best_t
            vrow = jnp.max(jnp.where(v, 1.0, 0.0), axis=0).reshape(1, M)
            v9 = jnp.concatenate(
                [vrow[:, s * 128:(s + 1) * 128] for s in range(S)], axis=0)
            vb = v9 > 0.5
            vf = jnp.where(vb, 1.0, 0.0)
            intra = jnp.dot(vf, ltri, preferred_element_type=f32)
            segc = jnp.sum(vf, axis=1, keepdims=True)
            segoff = jnp.dot(ltriS, segc, preferred_element_type=f32)
            rank = (intra + segoff).astype(jnp.int32)
            cs = []
            for k2 in range(0, KW, 2):
                w = jnp.where(vb & (rank == k2), lane_id9, 0) \
                    + jnp.where(vb & (rank == k2 + 1), lane_id9 * 4096, 0)
                jk = jnp.sum(w)
                if packed:
                    cs.append(jnp.minimum(jk & 0xFFF, M - 1))
                    cs.append(jnp.minimum(jk >> 12, M - 1))
            return cs

        def body2(k, s):
            best_t, best_tri = s
            if variant == 'empty_small':
                return (best_t + 1e-9, best_tri)
            if variant == 'mt0b':
                best_t, best_tri = mtb(k % (M - 1), best_t, best_tri)
                return (best_t, best_tri)
            if variant == 'mt0w':
                c0 = (k * KW) % (M - KW)
                best_t, best_tri = mtw([c0 + i for i in range(KW)],
                                       best_t, best_tri)
                return (best_t, best_tri)
            if variant == 'pick8p':
                cs = pick8(best_t, True)
                acc = cs[0]
                for c in cs[1:]:
                    acc = acc + c
                return (best_t - 1e-12 * acc.astype(f32), best_tri)
            if variant == 'pick8p_mt':
                cs = pick8(best_t, True)
                best_t, best_tri = mtw(cs, best_t, best_tri)
                return (best_t, best_tri)
            best_t, best_tri = mt(0, best_t, best_tri)
            return (best_t, best_tri)

        def body(k, s):
            key, best_t, best_tri = s
            if variant == 'empty':
                return (key, best_t + 1e-9, best_tri)
            if variant == 'mt0':
                best_t, best_tri = mt(0, best_t, best_tri)
                return (key, best_t, best_tri)
            if variant == 'dsmt':
                c = k % (M - 1)
                best_t, best_tri = mt(c, best_t, best_tri)
                return (key, best_t, best_tri)
            # pick / full
            mkey = jnp.where(key < best_t, key, BIG)
            colmin = jnp.min(mkey, axis=0).reshape(1, M)
            c = jnp.argmin(colmin, axis=1)[0]
            key = jnp.where(lane1 == c, BIG, key)
            if variant == 'pick':
                best_t = best_t - 1e-9 * c.astype(f32)
                return (key, best_t, best_tri)
            best_t, best_tri = mt(c, best_t, best_tri)
            return (key, best_t, best_tri)

        best_t = jnp.full((RB, 1), f32(1e30))
        best_tri = jnp.full((RB, 1), -1, jnp.int32)
        if variant in ('empty_small', 'mt0_small', 'mt0b', 'mt0w',
                       'pick8p', 'pick8p_mt'):
            best_t, best_tri = jax.lax.fori_loop(
                0, NIT, body2, (best_t, best_tri))
            best_t = best_t + jnp.min(key, axis=1, keepdims=True)
        else:
            key, best_t, best_tri = jax.lax.fori_loop(
                0, NIT, body, (key, best_t, best_tri))
        t_out[0, 0, :] = best_t.reshape(RB) + best_tri.reshape(RB)

    return kern


def run(variant):
    f32 = jnp.float32
    bb = jnp.concatenate([jnp.asarray(tab.bb_min, f32).T,
                          jnp.asarray(tab.bb_max, f32).T])
    p0 = jnp.asarray(tab.p0, f32).reshape(M * 3, C)
    e1 = jnp.asarray(tab.e1, f32).reshape(M * 3, C)
    e2 = jnp.asarray(tab.e2, f32).reshape(M * 3, C)
    tri = jnp.asarray(tab.tri, jnp.int32)

    nb = R // RB
    whole = lambda i: (0, 0)
    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((6, M), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((M * 3, C), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((M * 3, C), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((M * 3, C), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, C), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, RB), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, 1, RB), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
    )

    @jax.jit
    def go(o, d, eps):
        rays = jnp.stack([o[:, 0] + eps, o[:, 1], o[:, 2],
                          d[:, 0], d[:, 1], d[:, 2],
                          jnp.zeros(R), jnp.ones(R), jnp.zeros(R)])
        rays = rays.reshape(9, nb, RB).transpose(1, 0, 2)
        (t,) = pl.pallas_call(
            make_kernel(variant), grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((nb, 1, RB), jnp.float32)],
            interpret=False,
        )(bb, p0, e1, e2, tri, rays)
        return jnp.sum(t)

    go(o, d, 0.0)
    ts = []
    for i in range(3):
        t0 = time.time()
        float(go(o, d, 1e-4 * (i + 1)))
        ts.append(time.time() - t0)
    w = min(ts)
    per_it = w / nb / NIT * 1e9
    print(f'{variant:6s}: {w*1000:7.1f} ms  {per_it:8.1f} ns/block-iter',
          flush=True)


for v in ('empty_small', 'mt0_small', 'mt0w', 'pick8p', 'pick8p_mt',
          'full'):
    run(v)
