"""Do independent sweep chains overlap on the TPU scalar/vector units?

One kernel invocation holds NSUB independent 32-ray sub-sweeps iterating
in lockstep (fixed NIT fori_loop). If Mosaic interleaves the independent
pick -> fetch -> MT chains, per-sub-iteration cost should drop well below
the NSUB=1 cost. Fetch-timed on sponza-chunk tables.
"""
import time

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
R = 32 * 1024
NIT = 48
key = jax.random.PRNGKey(1)
k1, k2, k3 = jax.random.split(key, 3)
o = jnp.stack([jax.random.uniform(k1, (R,), minval=-9, maxval=9),
               jax.random.uniform(k2, (R,), minval=0.2, maxval=7.0),
               jax.random.uniform(k3, (R,), minval=-4, maxval=4)], 1)
d = jax.random.normal(jax.random.fold_in(key, 7), (R, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

BIG = np.float32(3e38)


def make_kernel(nsub):
    def kern(bb_ref, p0_ref, e1_ref, e2_ref, tri_ref, rays_ref, t_out):
        f32 = jnp.float32
        rays = rays_ref[0]
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

        subs = []
        for s in range(nsub):
            def rr(i, s=s):
                return rays[i, s * RB:(s + 1) * RB].reshape(RB, 1)

            ox, oy, oz = rr(0), rr(1), rr(2)
            dx, dy, dz = rr(3), rr(4), rr(5)
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
            keymat = jnp.where(ok_box, jnp.maximum(near, 0.0), BIG)

            def mt(c, best_t, best_tri, ox=ox, oy=oy, oz=oz,
                   dx=dx, dy=dy, dz=dz, tmin=tmin):
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
                tid = tri_ref[pl.ds(c, 1), :].reshape(1, C)
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

            subs.append((keymat, mt))

        def body(k, st):
            out = []
            for s in range(nsub):
                key, best_t, best_tri = st[s]
                mt = subs[s][1]
                mkey = jnp.where(key < best_t, key, BIG)
                colmin = jnp.min(mkey, axis=0).reshape(1, M)
                c = jnp.argmin(colmin, axis=1)[0]
                key = jnp.where(lane1 == c, BIG, key)
                best_t, best_tri = mt(c, best_t, best_tri)
                out.append((key, best_t, best_tri))
            return tuple(out)

        st0 = tuple((subs[s][0], jnp.full((RB, 1), jnp.float32(1e30)),
                     jnp.full((RB, 1), -1, jnp.int32))
                    for s in range(nsub))
        st = jax.lax.fori_loop(0, NIT, body, st0)
        acc = jnp.zeros((RB,), jnp.float32)
        for s in range(nsub):
            acc = acc + st[s][1].reshape(RB) + st[s][2].reshape(RB)
        t_out[0, 0, :] = acc

    return kern


def run(nsub):
    f32 = jnp.float32
    bb = jnp.concatenate([jnp.asarray(tab.bb_min, f32).T,
                          jnp.asarray(tab.bb_max, f32).T])
    p0 = jnp.asarray(tab.p0, f32).reshape(M * 3, C)
    e1 = jnp.asarray(tab.e1, f32).reshape(M * 3, C)
    e2 = jnp.asarray(tab.e2, f32).reshape(M * 3, C)
    tri = jnp.asarray(tab.tri, jnp.int32)

    rbw = RB * nsub
    nb = R // rbw
    whole = lambda i: (0, 0)
    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((6, M), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((M * 3, C), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((M * 3, C), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((M * 3, C), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, C), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, rbw), lambda i: (i, 0, 0),
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
        rays = rays.reshape(9, nb, rbw).transpose(1, 0, 2)
        (t,) = pl.pallas_call(
            make_kernel(nsub), grid_spec=grid_spec,
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
    per = w / nb / NIT / nsub * 1e9
    print(f'nsub={nsub}: {w*1000:7.1f} ms  {per:8.1f} ns per sub-iteration',
          flush=True)


for n in (1, 2, 4, 8):
    run(n)
