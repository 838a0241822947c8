"""A/B the grouped cluster kernel (rb, kpop) on coherent vs incoherent rays
(fetch-timed, HD sponza geometry). Round-4 flat-kernel numbers to beat:
0.90 coh / 0.75 incoh Mray/s (rb=32, KPOP=4)."""
import sys
import time

import jax
import jax.numpy as jnp

from raytracer_tpu.scenes import registry
from raytracer_tpu.ops.pallas import cluster_kernel as ck
from raytracer_tpu.render import integrator

scene, cam, st = registry.make('sponza_proxy', width=64, height=36, hd=True)
print('tris', scene.num_tris, flush=True)

R = 32 * 1024
key = jax.random.PRNGKey(1)
k1, k2, k3 = jax.random.split(key, 3)
o_c = jnp.tile(jnp.asarray([[8.0, 1.5, 1.0]]), (R, 1))
t_c = jnp.stack([jax.random.uniform(k1, (R,), minval=-9, maxval=3),
                 jax.random.uniform(k2, (R,), minval=0.5, maxval=4.0),
                 jax.random.uniform(k3, (R,), minval=-4, maxval=2)], 1)
d_c = t_c - o_c
d_c = d_c / jnp.linalg.norm(d_c, axis=-1, keepdims=True)
o_i = jnp.stack([jax.random.uniform(k1, (R,), minval=-9, maxval=9),
                 jax.random.uniform(k2, (R,), minval=0.2, maxval=7.0),
                 jax.random.uniform(k3, (R,), minval=-4, maxval=4)], 1)
d_i = jax.random.normal(jax.random.fold_in(key, 7), (R, 3))
d_i = d_i / jnp.linalg.norm(d_i, axis=-1, keepdims=True)

chunks = integrator._mb_chunks(scene.clusters, False)
print('chunks', len(chunks), 'M per chunk',
      [c.tri.shape[0] for c in chunks], flush=True)


NREP = 8  # kernel calls per dispatch: the axon tunnel has a ~25 ms
          # per-dispatch floor that swamped single-call timings


def bench(name, o, d, rb, kpop, any_hit=False):
    @jax.jit
    def tr(scene, o, d, eps):
        acc = 0.0
        for r in range(NREP):
            h = None
            for tab in chunks:
                h2 = ck.pallas_cluster_trace(scene, o + eps * (r + 1), d,
                                             jnp.zeros(R), 1e-3, 1e12,
                                             any_hit, rb=rb, table=tab,
                                             kpop=kpop)
                h = h2 if h is None else integrator._merge_hits(h, h2)
            acc = acc + jnp.sum(h.t * (h.tri >= 0))
        return acc

    tr(scene, o, d, 0.0)
    ts = []
    for i in range(3):
        t0 = time.time()
        float(tr(scene, o, d, 1e-4 * (i + 1)))
        ts.append(time.time() - t0)
    w = min(ts) / NREP
    print(f'{name} rb={rb} kpop={kpop} ah={int(any_hit)}: '
          f'{w*1000:.1f} ms ({R/w/1e6:.2f} Mray/s)', flush=True)


import importlib.util as ilu
spec = ilu.spec_from_file_location('r4ck', '/tmp/r4_cluster_kernel.py')
r4ck = ilu.module_from_spec(spec)
spec.loader.exec_module(r4ck)


def bench_r4(name, o, d):
    @jax.jit
    def tr(scene, o, d, eps):
        acc = 0.0
        for r in range(NREP):
            h = None
            for tab in chunks:
                h2 = r4ck.pallas_cluster_trace(scene, o + eps * (r + 1), d,
                                               jnp.zeros(R), 1e-3, 1e12,
                                               False, table=tab)
                h = h2 if h is None else integrator._merge_hits(h, h2)
            acc = acc + jnp.sum(h.t * (h.tri >= 0))
        return acc

    tr(scene, o, d, 0.0)
    ts = []
    for i in range(3):
        t0 = time.time()
        float(tr(scene, o, d, 1e-4 * (i + 1)))
        ts.append(time.time() - t0)
    w = min(ts) / NREP
    print(f'{name} R4-KERNEL: {w*1000:.1f} ms ({R/w/1e6:.2f} Mray/s)',
          flush=True)


bench('coherent  ', o_c, d_c, 32, 16)
bench('incoherent', o_i, d_i, 32, 16)
chunks = [scene.clusters]
print('single chunk M', scene.clusters.tri.shape[0], flush=True)
bench('coherent 1ch', o_c, d_c, 32, 16)
bench('incoherent 1ch', o_i, d_i, 32, 16)
