"""A/B the single-level cluster kernel block size + sweep behavior on
coherent vs incoherent rays (fetch-timed, HD sponza geometry)."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.scenes import registry
from raytracer_tpu.ops.pallas import cluster_kernel as ck
from raytracer_tpu.render import integrator

scene, cam, st = registry.make('sponza_proxy', width=64, height=36, hd=True)
print('tris', scene.num_tris, flush=True)

R = 32 * 1024
key = jax.random.PRNGKey(1)
k1, k2, k3 = jax.random.split(key, 3)
# coherent: camera-like rays from one point toward the atrium
o_c = jnp.tile(jnp.asarray([[8.0, 1.5, 1.0]]), (R, 1))
t_c = jnp.stack([jax.random.uniform(k1, (R,), minval=-9, maxval=3),
                 jax.random.uniform(k2, (R,), minval=0.5, maxval=4.0),
                 jax.random.uniform(k3, (R,), minval=-4, maxval=2)], 1)
d_c = t_c - o_c
d_c = d_c / jnp.linalg.norm(d_c, axis=-1, keepdims=True)
# incoherent: random origins in the atrium, random directions (GI-like)
o_i = jnp.stack([jax.random.uniform(k1, (R,), minval=-9, maxval=9),
                 jax.random.uniform(k2, (R,), minval=0.2, maxval=7.0),
                 jax.random.uniform(k3, (R,), minval=-4, maxval=4)], 1)
d_i = jax.random.normal(jax.random.fold_in(key, 7), (R, 3))
d_i = d_i / jnp.linalg.norm(d_i, axis=-1, keepdims=True)

chunks = integrator._mb_chunks(scene.clusters, False)
print('chunks', len(chunks), flush=True)


def bench(name, o, d, rb):
    @jax.jit
    def tr(scene, o, d, eps):
        h = None
        for tab in chunks:
            h2 = ck.pallas_cluster_trace(scene, o + eps, d,
                                         jnp.zeros(R), 1e-3, 1e12, False,
                                         rb=rb, table=tab)
            h = h2 if h is None else integrator._merge_hits(h, h2)
        return jnp.sum(h.t * (h.tri >= 0))

    tr(scene, o, d, 0.0)
    ts = []
    for i in range(2):
        t0 = time.time()
        float(tr(scene, o, d, 1e-4 * (i + 1)))
        ts.append(time.time() - t0)
    print(f'{name} rb={rb}: {min(ts)*1000:.1f} ms '
          f'({R/min(ts)/1e6:.2f} Mray/s)', flush=True)


for rb in (32, 64, 128):
    bench('coherent  ', o_c, d_c, rb)
    bench('incoherent', o_i, d_i, rb)
