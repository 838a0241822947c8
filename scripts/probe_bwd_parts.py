"""Attribute the backward pass's cost leaf-by-leaf.

The tile fwd+bwd (527 ms) costs 2.1x the forward (168 ms) although every
tracer is stop-gradient. Times value_and_grad w.r.t. each params leaf
alone (DCE prunes the other transposes), mirroring the bench body
(apply_params refresh=False, hoisted refresh).
"""
import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp

from raytracer_tpu.scenes import registry
from raytracer_tpu.render import camera as cam_mod, integrator
from raytracer_tpu.parallel import sharding

TILE = 32 * 1024

scene, cam, st = registry.make('sponza_proxy', width=1920, height=1080,
                               bvh=True, hd=True, path_trace=True,
                               max_bounces=10, ray_tile=TILE)
key = jax.random.PRNGKey(0)
px = jnp.arange(TILE, dtype=jnp.float32) % 1920
py = (jnp.arange(TILE, dtype=jnp.float32) // 1920) + 400.0
params = sharding.get_params(scene)
scene_base = sharding.apply_params(scene, jax.lax.stop_gradient(params))
tgt = jnp.zeros((TILE, 3), jnp.float32)
msk = jnp.ones(TILE, jnp.float32)


def run(p, k):
    def tl(p):
        full = {**jax.tree_util.tree_map(jax.lax.stop_gradient, params), **p}
        s = sharding.apply_params(scene_base, full, refresh=False)
        rands = jax.random.uniform(k, (TILE, 5))
        o, d, tm = cam_mod.eye_rays(cam, 1920, 1080, px, py, 0., 1., 0., 1.,
                                    rands)
        L = integrator.radiance(s, st, o, d, tm, k)
        return jnp.sum(msk[:, None] * (L - tgt) ** 2)
    return jax.value_and_grad(tl)(p)


import os
if os.environ.get('PROBE_ALL'):
    VARIANTS = [('all leaves', list(params)),
                ('vertices only', ['vertices']),
                ('tex_data only', ['tex_data']),
                ('materials only', ['kd', 'spec_exp'])]
else:
    VARIANTS = [('all leaves', list(params)),
                ('vertices only', ['vertices'])]

fns = {}
for name, keys in VARIANTS:
    p = {k: v for k, v in params.items() if k in keys}
    f = jax.jit(run)
    t0 = time.time()
    l, g = f(p, key)
    float(l)
    print(f'compile {name:20s} {time.time()-t0:6.1f} s', flush=True)
    fns[name] = (f, p)

# warm every executable, then time interleaved; report per-rep + min
times = {n: [] for n, _ in VARIANTS}
for rep in range(6):
    for name, _ in VARIANTS:
        f, p = fns[name]
        t0 = time.time()
        l, g = f(p, jax.random.fold_in(key, rep))
        float(l)
        float(jnp.sum(jax.tree_util.tree_leaves(g)[0]))
        times[name].append(time.time() - t0)
for name, _ in VARIANTS:
    ts = sorted(times[name])[1:-1]  # drop warmup-ish extremes
    allt = ' '.join(f'{t*1e3:.0f}' for t in times[name])
    print(f'{name:20s} min={min(times[name])*1e3:7.1f} ms  '
          f'mid-mean={sum(ts)/len(ts)*1e3:7.1f}  reps=[{allt}]', flush=True)

