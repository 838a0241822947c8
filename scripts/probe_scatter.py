"""Isolate the texel-pool scatter-add cost on TPU.

The tile backward scatters ~32k rays x 80 texel cotangents x 10 bounces
into the texture pool. Times: raw XLA scatter-add at that size, the
sort+segment-sum alternative, and the gather forward for reference.
"""
import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp

from raytracer_tpu.scenes import registry

scene, cam, st = registry.make('sponza_proxy', width=64, height=64,
                               bvh=True, hd=True)
print(f'sponza_hd texel pool: {scene.textures.data.shape[0]} floats '
      f'(EMPTY: the bench scene is textureless — the round-5 finding)',
      flush=True)
POOL = 32 * 1024 * 1024  # synthetic 128 MB pool for the scatter timings

R = 32 * 1024
K = 80  # per-ray texel cotangents per bounce
N = R * K
key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (N,), 0, POOL, dtype=jnp.int32)
# clustered variant: rays hit few textures; indices span ~1% of the pool
idx_loc = jax.random.randint(key, (N,), 0, POOL // 100, dtype=jnp.int32)
vals = jax.random.uniform(jax.random.fold_in(key, 1), (N,))
pool = jnp.zeros(POOL, jnp.float32)


def timed(name, f, *a):
    f(*a)
    t0 = time.time()
    reps = 3
    for r in range(reps):
        out = f(*a)
        float(jnp.sum(out) if out.ndim else out)
    dt = (time.time() - t0) / reps
    print(f'{name:38s} {dt*1e3:8.2f} ms', flush=True)
    return dt


@jax.jit
def scatter_add(idx, vals):
    return pool.at[idx].add(vals)


@jax.jit
def scatter_add10(idx, vals):
    acc = pool
    for b in range(10):
        acc = acc.at[idx].add(vals * (b + 1.0))
    return acc


@jax.jit
def sort_segsum(idx, vals):
    order = jnp.argsort(idx)
    si = idx[order]
    sv = vals[order]
    return pool.at[si].add(sv, indices_are_sorted=True)


@jax.jit
def gather(idx):
    return jnp.sum(jnp.take(pool + 1.0, idx))


timed('gather 2.6M (fwd reference)', gather, idx)
timed('scatter-add 2.6M uniform', scatter_add, idx, vals)
timed('scatter-add 2.6M clustered', scatter_add, idx_loc, vals)
timed('10x scatter-add (one tile bwd)', scatter_add10, idx, vals)
timed('sort+sorted-scatter 2.6M', sort_segsum, idx, vals)
