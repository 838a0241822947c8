"""Break ONE 32k-ray tile of the headline bench into components.

Times (amortized, fetch-based, device-resident scene):
  - full radiance (10 bounces, NEE)       <- the fwd unit of bench.py
  - trace-only: 10 nearest + 10 any-hit   <- lower bound if shading were free
  - fwd+bwd of the tile loss              <- the bench's scan body
All on sponza_hd with the tile's actual camera rays.
"""
import sys
import time

sys.path.insert(0, '.')  # run from the repo root

import jax
import jax.numpy as jnp

from raytracer_tpu.scenes import registry
from raytracer_tpu.render import integrator, camera as cam_mod
from raytracer_tpu.parallel import sharding

TILE = 32 * 1024
REPS = 4

scene, cam, st = registry.make('sponza_proxy', width=1920, height=1080,
                               bvh=True, hd=True, path_trace=True,
                               max_bounces=10, ray_tile=TILE)
key = jax.random.PRNGKey(0)
px = jnp.arange(TILE, dtype=jnp.float32) % 1920
py = (jnp.arange(TILE, dtype=jnp.float32) // 1920) + 400.0


def timed(name, fn, *args):
    out = fn(*args)                     # compile
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.time()
    s = 0.0
    for r in range(REPS):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        s += float(jnp.sum(leaves[0]))  # fetch
    dt = (time.time() - t0) / REPS
    print(f'{name:34s} {dt*1e3:8.1f} ms   ({s:.3g})', flush=True)
    return dt


def gen_rays(k):
    rands = jax.random.uniform(k, (TILE, 5))
    return cam_mod.eye_rays(cam, 1920, 1080, px, py, 0.0, 1.0, 0.0, 1.0,
                            rands)


@jax.jit
def full_radiance(k):
    o, d, tm = gen_rays(k)
    return integrator.radiance(scene, st, o, d, tm, k)


@jax.jit
def trace_only(k):
    o, d, tm = gen_rays(k)
    tracer = integrator.trace_fn(scene, st)

    def body(carry, i):
        o_, d_, acc = carry
        h = tracer(o_, d_, tm, 1e-3, jnp.full_like(tm, 1e8), False)
        hs = tracer(o_, d_, tm, 1e-3, jnp.full_like(tm, 1e8), True)
        kk = jax.random.fold_in(k, i)
        nd = jax.random.normal(kk, d_.shape)
        nd = nd / jnp.linalg.norm(nd, axis=-1, keepdims=True)
        no = o_ + h.t[:, None] * d_ * 0.5
        return (no, nd, acc + jnp.sum(h.t) + jnp.sum(hs.t)), None

    (_, _, acc), _ = jax.lax.scan(body, (o, d, 0.0),
                                  jnp.arange(10, dtype=jnp.int32))
    return acc


params = sharding.get_params(scene)
tgt = jnp.zeros((TILE, 3), jnp.float32)
msk = jnp.ones(TILE, jnp.float32)


@jax.jit
def tile_fwd_bwd(p, k):
    def tl(p):
        s = sharding.apply_params(scene, p)
        o, d, tm = gen_rays(k)
        L = integrator.radiance(s, st, o, d, tm, k)
        return jnp.sum(msk[:, None] * (L - tgt) ** 2)
    return jax.value_and_grad(tl)(p)


t_full = timed('full radiance 10b', full_radiance, key)
t_tr = timed('trace-only 10x(nearest+anyhit)', trace_only, key)
t_fb = timed('tile fwd+bwd', tile_fwd_bwd, params, key)
print(f'shading+NEE overhead: {t_full-t_tr:.3f}s of {t_full:.3f}s; '
      f'bwd adds {t_fb-t_full:.3f}s ({(t_fb/t_full):.2f}x fwd)')

# interleaved re-measure (tunnel drift check)
for trial in range(3):
    for name, fn, a in (('radiance', full_radiance, (key,)),
                        ('trace', trace_only, (key,)),
                        ('fwd+bwd', tile_fwd_bwd, (params, key))):
        t0 = time.time()
        out = fn(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        print(f'  trial{trial} {name:10s} {(time.time()-t0)*1e3:7.1f} ms',
              flush=True)
