"""Where does the headline bench's wall time go? (fetch-timed, 1080p)

Times forward-only render vs fwd+bwd at 10 and 3 bounces, plus a
trace-only lower bound (nearest + any-hit per bounce on live-decaying
wavefronts is approximated by full-wavefront calls).
"""
import os
import time

import jax
import jax.numpy as jnp

from raytracer_tpu.scenes import registry
from raytracer_tpu.render import renderer
from raytracer_tpu.parallel import sharding

W, H = 1920, 1080
TILE = 32 * 1024

for bounces in (10, 3):
    scene, cam, st = registry.make('sponza_proxy', width=W, height=H,
                                   bvh=True, hd=True, path_trace=True,
                                   max_bounces=bounces, ray_tile=TILE)
    key = jax.random.PRNGKey(0)
    params = sharding.get_params(scene)
    target = jnp.zeros((H, W, 3), jnp.float32)

    # forward only
    t0 = time.time()
    img = renderer.render(scene, cam, st, key, spp=1)
    float(jnp.sum(img))
    comp = time.time() - t0
    t0 = time.time()
    img = renderer.render(scene, cam, st, jax.random.fold_in(key, 7), spp=1)
    float(jnp.sum(img))
    fwd = time.time() - t0
    print(f'bounces={bounces} fwd: {fwd:.1f}s (compile {comp:.0f}s)',
          flush=True)

    # fwd+bwd
    t0 = time.time()
    loss, grads = sharding.loss_and_grads_scanned(
        params, scene, cam, st, target, key, spp=1, tile=TILE)
    float(loss); float(jnp.sum(grads['kd']))
    comp = time.time() - t0
    t0 = time.time()
    loss, grads = sharding.loss_and_grads_scanned(
        params, scene, cam, st, target, jax.random.fold_in(key, 9),
        spp=1, tile=TILE)
    float(loss); float(jnp.sum(grads['kd']))
    fb = time.time() - t0
    print(f'bounces={bounces} fwd+bwd: {fb:.1f}s (compile {comp:.0f}s)',
          flush=True)
