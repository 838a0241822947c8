"""Fetch-timed cost breakdown of the bench workload on TPU."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.scenes import registry
from raytracer_tpu.parallel import sharding
from raytracer_tpu.render import renderer

HD = os.environ.get('PB_HD', '1') == '1'
W, H = 1920, 1080
TILE = int(os.environ.get('PB_TILE', 32 * 1024))

key = jax.random.PRNGKey(0)
target = jnp.zeros((H, W, 3), jnp.float32)


def timed(fn, *args):
    fn(*args)  # compile + warm
    ts = []
    for i in range(2):
        t0 = time.time()
        fn(*args, seed=1000 + i)
        ts.append(time.time() - t0)
    return min(ts)


for bounces in (int(b) for b in
                os.environ.get('PB_BOUNCES', '1,2,3,5,10').split(',')):
    scene, cam, settings = registry.make(
        'sponza_proxy', width=W, height=H, bvh=True, hd=HD,
        path_trace=True, max_bounces=bounces, ray_tile=TILE)
    params = sharding.get_params(scene)

    def fwd(seed=0):
        img = renderer.render(scene, cam, settings,
                              jax.random.fold_in(key, seed), spp=1)
        return float(jnp.sum(img))

    def fwdbwd(seed=0):
        loss, grads = sharding.loss_and_grads_scanned(
            params, scene, cam, settings, target,
            jax.random.fold_in(key, seed), spp=1, tile=TILE)
        float(loss)
        return float(jnp.sum(grads['kd']))

    t_f = timed(fwd)
    t_fb = timed(fwdbwd)
    print(f'hd={HD} bounces={bounces}: fwd {t_f:.2f}s '
          f'({W*H/t_f/1e6:.3f} Mray/s) | fwd+bwd {t_fb:.2f}s '
          f'({W*H/t_fb/1e6:.3f} Mray/s)', flush=True)
