"""Minimized repro for the RenderSettings.remat TPU kernel fault.

Symptom (jax 0.8.x, v5e via axon): wrapping the bounce-scan body in
jax.checkpoint (any prevent_cse setting) makes the BACKWARD executable of
the tile render die with a generic "TPU device error — often indicates a
kernel fault" for specific input values; the identical program without
remat runs fine, and the remat program runs fine on CPU. The default
stays remat=False (core/types.py RenderSettings.remat) — streamed/scanned
tiles bound residual memory instead, at the cost of one extra forward
recompute per tile in the backward pass.

Usage:
    python -m scripts.repro_remat_fault            # fails (remat on)
    RT_REMAT=0 python -m scripts.repro_remat_fault # passes (remat off)

Disposition (2026-08-21, round 5): NOT reproducible under the current
jax/libtpu build — both settings produce identical losses here, and
remat=True also completes the full 1080p/10-bounce bench config
(53.6 s steady vs 32.5 s with remat=False: the checkpointed backward
re-runs the bounce scan, while the scanned-tile pipeline already bounds
residual memory at better throughput). The default therefore STAYS
remat=False on performance grounds; the flag is live and safe again if a
future memory squeeze needs it.
"""
import os

import jax
import jax.numpy as jnp

from raytracer_tpu.scenes import registry
from raytracer_tpu.parallel import sharding

remat = os.environ.get('RT_REMAT', '1') == '1'
scene, cam, settings = registry.make(
    'sponza_proxy', width=128, height=64, bvh=True, path_trace=True,
    max_bounces=3, ray_tile=8192)
settings = settings.replace(remat=remat)
params = sharding.get_params(scene)
target = jnp.zeros((64, 128, 3), jnp.float32)
key = jax.random.fold_in(jax.random.PRNGKey(0), 0)

loss, grads = sharding.loss_and_grads_scanned(
    params, scene, cam, settings, target, key, spp=1, tile=8192)
print('remat =', remat, 'loss =', float(loss),
      'grad-norm =', float(jnp.sum(grads['kd'] ** 2)))
print('OK — no kernel fault with this jax/libtpu build')
