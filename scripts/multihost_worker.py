"""Per-process worker for the multi-host CPU test (tests/test_multihost.py)
and a template for real multi-host launches.

Env: RT_COORDINATOR, RT_NUM_PROCESSES, RT_PROCESS_ID (+ RT_CPU_DEVICES for
CPU simulation, RT_OUT for the process-0 output file). Renders a small
scene data-parallel over the GLOBAL mesh and runs one scanned fwd+bwd;
process 0 writes the gathered image, loss and a gradient probe.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytracer_tpu.parallel import distributed

assert distributed.init_from_env(), 'RT_COORDINATOR not set'

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.scenes import registry
from raytracer_tpu.parallel import sharding

pid, nproc = distributed.process_info()
print(f'proc {pid}/{nproc} devices={jax.device_count()} '
      f'local={jax.local_device_count()}', flush=True)

scene, cam, st = registry.make('triangle_sphere', size=8, bvh=False)
mesh = distributed.global_mesh()
key = jax.random.PRNGKey(7)

img = sharding.render_sharded(scene, cam, st, key, mesh, spp=1)
out = distributed.gather_image(img)

params = sharding.get_params(scene)
target = jnp.zeros((8, 8, 3), jnp.float32)
loss, grads = sharding.loss_and_grads_scanned(
    params, scene, cam, st, target, key, spp=1, tile=16, mesh=mesh)
loss = float(loss)
kd_grad = np.asarray(grads['kd'])

if pid == 0:
    np.savez(os.environ['RT_OUT'], img=out, loss=loss, kd_grad=kd_grad)
print(f'proc {pid} done loss={loss:.6f}', flush=True)
