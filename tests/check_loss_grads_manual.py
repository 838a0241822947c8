"""Subprocess body for test_loss_and_grads_matches_manual.

Run in a FRESH interpreter: the whole-image shard_map gradient on 8
virtual CPU replicas reproducibly segfaults XLA's in-process collectives
when executed late in the full pytest session (accumulated executables on
the 2-core box), while passing in isolation. Exit code 0 = all
assertions passed.
"""
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from raytracer_tpu.parallel import sharding  # noqa: E402
from raytracer_tpu.scenes import registry  # noqa: E402
from tests.test_sharding import _manual_sharded_render  # noqa: E402

scene, cam, settings = registry.make('cornell_pt', size=16, bvh=True,
                                     num_rect_samples=1, max_bounces=2)
key = jax.random.PRNGKey(3)
mesh = sharding.make_mesh(8)
params = sharding.get_params(scene)
target = jnp.zeros((16, 16, 3), jnp.float32)

loss, grads = sharding.loss_and_grads(params, scene, cam, settings,
                                      target, key, mesh, spp=1)


def manual_loss(p, sc):
    s = sharding.apply_params(sc, p)
    img = _manual_sharded_render(s, cam, settings, key, 8, 1)
    return jnp.mean((img - target) ** 2)


ref_loss, ref_grads = jax.jit(jax.value_and_grad(manual_loss))(params, scene)
np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
for k in grads:
    np.testing.assert_allclose(
        np.asarray(grads[k]), np.asarray(ref_grads[k]),
        rtol=2e-4, atol=1e-7, err_msg=f'grad mismatch for {k}')
assert np.abs(np.asarray(grads['kd'])).max() > 0
assert np.abs(np.asarray(grads['rect_power'])).max() > 0
print('ok')
