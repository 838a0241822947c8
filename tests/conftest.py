"""Test env: force CPU with 8 virtual devices (multi-chip sharding sim).

Must run before jax initializes a backend (SURVEY.md §4: multi-host logic is
tested via xla_force_host_platform_device_count on CPU).

The build/bench environment tunnels to a real TPU via the `axon` PJRT plugin,
whose sitecustomize hook calls jax.config.update('jax_platforms', 'axon,cpu')
at interpreter start — overriding JAX_PLATFORMS from the environment. Tests
must run on the local CPU (fast, deterministic float semantics), so we
override the config back after import; env vars alone are not enough.
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags +
                               ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)

assert jax.default_backend() == 'cpu', (
    f'tests must run on CPU, got {jax.default_backend()}')
assert jax.device_count() >= 8, 'expected 8 virtual CPU devices'

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope='module')
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules: ~80 tests of
    accumulated XLA programs push this 2-core box into memory pressure
    that segfaults the in-process CPU collectives of the (alphabetically
    last) 8-virtual-device sharding tests."""
    yield
    jax.clear_caches()
