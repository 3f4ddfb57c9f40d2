"""Test bootstrap: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; all sharding tests run against
``--xla_force_host_platform_device_count=8`` per the project's multi-chip
testing strategy. Must run before jax is imported anywhere.
"""
import os

# The environment pins JAX_PLATFORMS=axon (TPU tunnel) globally and a
# sitecustomize hook pre-imports jax, so an env-var setdefault is too late:
# override through jax.config before the first backend use.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# synchronous dispatch on the CPU backend: async dispatch intermittently
# segfaults when shard_map programs over the 8 virtual devices run late in
# the suite (observed in jax 0.9.0; cost is negligible at test scale)
try:
    jax.config.update('jax_cpu_enable_async_dispatch', False)
except AttributeError:
    pass
# keep test config away from the user's real one
os.environ.setdefault('ZUDS_CONFIG', '/tmp/zuds-tpu-test-config.yaml')
# NO persistent compile cache on the CPU backend: compiles route through
# the environment's remote compile helper, which targets a DIFFERENT cpu
# (avx512/amx) — deserialized executables warn about SIGILL risk and were
# observed to return a wrong element (caught by test_parity's oracle).
jax.config.update('jax_compilation_cache_dir', None)

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # function-scoped: every test gets the same fresh stream regardless of
    # execution order (a shared session rng made tests order-dependent)
    return np.random.default_rng(8675309)


@pytest.fixture()
def tmp_config(tmp_path, monkeypatch):
    """Point the secrets manager at a fresh config in tmp_path."""
    import zuds_tpu.secrets as secrets
    cfg = tmp_path / 'config.yaml'
    monkeypatch.setenv('ZUDS_CONFIG', str(cfg))
    secrets._manager.cache = None
    yield cfg
    secrets._manager.cache = None
