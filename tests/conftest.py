"""Test bootstrap: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; all sharding tests run against
``--xla_force_host_platform_device_count=8`` per the project's multi-chip
testing strategy. Must run before jax is imported anywhere.
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
# keep test config away from the user's real one
os.environ.setdefault('ZUDS_CONFIG', '/tmp/zuds-tpu-test-config.yaml')

import numpy as np
import pytest


@pytest.fixture(scope='session')
def rng():
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
