"""Runtime environment checks (reference: zuds/env.py).

The reference verifies external binary versions (sex/swarp/hotpants/scamp/
psql) at import; this framework has no subprocess dependencies, so the
check inventories the compute backend instead: JAX version, device platform,
device count, and the optional native extension.
"""
from __future__ import annotations

__all__ = ['check_dependencies', 'DEPENDENCIES']

DEPENDENCIES = ('jax', 'flax', 'optax', 'numpy', 'yaml')


def check_dependencies(deps=DEPENDENCIES, verbose=False):
    """Verify importability of the python stack; returns an info dict."""
    import importlib
    info = {}
    missing = []
    for name in deps:
        try:
            mod = importlib.import_module(name)
            info[name] = getattr(mod, '__version__', 'unknown')
        except ImportError:
            missing.append(name)
    if missing:
        raise ImportError(f'missing required dependencies: {missing}')
    if verbose:
        import jax
        info['backend'] = jax.default_backend()
        info['devices'] = [str(d) for d in jax.devices()]
        print(info)
    return info
