"""Terminal progress-line context manager (reference: zuds/status.py:5-15)."""
import sys
import time
from contextlib import contextmanager

__all__ = ['status']


@contextmanager
def status(message):
    """Print ``[·] message`` then rewrite as ``[✓]``/``[✗]`` with elapsed time."""
    print(f'[·] {message}', end='')
    sys.stdout.flush()
    t0 = time.time()
    try:
        yield
    except Exception:
        print(f'\r[✗] {message}')
        raise
    else:
        elapsed = time.time() - t0
        print(f'\r[✓] {message} ({elapsed:.1f}s)')
    finally:
        sys.stdout.flush()
