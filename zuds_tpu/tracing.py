"""Structured tracing & profiling (SURVEY §5: the reference has only
paired ``time.time()`` prints — ``zuds/utils.py:68-70``,
``scripts/dosub.py:50-54``; the rebuild was asked to add a real profiler
layer).

Three levels:

* ``timed(name)`` — context manager / decorator recording wall-clock
  spans into a process-local registry (drop-in replacement for the
  reference's ``print_time`` pairs, but queryable and silent by default).
* ``device_profile(logdir)`` — wraps ``jax.profiler.trace``: captures an
  XLA device trace viewable in TensorBoard/Perfetto.
* ``report()`` — aggregated table of recorded spans (count / total /
  mean / max), printable at end of a worker loop the way the reference
  prints its per-stage times.

All pipeline drivers (scripts/dosub.py etc.) route their stage timing
through ``timed`` so a single env var (``ZUDS_TRACE=1``) turns on live
span printing without code changes.
"""
from __future__ import annotations

import contextlib
import functools
import os
import threading
import time

__all__ = ['timed', 'device_profile', 'report', 'spans', 'reset',
           'print_time']

_lock = threading.Lock()
_spans = {}          # name -> [count, total, max]
_live = os.environ.get('ZUDS_TRACE', '') not in ('', '0')


def reset():
    with _lock:
        _spans.clear()


def spans():
    """Snapshot {name: (count, total_s, mean_s, max_s)}."""
    with _lock:
        return {k: (c, t, t / c if c else 0.0, m)
                for k, (c, t, m) in _spans.items()}


def _record(name, dt):
    with _lock:
        c, t, m = _spans.get(name, (0, 0.0, 0.0))
        _spans[name] = (c + 1, t + dt, max(m, dt))
    if _live:
        print(f'[trace] {name}: {dt:.3f}s', flush=True)


@contextlib.contextmanager
def timed(name):
    """Record a wall-clock span; usable as context manager or decorator."""
    t0 = time.time()
    try:
        yield
    finally:
        _record(name, time.time() - t0)


def traced(name=None):
    """Decorator form of :func:`timed`."""
    def wrap(fn):
        label = name or fn.__qualname__

        @functools.wraps(fn)
        def inner(*a, **kw):
            with timed(label):
                return fn(*a, **kw)
        return inner
    return wrap


@contextlib.contextmanager
def device_profile(logdir='/tmp/zuds-tpu-trace'):
    """Capture an XLA device trace (jax.profiler) for the enclosed block.

    View with TensorBoard's profile plugin or Perfetto. No-ops gracefully
    if the profiler backend is unavailable."""
    import jax
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        pass
    try:
        yield logdir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def report(out=None):
    """Formatted span table (the reference's end-of-run print analogue)."""
    import sys
    out = out or sys.stdout
    snap = spans()
    if not snap:
        return
    width = max(len(k) for k in snap)
    print(f'{"span".ljust(width)}  count   total     mean      max',
          file=out)
    for name, (c, t, mean, m) in sorted(snap.items(),
                                        key=lambda kv: -kv[1][1]):
        print(f'{name.ljust(width)}  {c:5d}  {t:7.2f}s  {mean:7.3f}s '
              f'{m:8.3f}s', file=out)


def print_time(start, stop, obj, step):
    """Reference-compatible helper (zuds/utils.py:68-70) that also feeds
    the span registry."""
    dt = stop - start
    _record(str(step), dt)
    print(f'took {dt:.2f} sec to {step} for {obj}', flush=True)
