#!/usr/bin/env python
"""Host->device link microbench over the axon tunnel.

The files->catalog driver ships ~57 MB/pair (sci f4 + sci mask u16) after
the r4 ref cache; this measures what the link itself can do, separating
"the driver is slow" from "the wire is slow". Distinct buffers defeat the
tunnel's identical-request cache (CLAUDE.md); one sync at the end.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 38
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    shape = (mb * (1 << 20) // 4,)
    rng = np.random.default_rng(0)
    bufs = [rng.normal(size=shape).astype('f4') for _ in range(n)]
    # warm the dispatch path
    jnp.asarray(bufs[0][:1024]).block_until_ready()

    # upload: device_put each distinct buffer, sync once at the end
    t0 = time.time()
    devs = [jax.device_put(b) for b in bufs]
    for d in devs:
        d.block_until_ready()
    up = time.time() - t0
    print(f'upload {n}x{mb}MB: {up:.2f}s = {n * mb / up:.1f} MB/s')

    # download: np.asarray of distinct device arrays
    outs = [d + np.float32(i) for i, d in enumerate(devs)]
    for o in outs:
        o.block_until_ready()
    t0 = time.time()
    for o in outs:
        np.asarray(o)
    down = time.time() - t0
    print(f'download {n}x{mb}MB: {down:.2f}s = {n * mb / down:.1f} MB/s')

    # upload in u16 (the mask path) — half the bytes, same element count
    bufs16 = [(b.view(np.uint32) & 0xffff).astype(np.uint16) for b in bufs]
    t0 = time.time()
    devs16 = [jax.device_put(b) for b in bufs16]
    for d in devs16:
        d.block_until_ready()
    up16 = time.time() - t0
    print(f'upload u16 {n}x{mb // 2}MB: {up16:.2f}s = '
          f'{n * mb / 2 / up16:.1f} MB/s')


if __name__ == '__main__':
    main()
