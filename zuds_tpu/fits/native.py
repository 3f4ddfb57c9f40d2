"""ctypes binding to the native FITS pixel-I/O + prefetch library.

The C++ library (``native/zuds_fits.cpp``) accelerates bulk pixel reads
(multi-threaded byteswap) and overlaps file I/O with device compute through
a worker-thread prefetch queue — the framework's data-loader runtime. The
pure-python codec remains the always-available fallback and the semantic
reference.

Build: ``make -C native`` (g++; no external deps). The .so lands next to
this file and is picked up automatically.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from .header import Header
from .io import HDU

__all__ = ['available', 'build', 'read_image_native', 'write_image_native',
           'Prefetcher']

_LIB_PATH = os.path.join(os.path.dirname(__file__), 'libzuds_fits.so')
_lib = None
_lock = threading.Lock()


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.zf_read_image.restype = ctypes.c_void_p
        lib.zf_read_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int)]
        lib.zf_copy_header.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.zf_copy_pixels.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.zf_free_image.argtypes = [ctypes.c_void_p]
        lib.zf_write_image.restype = ctypes.c_int
        lib.zf_write_image.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
        lib.zf_prefetcher_create.restype = ctypes.c_void_p
        lib.zf_prefetcher_create.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.zf_prefetcher_destroy.argtypes = [ctypes.c_void_p]
        lib.zf_prefetcher_submit.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                             ctypes.c_char_p]
        lib.zf_prefetcher_wait.restype = ctypes.c_void_p
        lib.zf_prefetcher_wait.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def available():
    return _load() is not None


def build(quiet=True):
    """Compile the native library in-tree (g++, no external deps)."""
    native_dir = os.path.join(os.path.dirname(__file__), '..', '..',
                              'native')
    native_dir = os.path.abspath(native_dir)
    if not os.path.isdir(native_dir):
        return False
    try:
        subprocess.run(['make', '-C', native_dir],
                       check=True,
                       capture_output=quiet)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _lib
    _lib = None
    return available()


_BITPIX_DTYPE = {8: np.uint8, 16: np.int16, 32: np.int32, 64: np.int64,
                 -32: np.float32, -64: np.float64}


def _unpack(lib, handle, hlen, dlen, bitpix, n1, n2, bscale, bzero):
    hbuf = ctypes.create_string_buffer(hlen.value)
    lib.zf_copy_header(handle, hbuf)
    dtype = _BITPIX_DTYPE[bitpix.value]
    arr = np.empty(dlen.value // np.dtype(dtype).itemsize, dtype=dtype)
    lib.zf_copy_pixels(handle, arr.ctypes.data_as(ctypes.c_void_p))
    lib.zf_free_image(handle)
    header = Header.from_bytes(hbuf.raw)
    arr = arr.reshape(n2.value, n1.value)
    # unsigned conventions (same rules as the python codec)
    if bscale.value == 1.0 and bzero.value == 32768 and bitpix.value == 16:
        # single-copy: uint16 wraparound add == the int32 detour exactly
        arr = arr.view(np.uint16) + np.uint16(32768)
    elif bscale.value == 1.0 and bzero.value == 2147483648 \
            and bitpix.value == 32:
        arr = (arr.astype(np.int64) + 2147483648).astype(np.uint32)
    elif bscale.value != 1.0 or bzero.value != 0.0:
        arr = arr * bscale.value + bzero.value
    return HDU(header, arr)


def read_image_native(path, nthreads=4):
    """Read a single-image FITS through the native library -> HDU."""
    lib = _load()
    if lib is None:
        raise RuntimeError('native FITS library not built; run '
                           'zuds_tpu.fits.native.build()')
    hlen = ctypes.c_int64()
    dlen = ctypes.c_int64()
    bitpix = ctypes.c_long()
    n1 = ctypes.c_long()
    n2 = ctypes.c_long()
    bscale = ctypes.c_double()
    bzero = ctypes.c_double()
    status = ctypes.c_int()
    handle = lib.zf_read_image(str(path).encode(), nthreads,
                               ctypes.byref(hlen), ctypes.byref(dlen),
                               ctypes.byref(bitpix), ctypes.byref(n1),
                               ctypes.byref(n2), ctypes.byref(bscale),
                               ctypes.byref(bzero), ctypes.byref(status))
    if not handle:
        raise IOError(f'native FITS read failed ({status.value}): {path}')
    return _unpack(lib, handle, hlen, dlen, bitpix, n1, n2, bscale, bzero)


def write_image_native(path, header, data, nthreads=4):
    """Write a single-image FITS through the native library."""
    from .io import _encode_image
    lib = _load()
    if lib is None:
        raise RuntimeError('native FITS library not built')
    hb, payload = _encode_image(header, np.asarray(data), primary=True)
    # payload from _encode_image is already big-endian bytes; the native
    # writer swaps, so hand it native-endian pixels instead
    arr = np.ascontiguousarray(np.asarray(data))
    if arr.dtype == np.uint16:
        arr = (arr.astype(np.int32) - 32768).astype(np.int16)
    elif arr.dtype == np.uint32:
        arr = (arr.astype(np.int64) - 2147483648).astype(np.int32)
    elif arr.dtype.name not in ('uint8', 'int16', 'int32', 'int64',
                                'float32', 'float64'):
        arr = arr.astype(np.float32)
    rc = lib.zf_write_image(str(path).encode(), hb, len(hb),
                            arr.ctypes.data_as(ctypes.c_void_p),
                            arr.nbytes, arr.dtype.itemsize, nthreads)
    if rc != 0:
        raise IOError(f'native FITS write failed ({rc}): {path}')


class Prefetcher:
    """Background FITS reader pool: submit paths, collect HDUs.

    Overlaps disk reads + byteswap with device compute — the loader side of
    the fused night pipeline.
    """

    def __init__(self, workers=4, swap_threads=2):
        lib = _load()
        if lib is None:
            raise RuntimeError('native FITS library not built')
        self._lib = lib
        self._handle = lib.zf_prefetcher_create(workers, swap_threads)
        self._next = 0

    def submit(self, path):
        ticket = self._next
        self._next += 1
        self._lib.zf_prefetcher_submit(self._handle, ticket,
                                       str(path).encode())
        return ticket

    def get(self, ticket):
        hlen = ctypes.c_int64()
        dlen = ctypes.c_int64()
        bitpix = ctypes.c_long()
        n1 = ctypes.c_long()
        n2 = ctypes.c_long()
        bscale = ctypes.c_double()
        bzero = ctypes.c_double()
        status = ctypes.c_int()
        handle = self._lib.zf_prefetcher_wait(
            self._handle, ticket, ctypes.byref(hlen), ctypes.byref(dlen),
            ctypes.byref(bitpix), ctypes.byref(n1), ctypes.byref(n2),
            ctypes.byref(bscale), ctypes.byref(bzero), ctypes.byref(status))
        if not handle:
            raise IOError(f'prefetch read failed ({status.value})')
        return _unpack(self._lib, handle, hlen, dlen, bitpix, n1, n2,
                       bscale, bzero)

    def close(self):
        if self._handle:
            self._lib.zf_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
