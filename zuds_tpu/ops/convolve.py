"""Convolution helpers for the op layer."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['conv2_same', 'fft_convolve_same', 'DEFAULT_FILTER',
           'gaussian_kernel']

# SExtractor's default.conv pyramid filter (zuds/astromatic/default.conv),
# normalized to unit sum.
DEFAULT_FILTER = np.array([[1.0, 2.0, 1.0],
                           [2.0, 4.0, 2.0],
                           [1.0, 2.0, 1.0]]) / 16.0


def conv2_same(img, kernel):
    """Direct 2-D 'same' convolution (small kernels; XLA conv on MXU/VPU)."""
    img = img[None, None, :, :]
    k = jnp.asarray(kernel, dtype=img.dtype)[None, None, :, :]
    out = jax.lax.conv_general_dilated(
        img, k, window_strides=(1, 1),
        padding=[(k.shape[2] // 2, (k.shape[2] - 1) // 2),
                 (k.shape[3] // 2, (k.shape[3] - 1) // 2)],
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
        precision=jax.lax.Precision.HIGH)
    return out[0, 0]


def fft_convolve_same(img, kernel):
    """FFT-based 'same' convolution for larger kernels (PSF matching)."""
    H, W = img.shape
    kh, kw = kernel.shape
    fh, fw = H + kh - 1, W + kw - 1
    F = jnp.fft.rfft2(img, (fh, fw))
    G = jnp.fft.rfft2(jnp.asarray(kernel, dtype=img.dtype), (fh, fw))
    full = jnp.fft.irfft2(F * G, (fh, fw))
    y0, x0 = kh // 2, kw // 2
    return full[y0:y0 + H, x0:x0 + W]


def gaussian_kernel(sigma, size):
    """Normalized 2-D Gaussian kernel of odd ``size``."""
    r = size // 2
    y, x = jnp.mgrid[-r:r + 1, -r:r + 1]
    g = jnp.exp(-(x * x + y * y) / (2.0 * sigma * sigma))
    return g / jnp.sum(g)
