"""Orthonormal 2-D DCT as MXU-friendly matmuls.

The reference implements DCT-II/III through an FFT even/odd permutation trick
(reference ``utils/dct.py:13-111``, exercised by ``low_freq`` at
``train_generator.py:47-55`` and the frequency-detector featurization at
``train_generator.py:245``).  On TPU the natural formulation for the small,
*static* image sizes used here (28–224 px) is the dense separable transform

    Y = D @ X @ D^T          (DCT-II, ``norm='ortho'``)
    X = D^T @ Y @ D          (DCT-III == inverse)

where ``D`` is the orthonormal DCT-II matrix.  Two tiny matmuls per image map
straight onto the MXU and fuse with neighbouring element-wise work under XLA;
they are exact (no permutation/rounding tricks) and match
``scipy.fftpack.dct(x, norm='ortho')`` to float tolerance (golden tests in
``tests/test_dct.py``).

All functions take NHWC arrays and transform the H and W axes, which is the
layout-transposed equivalent of the reference's NCHW last-two-dims transform.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _dct_matrix_np(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix: D[k, i] = s_k * cos(pi*(2i+1)k / (2n))."""
    k = np.arange(n)[:, None].astype(np.float64)
    i = np.arange(n)[None, :].astype(np.float64)
    mat = np.cos(np.pi * (2.0 * i + 1.0) * k / (2.0 * n)) * np.sqrt(2.0 / n)
    mat[0] *= np.sqrt(0.5)
    return mat


def dct_matrix(n: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(_dct_matrix_np(n), dtype=dtype)


def dct_2d(x: jnp.ndarray) -> jnp.ndarray:
    """2-D orthonormal DCT-II over the H, W axes of an NHWC (or HWC/HW) array.

    Parity: reference ``utils/dct.py:85-96`` (``dct_2d`` with norm='ortho')
    modulo the NCHW→NHWC layout change.
    """
    if x.ndim >= 3:
        h, w = x.shape[-3], x.shape[-2]
        dh = dct_matrix(h, x.dtype)
        dw = dct_matrix(w, x.dtype)
        return jnp.einsum("hH,...HWc,wW->...hwc", dh, x, dw)
    dh = dct_matrix(x.shape[-2], x.dtype)
    dw = dct_matrix(x.shape[-1], x.dtype)
    return jnp.einsum("hH,HW,wW->hw", dh, x, dw)


def idct_2d(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`dct_2d` (orthonormal DCT-III).

    Parity: reference ``utils/dct.py:99-111``.
    """
    if y.ndim >= 3:
        h, w = y.shape[-3], y.shape[-2]
        dh = dct_matrix(h, y.dtype)
        dw = dct_matrix(w, y.dtype)
        return jnp.einsum("Hh,...HWc,Ww->...hwc", dh, y, dw)
    dh = dct_matrix(y.shape[-2], y.dtype)
    dw = dct_matrix(y.shape[-1], y.dtype)
    return jnp.einsum("Hh,HW,Ww->hw", dh, y, dw)


def low_freq(x: jnp.ndarray, image_size: int, ratio: float, use_pallas: bool = False) -> jnp.ndarray:
    """DCT low-pass of a [-1, 1] image batch (NHWC).

    Keeps the top-left ``int(image_size * ratio)`` square of DCT-II
    coefficients of the [0, 255]-scaled image and maps back to [-1, 1].
    Parity: reference ``train_generator.py:47-55`` (``low_freq``) — the same
    helper is redefined in every reference entry script.

    ``use_pallas`` routes square batches with a DC-passing cutoff through the
    fused VMEM kernel (ops/pallas_kernels.py; TPU only) — 1.45x faster
    standalone, measured-before-wired per SURVEY.md §7.1.6.
    """
    cutoff = int(image_size * ratio)
    if use_pallas and x.ndim == 4 and x.shape[1] == x.shape[2] == image_size and cutoff >= 1:
        from .pallas_kernels import low_freq_pallas

        return low_freq_pallas(x, image_size, ratio)
    y = dct_2d((x + 1.0) * 0.5 * 255.0)
    mask_h = (jnp.arange(y.shape[-3]) < cutoff)[:, None, None]
    mask_w = (jnp.arange(y.shape[-2]) < cutoff)[None, :, None]
    y = y * (mask_h & mask_w).astype(y.dtype)
    return idct_2d(y) / 255.0 * 2.0 - 1.0


def detector_features(x_bd: jnp.ndarray) -> jnp.ndarray:
    """Frequency-detector featurization: DCT of the uint8-quantized image.

    Parity: reference ``train_generator.py:245`` —
    ``dct_2d(((inputs_bd + 1) / 2 * 255).byte())``.  The ``.byte()`` cast
    truncates toward zero; it is a non-differentiable quantization used only
    on the metric path (never in G's loss), so we keep it off the gradient
    path exactly as the reference does.
    """
    q = jnp.trunc((x_bd + 1.0) * 0.5 * 255.0).astype(jnp.uint8)
    return dct_2d(q.astype(x_bd.dtype))
