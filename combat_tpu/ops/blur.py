"""Gaussian blur as a separable depthwise convolution (NHWC).

TPU-native replacement for ``torchvision.transforms.GaussianBlur`` as used by
the trigger-injection path (reference ``train_generator.py:165,194,226`` and
``eval:353,373``).  The reference samples one ``sigma ~ U(lo, hi)`` per call;
here the sample comes from an explicit PRNG key so the blur lives *inside*
the jitted train step (the kernel weights are a traced function of sigma —
XLA folds the tiny 1-D kernel construction into the fused step).

Padding is reflect, matching torchvision's ``F.pad(..., mode='reflect')``
before its separable conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def gaussian_kernel_1d(kernel_size: int, sigma: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized 1-D Gaussian taps; matches torchvision's kernel formula."""
    half = (kernel_size - 1) * 0.5
    t = jnp.linspace(-half, half, kernel_size, dtype=dtype)
    pdf = jnp.exp(-0.5 * jnp.square(t / sigma.astype(dtype)))
    return pdf / jnp.sum(pdf)


def gaussian_blur(x: jnp.ndarray, sigma: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Blur an NHWC batch with a (possibly traced) scalar sigma."""
    n, h, w, c = x.shape
    kern = gaussian_kernel_1d(kernel_size, sigma, x.dtype)
    p = kernel_size // 2
    x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    dn = lax.conv_dimension_numbers(x.shape, (kernel_size, 1, 1, c), ("NHWC", "HWIO", "NHWC"))
    kh = jnp.broadcast_to(kern[:, None, None, None], (kernel_size, 1, 1, c)).astype(x.dtype)
    x = lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c)
    dn = lax.conv_dimension_numbers(x.shape, (1, kernel_size, 1, c), ("NHWC", "HWIO", "NHWC"))
    kw = jnp.broadcast_to(kern[None, :, None, None], (1, kernel_size, 1, c)).astype(x.dtype)
    x = lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c)
    return x


def random_gaussian_blur(key: jax.Array, x: jnp.ndarray, kernel_size: int, sigma_range) -> jnp.ndarray:
    """One sigma draw per call, like each ``gauss_smooth(...)`` invocation in
    the reference train loops (``train_generator.py:194,226``)."""
    lo, hi = sigma_range
    sigma = jax.random.uniform(key, (), minval=lo, maxval=hi)
    return gaussian_blur(x, sigma, kernel_size)
