"""Pallas TPU kernels — the hand-written tier below XLA (SURVEY.md §7.1.6:
"Build pure-JAX first, then kernelize with benchmarks justifying each").

:func:`low_freq_pallas` fuses the whole trigger low-pass
(scale → DCT-II → low-frequency mask → DCT-III → rescale, reference
``train_generator.py:47-55``) into ONE kernel per image channel: the 32x32
plane stays in VMEM across all four matmuls and the masking, so the DCT
coefficients never round-trip through HBM.  Mosaic-friendly formulation:
everything is a plain 2-D ``dot`` — both D and D^T are kernel inputs, so no
in-kernel transposes are needed:

    coef = D @ y @ D^T ;  out = D^T @ (coef * mask) @ D

Measured on one v5e chip (bs=128, 32x32x3): standalone the kernel beats the
XLA formulation 502us vs 728us per call (1.45x — VMEM residency wins), but
wired into the fused alternated train step it LOSES, 7517 vs 8034 img/s —
the opaque kernel boundary blocks XLA from fusing the low-pass with its
element-wise neighbors.  Hence ``Config.pallas_lowfreq`` defaults to False
(SURVEY.md §7.1.6: kernelize only with benchmarks justifying it); the kernel
stays as the validated, differentiable template for deeper fusions (e.g.
folding the trigger clamp+blur into the same VMEM residency).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dct import _dct_matrix_np


def _low_freq_kernel(x_ref, d_ref, dt_ref, mask_ref, o_ref):
    # x: (1, H, W) one image channel; d/dt: (H, H); mask: (H, W)
    y = (x_ref[0] + 1.0) * (0.5 * 255.0)
    d = d_ref[:]
    dt = dt_ref[:]
    coef = jnp.dot(jnp.dot(d, y, preferred_element_type=jnp.float32), dt,
                   preferred_element_type=jnp.float32)
    coef = coef * mask_ref[:]
    z = jnp.dot(jnp.dot(dt, coef, preferred_element_type=jnp.float32), d,
                preferred_element_type=jnp.float32)
    o_ref[0] = z * (2.0 / 255.0) - 1.0


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def low_freq_pallas(x: jnp.ndarray, image_size: int, ratio: float) -> jnp.ndarray:
    """Fused DCT low-pass of a [-1,1] NHWC batch (square images).

    Differentiable: the op is an affine map whose linear part L (mask in the
    orthonormal DCT basis) is self-adjoint, and — because the DC coefficient
    always passes the low-pass mask (cutoff >= 1) — the 0..255 affine
    conjugation cancels exactly, so ``low_freq(x) == L(x)`` and the VJP is
    the same kernel applied to the cotangent."""
    return _low_freq_pallas_impl(x, image_size, ratio)


def _low_freq_fwd(x, image_size, ratio):
    return _low_freq_pallas_impl(x, image_size, ratio), None


def _low_freq_bwd(image_size, ratio, _, g):
    return (_low_freq_pallas_impl(g, image_size, ratio),)


low_freq_pallas.defvjp(_low_freq_fwd, _low_freq_bwd)


@functools.partial(jax.jit, static_argnames=("image_size", "ratio"))
def _low_freq_pallas_impl(x: jnp.ndarray, image_size: int, ratio: float) -> jnp.ndarray:
    n, h, w, c = x.shape
    assert h == w == image_size, "square images only"
    cutoff = int(image_size * ratio)
    d = jnp.asarray(_dct_matrix_np(h), jnp.float32)
    mask = ((jnp.arange(h) < cutoff)[:, None] & (jnp.arange(w) < cutoff)[None, :]).astype(jnp.float32)
    planes = x.astype(jnp.float32).transpose(0, 3, 1, 2).reshape(n * c, h, w)
    out = pl.pallas_call(
        _low_freq_kernel,
        out_shape=jax.ShapeDtypeStruct((n * c, h, w), jnp.float32),
        grid=(n * c,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(planes, d, d.T, mask)
    return out.reshape(n, c, h, w).transpose(0, 2, 3, 1).astype(x.dtype)
