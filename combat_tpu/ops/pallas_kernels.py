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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dct import _dct_matrix_np


def _interpret() -> bool:
    """COMBAT_PALLAS_INTERPRET=1 runs the kernels in Pallas interpreter mode
    (any backend) — used by the test suite to validate the kernel math and
    the custom VJPs on CPU; production TPU runs leave it unset (Mosaic)."""
    return os.environ.get("COMBAT_PALLAS_INTERPRET", "") == "1"


def _blur_matrix(kern: jnp.ndarray, h: int) -> jnp.ndarray:
    """(h, h) matrix form of a 1-D reflect-padded blur: rows of ``B @ x``
    are the taps of ``kern`` with torchvision's reflect boundary."""
    k = kern.shape[0]
    p = k // 2
    idx = jnp.arange(h)
    B = jnp.zeros((h, h), kern.dtype)
    for t in range(k):  # static tiny loop (k = kernel_size)
        src = idx + (t - p)
        src = jnp.abs(src)  # reflect at the low edge
        src = jnp.where(src > h - 1, 2 * (h - 1) - src, src)  # and the high edge
        B = B.at[idx, src].add(kern[t])
    return B


def _fused_trigger_fwd_kernel(x_ref, n_ref, d_ref, dt_ref, mask_ref, b_ref, bt_ref, o_ref, u_ref, *, noise_rate):
    # one image channel: low-pass(n) -> inject -> clamp -> separable blur,
    # all without leaving VMEM.  u (pre-clip injection) is saved for the VJP.
    y = (n_ref[0] + 1.0) * (0.5 * 255.0)
    d = d_ref[:]
    dt = dt_ref[:]
    coef = jnp.dot(jnp.dot(d, y, preferred_element_type=jnp.float32), dt,
                   preferred_element_type=jnp.float32) * mask_ref[:]
    low = jnp.dot(jnp.dot(dt, coef, preferred_element_type=jnp.float32), d,
                  preferred_element_type=jnp.float32) * (2.0 / 255.0) - 1.0
    u = x_ref[0] + low * noise_rate
    u_ref[0] = u
    c = jnp.clip(u, -1.0, 1.0)
    o_ref[0] = jnp.dot(jnp.dot(b_ref[:], c, preferred_element_type=jnp.float32), bt_ref[:],
                       preferred_element_type=jnp.float32)


def _fused_trigger_bwd_kernel(g_ref, u_ref, d_ref, dt_ref, mask_ref, b_ref, bt_ref, gx_ref, gn_ref, *, noise_rate):
    # adjoint of fwd: g_c = B^T g B; g_u = g_c * 1{-1<=u<=1}; g_x = g_u;
    # g_n = noise_rate * L(g_u) with L the (self-adjoint) masked-DCT map.
    g = g_ref[0]
    d = d_ref[:]
    dt = dt_ref[:]
    # blur fwd is c -> B c B^T, so the cotangent map is g -> B^T g B; the
    # refs already hold bt_ref = B^T and b_ref = B, so NO in-kernel
    # transposes (B is NOT symmetric at the reflect-padded boundary rows)
    gc = jnp.dot(jnp.dot(bt_ref[:], g, preferred_element_type=jnp.float32), b_ref[:],
                 preferred_element_type=jnp.float32)
    u = u_ref[0]
    gu = gc * ((u >= -1.0) & (u <= 1.0)).astype(jnp.float32)
    gx_ref[0] = gu
    coef = jnp.dot(jnp.dot(d, gu, preferred_element_type=jnp.float32), dt,
                   preferred_element_type=jnp.float32) * mask_ref[:]
    gn_ref[0] = jnp.dot(jnp.dot(dt, coef, preferred_element_type=jnp.float32), d,
                        preferred_element_type=jnp.float32) * noise_rate


def _trigger_operands(x, image_size, ratio):
    n, h, w, c = x.shape
    assert h == w == image_size, "square images only"
    cutoff = int(image_size * ratio)
    d = jnp.asarray(_dct_matrix_np(h), jnp.float32)
    mask = ((jnp.arange(h) < cutoff)[:, None] & (jnp.arange(w) < cutoff)[None, :]).astype(jnp.float32)
    return d, mask


def _plane_spec(h, w):
    return pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _mat_spec(h, w):
    return pl.BlockSpec((h, w), lambda i: (0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_trigger_pallas(x, noise, B, image_size: int, ratio: float, noise_rate: float):
    """The ENTIRE additive trigger chain as one Pallas TPU kernel:
    ``blur(clamp(x + low_freq(noise) * noise_rate, -1, 1))``
    (reference ``train_generator.py:189-194,223-226``), per image channel in
    VMEM — the deeper fusion proposed by the round-2 measurement notes above.
    ``B`` is the (H, H) matrix form of the per-batch random-sigma 1-D blur
    (see :func:`_blur_matrix`); the separable 2-D blur is ``B @ c @ B^T``.
    Differentiable in x and noise (custom VJP, one backward kernel); B gets
    a zero cotangent (sigma is drawn, not trained — same as the reference
    where blur parameters are not part of any loss)."""
    out, _ = _fused_trigger_impl(x, noise, B, image_size, ratio, noise_rate)
    return out


def _fused_trigger_impl(x, noise, B, image_size, ratio, noise_rate):
    n, h, w, c = x.shape
    d, mask = _trigger_operands(x, image_size, ratio)
    planes_x = x.astype(jnp.float32).transpose(0, 3, 1, 2).reshape(n * c, h, w)
    planes_n = noise.astype(jnp.float32).transpose(0, 3, 1, 2).reshape(n * c, h, w)
    Bf = B.astype(jnp.float32)
    out, u = pl.pallas_call(
        functools.partial(_fused_trigger_fwd_kernel, noise_rate=noise_rate),
        out_shape=(
            jax.ShapeDtypeStruct((n * c, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n * c, h, w), jnp.float32),
        ),
        grid=(n * c,),
        in_specs=[_plane_spec(h, w), _plane_spec(h, w), _mat_spec(h, h), _mat_spec(h, h),
                  _mat_spec(h, w), _mat_spec(h, h), _mat_spec(h, h)],
        out_specs=(_plane_spec(h, w), _plane_spec(h, w)),
        interpret=_interpret(),
    )(planes_x, planes_n, d, d.T, mask, Bf, Bf.T)
    return out.reshape(n, c, h, w).transpose(0, 2, 3, 1).astype(x.dtype), u


def _fused_trigger_vjp_fwd(x, noise, B, image_size, ratio, noise_rate):
    out, u = _fused_trigger_impl(x, noise, B, image_size, ratio, noise_rate)
    return out, (u, B)


def _fused_trigger_vjp_bwd(image_size, ratio, noise_rate, res, g):
    u, B = res
    n, h, w, c = g.shape  # cotangent has the primal's NHWC shape/dtype
    dtype = g.dtype
    shape = g.shape
    d, mask = _trigger_operands(jnp.zeros(shape), image_size, ratio)
    planes_g = g.astype(jnp.float32).transpose(0, 3, 1, 2).reshape(n * c, h, w)
    Bf = B.astype(jnp.float32)
    gx, gn = pl.pallas_call(
        functools.partial(_fused_trigger_bwd_kernel, noise_rate=noise_rate),
        out_shape=(
            jax.ShapeDtypeStruct((n * c, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n * c, h, w), jnp.float32),
        ),
        grid=(n * c,),
        in_specs=[_plane_spec(h, w), _plane_spec(h, w), _mat_spec(h, h), _mat_spec(h, h),
                  _mat_spec(h, w), _mat_spec(h, h), _mat_spec(h, h)],
        out_specs=(_plane_spec(h, w), _plane_spec(h, w)),
        interpret=_interpret(),
    )(planes_g, u, d, d.T, mask, Bf, Bf.T)
    to_img = lambda p: p.reshape(n, c, h, w).transpose(0, 2, 3, 1).astype(dtype)
    return to_img(gx), to_img(gn), jnp.zeros_like(B)


fused_trigger_pallas.defvjp(_fused_trigger_vjp_fwd, _fused_trigger_vjp_bwd)


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
        interpret=_interpret(),
    )(planes, d, d.T, mask)
    return out.reshape(n, c, h, w).transpose(0, 2, 3, 1).astype(x.dtype)
