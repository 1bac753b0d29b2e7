"""Trigger synthesis and target mapping (pure functions, jit-safe).

Parity targets:
  * ``create_targets_bd`` — all2one / all2all mapping
    (reference ``train_generator.py:70-77``).
  * :func:`additive_trigger` — the core COMBAT trigger:
    ``gauss_smooth(clamp(x + low_freq(G(x)) * noise_rate, -1, 1))``
    (reference ``train_generator.py:189-194,223-226``).
  * :func:`warp_trigger` — WaNet warp:
    ``grid_sample(x, clamp(identity*(1-rescale) + upsample(flow)*rescale))``
    (reference ``train_generator_wanet.py:151-157,196-202``).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..ops.blur import random_gaussian_blur
from ..ops.dct import low_freq
from ..ops.image import grid_sample, resize2d


def create_targets_bd(targets: jnp.ndarray, attack_mode: str, target_label: int, num_classes: int) -> jnp.ndarray:
    if attack_mode == "all2one":
        return jnp.full_like(targets, target_label)
    if attack_mode == "all2all":
        return (targets + 1) % num_classes
    raise ValueError(f"{attack_mode} attack mode is not implemented")


def additive_trigger(
    key: jax.Array,
    x: jnp.ndarray,
    noise: jnp.ndarray,
    *,
    image_size: int,
    ratio: float,
    noise_rate: float,
    kernel_size: int,
    sigma: Tuple[float, float],
    use_pallas: bool = False,
    use_pallas_fused: bool = False,
) -> jnp.ndarray:
    """Inject a generator noise map into x: DCT low-pass, scaled add, clamp,
    Gaussian blur. One blur-sigma draw per call (one per batch), like each
    ``gauss_smooth`` invocation in the reference.

    ``use_pallas_fused`` routes the whole chain through ONE Pallas VMEM
    kernel (``ops/pallas_kernels.fused_trigger_pallas``); ``use_pallas``
    kernelizes only the low-pass."""
    if use_pallas_fused:
        from ..ops.blur import gaussian_kernel_1d
        from ..ops.pallas_kernels import _blur_matrix, fused_trigger_pallas

        lo, hi = sigma
        s = jax.random.uniform(key, (), minval=lo, maxval=hi)
        B = _blur_matrix(gaussian_kernel_1d(kernel_size, s), image_size)
        return fused_trigger_pallas(
            x, noise.astype(x.dtype), B, image_size, ratio, noise_rate
        )
    # trigger math in the image dtype (f32) even under bf16 model compute
    n = low_freq(noise.astype(x.dtype), image_size=image_size, ratio=ratio, use_pallas=use_pallas)
    x_bd = jnp.clip(x + n * noise_rate, -1.0, 1.0)
    return random_gaussian_blur(key, x_bd, kernel_size, sigma)


def identity_grid(height: int, width: int) -> jnp.ndarray:
    """Normalized (H, W, 2) identity sampling grid, align_corners=True
    convention (reference builds it via ``F.affine_grid`` of the identity,
    ``train_generator_wanet.py:560-562``)."""
    ys = jnp.linspace(-1.0, 1.0, height)
    xs = jnp.linspace(-1.0, 1.0, width)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)


def warp_trigger(
    x: jnp.ndarray,
    flow: jnp.ndarray,
    *,
    grid_rescale: float,
    clamp_grid: bool = True,
) -> jnp.ndarray:
    """WaNet-style warp: upsample the (B, s, s, 2) flow field to image size
    (bicubic, align_corners=True), blend with the identity grid, clamp to
    [-1, 1], grid-sample (reference ``train_generator_wanet.py:151-157``)."""
    h, w = x.shape[1], x.shape[2]
    up = resize2d(flow, (h, w), method="bicubic", align_corners=True)
    grid = identity_grid(h, w)[None] * (1.0 - grid_rescale) + up * grid_rescale
    if clamp_grid:
        grid = jnp.clip(grid, -1.0, 1.0)
    return grid_sample(x, grid, align_corners=True)
