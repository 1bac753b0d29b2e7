"""Batched, PRNG-keyed train-time augmentations (NHWC, on-device).

TPU-native replacement for the reference's ``PostTensorTransform`` (kornia
``RandomCrop(p=0.8, padding=5)`` / ``RandomRotation(10, p=0.5)`` /
``RandomHorizontalFlip(p=0.5)`` applied per batch inside the train loop —
reference ``utils/dataloader.py:45-60``, used at ``train_generator.py:196``).

Semantics preserved:
  * the p=0.8 / p=0.5 gates are *per batch* (the reference's ``ProbTransform``
    flips one ``random.random()`` coin for the whole batch,
    ``utils/dataloader.py:11-21``); crop offsets / rotation angles are then
    sampled *per image* (kornia ``same_on_batch=False``);
  * horizontal flip is per image;
  * crop pads with constant 0 ([-1,1] images → mid-gray), rotation fills
    zeros outside and interpolates bilinearly about the pixel-grid center.

Everything is a pure function of a PRNG key so the whole augmentation stack
lives inside the jitted train step — there is no host round-trip per batch,
unlike the reference which syncs on ``random.random()`` every call.  Batch
gates use ``jnp.where`` on both branches rather than ``lax.cond``: the aug
math is negligible next to the model convs and keeping it branch-free lets
XLA fuse the step into one program.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .image import grid_sample

# HBM budget for the fused-resample rank-5 intermediate; above it the
# contraction is chunked over output rows (identical math, bounded memory).
_CHUNK_BYTES = 256 * 1024 * 1024


def random_crop_with_padding(key: jax.Array, x: jnp.ndarray, padding: int) -> jnp.ndarray:
    """Per-image random crop after constant-0 padding (kornia RandomCrop).

    TPU-first: a per-image crop is a per-image integer translation, expressed
    as two one-hot selection matmuls instead of a vmapped ``dynamic_slice``
    (which lowers to a serial gather and dominated the fused step)."""
    n, h, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    kt, kl = jax.random.split(key)
    tops = jax.random.randint(kt, (n,), 0, 2 * padding + 1)
    lefts = jax.random.randint(kl, (n,), 0, 2 * padding + 1)
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    src_rows = jnp.arange(h + 2 * padding)
    src_cols = jnp.arange(w + 2 * padding)
    # sel_y[b, i, Y] = (Y == i + tops[b])
    sel_y = (src_rows[None, None, :] == rows[None, :, None] + tops[:, None, None]).astype(x.dtype)
    sel_x = (src_cols[None, None, :] == cols[None, :, None] + lefts[:, None, None]).astype(x.dtype)
    t = jnp.einsum("biY,bYXc->biXc", sel_y, padded)
    return jnp.einsum("bjX,biXc->bijc", sel_x, t)


def random_rotation(key: jax.Array, x: jnp.ndarray, max_degrees: float) -> jnp.ndarray:
    """Per-image rotation by U(-max_degrees, max_degrees), bilinear, zero fill.

    Rotation is about the pixel-grid center ((W-1)/2, (H-1)/2) with
    align_corners=True sampling, matching kornia's ``RandomRotation``
    (``warp_affine`` with ``align_corners=True``).
    """
    n, h, w, _ = x.shape
    angles = jax.random.uniform(key, (n,), minval=-max_degrees, maxval=max_degrees)
    theta = jnp.deg2rad(angles)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # Normalized [-1, 1] grid (align_corners=True ⇔ endpoints at pixel centers).
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    # Inverse rotation applied to output coords. Aspect is square in all
    # supported datasets; normalized coords rotate directly.
    sx = cos[:, None, None] * gx + sin[:, None, None] * gy
    sy = -sin[:, None, None] * gx + cos[:, None, None] * gy
    grid = jnp.stack([sx, sy], axis=-1)
    return grid_sample(x, grid.astype(x.dtype), align_corners=True)


def random_hflip(key: jax.Array, x: jnp.ndarray, p: float = 0.5) -> jnp.ndarray:
    coins = jax.random.bernoulli(key, p, (x.shape[0],))
    return jnp.where(coins[:, None, None, None], x[:, :, ::-1, :], x)


def post_tensor_transform(
    key: jax.Array,
    x: jnp.ndarray,
    *,
    crop_padding: int = 5,
    rotation_degrees: float = 10.0,
    hflip: bool = True,
    option: str = "use",
) -> jnp.ndarray:
    """The full train-time augmentation stack (reference PostTensorTransform).

    ``option`` mirrors ``--post_transform_option``: "use" (crop+rot+flip),
    "use_modified" (no crop), "no_use" (identity) — reference
    ``utils/dataloader.py:48-55`` / ``config.py:75``.

    TPU-first: the whole chain is composed into ONE bilinear resample from
    the padded image.  Crop is an integer translation, rotation an affine
    map, flip a mirror of the sampling grid — their composition is a single
    per-image affine sampling-coordinate field, and the chained zero-fill
    semantics are preserved exactly by masking the interpolation taps to
    the per-image crop window (measured: 434 vs 507 us per call against the
    sequential chain; agrees to ~5e-6 on CPU f32 and to ~1e-3 on the TPU
    backend, where the interpolation einsums run at default bf16 matmul
    precision; PERF.md).  Disabled stages
    degenerate to identity parameters (offset = padding, angle = 0), so the
    per-batch p-gates stay branch-free.
    """
    if option == "no_use":
        return x
    n, h, w, _ = x.shape
    pad = crop_padding
    k_cgate, k_crop, k_rgate, k_rot, k_flip = jax.random.split(key, 5)
    padded = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    kt, kl = jax.random.split(k_crop)
    tops = jax.random.randint(kt, (n,), 0, 2 * pad + 1)
    lefts = jax.random.randint(kl, (n,), 0, 2 * pad + 1)
    if option != "use_modified":
        crop_gate = jax.random.bernoulli(k_cgate, 0.8)
    else:
        crop_gate = jnp.asarray(False)
    tops = jnp.where(crop_gate, tops, pad)
    lefts = jnp.where(crop_gate, lefts, pad)

    rot_gate = jax.random.bernoulli(k_rgate, 0.5)
    angles = jax.random.uniform(k_rot, (n,), minval=-rotation_degrees, maxval=rotation_degrees)
    theta = jnp.deg2rad(jnp.where(rot_gate, angles, 0.0))
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    # crop-frame pixel coords of the rotated sampling grid (align_corners)
    fx = (cos[:, None, None] * gx + sin[:, None, None] * gy + 1.0) * 0.5 * (w - 1)
    fy = (-sin[:, None, None] * gx + cos[:, None, None] * gy + 1.0) * 0.5 * (h - 1)

    if hflip:
        coins = jax.random.bernoulli(k_flip, 0.5, (n,))
        fx = jnp.where(coins[:, None, None], fx[:, :, ::-1], fx)
        fy = jnp.where(coins[:, None, None], fy[:, :, ::-1], fy)

    fxp = fx + lefts[:, None, None].astype(fx.dtype)
    fyp = fy + tops[:, None, None].astype(fy.dtype)
    src_y = jnp.arange(h + 2 * pad, dtype=fy.dtype)
    src_x = jnp.arange(w + 2 * pad, dtype=fx.dtype)
    uy = jnp.maximum(1.0 - jnp.abs(fyp[..., None] - src_y), 0.0)
    ux = jnp.maximum(1.0 - jnp.abs(fxp[..., None] - src_x), 0.0)
    # rotation's zero fill is relative to the crop window, not the padded
    # image: mask the taps to [t, t + size - 1] per image
    my = (src_y[None, :] >= tops[:, None]) & (src_y[None, :] <= tops[:, None] + (h - 1))
    mx = (src_x[None, :] >= lefts[:, None]) & (src_x[None, :] <= lefts[:, None] + (w - 1))
    uy = uy * my[:, None, None, :]
    ux = ux * mx[:, None, None, :]
    uy = uy.astype(x.dtype)
    ux = ux.astype(x.dtype)

    def resample(ux_blk, uy_blk):
        # (b, blk, w, Sx) x (b, Sy, Sx, c) -> (b, blk, w, Sy, c) -> (b, blk, w, c)
        t = jnp.einsum("bijx,byxc->bijyc", ux_blk, padded)
        return jnp.einsum("bijy,bijyc->bijc", uy_blk, t)

    # The warp is a full 2-D rotation, so the contraction is not separable
    # and its rank-5 intermediate scales as b*h*w*(h+2p)*c — 66 MB at 32px
    # but 4.6 GB at 224px (measured OOM: 17.7G/15.75G HBM, imagenet10
    # stage 1).  Chunk output rows through the identical einsums when the
    # intermediate would exceed _CHUNK_BYTES; 32px keeps the single-shot
    # shape.
    inter_bytes = n * h * w * (h + 2 * pad) * x.shape[-1] * x.dtype.itemsize
    if inter_bytes <= _CHUNK_BYTES:
        return resample(ux, uy)
    want = min(h, -(-inter_bytes // _CHUNK_BYTES))  # smallest block count, capped at h
    blocks = next(b for b in range(want, h + 1) if h % b == 0)
    blk = h // blocks
    ux_b = ux.reshape(n, blocks, blk, w, -1).transpose(1, 0, 2, 3, 4)
    uy_b = uy.reshape(n, blocks, blk, w, -1).transpose(1, 0, 2, 3, 4)
    out = jax.lax.map(lambda args: resample(*args), (ux_b, uy_b))
    return out.transpose(1, 0, 2, 3, 4).reshape(n, h, w, -1)
