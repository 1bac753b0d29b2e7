"""Image resampling ops: matmul-form resize, grid-sample, total variation.

TPU-first design note: all the resizes the pipeline needs are *static-shape*
1-D→1-D linear maps applied separably to H and W.  Instead of gather-based
interpolation we precompute a dense (out × in) interpolation matrix once per
(size, method) pair and apply it as two small matmuls — exact, MXU-friendly,
and trivially fusable by XLA.  This replaces:

  * ``nn.Upsample(scale_factor=2, mode='bilinear')`` in the UNet decoders
    (reference ``networks/models.py:274`` — align_corners=False),
  * ``F.upsample(..., mode='bicubic', align_corners=True)`` for the WaNet
    flow-field upsample (reference ``train_generator_wanet.py:151-157``),
  * ``transforms.Resize`` in the host data pipeline.

``grid_sample`` is a hand-written bilinear gather+lerp matching
``F.grid_sample(..., align_corners=True, padding_mode='zeros')`` as used by
the WaNet warp (reference ``train_generator_wanet.py:157,202``).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _cubic_weight(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic kernel with torch's a=-0.75."""
    t = np.abs(t)
    w = np.zeros_like(t)
    m1 = t <= 1.0
    m2 = (t > 1.0) & (t < 2.0)
    w[m1] = ((a + 2.0) * t[m1] - (a + 3.0)) * t[m1] * t[m1] + 1.0
    w[m2] = (((t[m2] - 5.0) * t[m2] + 8.0) * t[m2] - 4.0) * a
    return w


@functools.lru_cache(maxsize=None)
def _resize_matrix_np(n_in: int, n_out: int, method: str, align_corners: bool) -> np.ndarray:
    """Dense (n_out, n_in) interpolation matrix.

    Tap indices are clamped to the valid range, matching torch's border
    handling for both bilinear and bicubic interpolation.
    """
    if n_out == n_in and method in ("bilinear", "nearest"):
        return np.eye(n_in)
    dst = np.arange(n_out, dtype=np.float64)
    if align_corners:
        src = dst * (max(n_in - 1, 1) / max(n_out - 1, 1)) if n_out > 1 else np.zeros_like(dst)
    else:
        src = (dst + 0.5) * (n_in / n_out) - 0.5
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    if method == "nearest":
        idx = np.clip(np.floor(src + (0.0 if align_corners else 0.0)), 0, n_in - 1).astype(int)
        mat[np.arange(n_out), idx] = 1.0
    elif method == "bilinear":
        i0 = np.floor(src).astype(int)
        frac = src - i0
        for off, w in ((0, 1.0 - frac), (1, frac)):
            idx = np.clip(i0 + off, 0, n_in - 1)
            np.add.at(mat, (np.arange(n_out), idx), w)
    elif method == "bicubic":
        i0 = np.floor(src).astype(int)
        frac = src - i0
        for off in (-1, 0, 1, 2):
            w = _cubic_weight(frac - off)
            idx = np.clip(i0 + off, 0, n_in - 1)
            np.add.at(mat, (np.arange(n_out), idx), w)
    else:
        raise ValueError(f"unknown resize method {method!r}")
    return mat


def resize_matrix(n_in: int, n_out: int, method: str, align_corners: bool, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(_resize_matrix_np(n_in, n_out, method, align_corners), dtype=dtype)


def resize2d(x: jnp.ndarray, out_hw, method: str = "bilinear", align_corners: bool = False) -> jnp.ndarray:
    """Separable resize of an NHWC batch to ``out_hw`` via two matmuls."""
    h_out, w_out = out_hw
    mh = resize_matrix(x.shape[-3], h_out, method, align_corners, x.dtype)
    mw = resize_matrix(x.shape[-2], w_out, method, align_corners, x.dtype)
    return jnp.einsum("hH,...HWc,wW->...hwc", mh, x, mw)


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """Parity with ``nn.Upsample(scale_factor=2, mode='bilinear')``
    (align_corners=False) used in every UNet decoder stage
    (reference ``networks/models.py:274``)."""
    return resize2d(x, (x.shape[-3] * 2, x.shape[-2] * 2), "bilinear", align_corners=False)


def grid_sample(x: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = True) -> jnp.ndarray:
    """Bilinear grid sample, NHWC input, grid (N, Ho, Wo, 2) with (x, y) in
    [-1, 1]; zero padding outside.  Parity with
    ``F.grid_sample(..., mode='bilinear', padding_mode='zeros')``.

    TPU-first formulation: instead of a 4-point gather (XLA gathers are
    serial and dominate the train step on TPU — measured 4x slowdown of the
    whole alternated step), bilinear interpolation is expressed through hat
    functions ``u(o, k) = relu(1 - |f(o) - k|)`` which have exactly the two
    bilinear taps as nonzeros, giving

        out[b,o,c] = Σ_y u_y[b,o,y] · Σ_x u_x[b,o,x] · img[b,y,x,c]

    — two batched matmuls on the MXU, no gather/scatter.  Out-of-range
    samples get all-zero hats, which reproduces zeros padding exactly
    (including the partial-weight boundary taps).
    """
    n, h, w, c = x.shape
    ho, wo = grid.shape[1], grid.shape[2]
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (w - 1)
        fy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        fy = ((gy + 1.0) * h - 1.0) * 0.5
    ux = nn_relu(1.0 - jnp.abs(fx[..., None] - jnp.arange(w, dtype=fx.dtype)))  # (N,Ho,Wo,W)
    uy = nn_relu(1.0 - jnp.abs(fy[..., None] - jnp.arange(h, dtype=fy.dtype)))  # (N,Ho,Wo,H)
    t = jnp.einsum("bijx,byxc->bijyc", ux.astype(x.dtype), x)
    return jnp.einsum("bijy,bijyc->bijc", uy.astype(x.dtype), t)


def nn_relu(v):
    return jnp.maximum(v, 0.0)


def total_variation(x: jnp.ndarray) -> jnp.ndarray:
    """Per-sample anisotropic TV over an NHWC batch; returns shape (N,).

    Parity with ``kornia.losses.total_variation`` as used by the
    imperceptible variant (reference ``train_generator_imperceptible.py:228``:
    ``total_variation(inputs_bd).mean()``).
    """
    dh = jnp.abs(x[:, 1:, :, :] - x[:, :-1, :, :])
    dw = jnp.abs(x[:, :, 1:, :] - x[:, :, :-1, :])
    return dh.sum(axis=(1, 2, 3)) + dw.sum(axis=(1, 2, 3))
