"""Golden tests: DCT parity with scipy.fftpack (the reference's documented
semantics — reference utils/dct.py:13-111 cites the scipy docs) and the
uint8-cast featurization path (reference train_generator.py:245)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.fftpack

from combat_tpu.ops import dct_2d, detector_features, idct_2d, low_freq


def scipy_dct2(x):
    return scipy.fftpack.dct(scipy.fftpack.dct(x, axis=-1, norm="ortho"), axis=-2, norm="ortho")


def scipy_idct2(x):
    return scipy.fftpack.idct(scipy.fftpack.idct(x, axis=-1, norm="ortho"), axis=-2, norm="ortho")


@pytest.mark.parametrize("size", [8, 32])
def test_dct2d_matches_scipy(size):
    rng = np.random.RandomState(0)
    x = rng.randn(2, size, size, 3).astype(np.float32)
    got = np.asarray(dct_2d(jnp.asarray(x)))
    want = scipy_dct2(x.transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_idct2d_roundtrip_and_scipy():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    xj = jnp.asarray(x)
    np.testing.assert_allclose(np.asarray(idct_2d(dct_2d(xj))), x, rtol=1e-4, atol=1e-4)
    want = scipy_idct2(x.transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(idct_2d(xj)), want, rtol=1e-4, atol=1e-4)


def test_dct_orthonormality():
    from combat_tpu.ops.dct import _dct_matrix_np

    d = _dct_matrix_np(32)
    np.testing.assert_allclose(d @ d.T, np.eye(32), atol=1e-10)


def test_low_freq_keeps_low_block_only():
    """low_freq must zero all DCT coefficients outside the top-left block
    (reference train_generator.py:47-55: cutoff = int(32 * 0.65) = 20)."""
    rng = np.random.RandomState(2)
    x = np.tanh(rng.randn(2, 32, 32, 3)).astype(np.float32)
    y = low_freq(jnp.asarray(x), image_size=32, ratio=0.65)
    coeffs = np.asarray(dct_2d((y + 1) / 2 * 255))
    cutoff = int(32 * 0.65)
    assert np.abs(coeffs[:, cutoff:, :, :]).max() < 1e-2
    assert np.abs(coeffs[:, :, cutoff:, :]).max() < 1e-2
    # And the kept block survives the round trip.
    orig = np.asarray(dct_2d(jnp.asarray((x + 1) / 2 * 255)))
    np.testing.assert_allclose(
        coeffs[:, :cutoff, :cutoff, :], orig[:, :cutoff, :cutoff, :], rtol=1e-3, atol=1e-2
    )


def test_low_freq_ratio_one_is_identity():
    rng = np.random.RandomState(3)
    x = np.tanh(rng.randn(1, 16, 16, 3)).astype(np.float32)
    y = np.asarray(low_freq(jnp.asarray(x), image_size=16, ratio=1.0))
    np.testing.assert_allclose(y, x, rtol=1e-4, atol=1e-4)


def test_detector_features_uint8_truncation():
    """The .byte() cast truncates toward zero before the DCT
    (reference train_generator.py:245)."""
    x = jnp.asarray(np.array([[-1.0, 0.0, 0.5, 1.0]], dtype=np.float32).reshape(1, 2, 2, 1))
    got = np.asarray(detector_features(x))
    q = np.trunc((np.asarray(x) + 1) / 2 * 255).astype(np.uint8).astype(np.float32)
    want = scipy_dct2(q.transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
