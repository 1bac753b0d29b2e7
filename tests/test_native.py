"""Native host-IO library tests: build via g++, parity with numpy fallbacks,
CIFAR-binary round trip."""

import os

import numpy as np
import pytest

from combat_tpu import native


def test_native_builds_and_loads():
    assert native.available(), "g++ build of combat_io.cc failed"


def test_normalize_matches_numpy():
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, size=(3, 32, 32, 3), dtype=np.uint8)
    got = native.normalize_u8(u8)
    want = u8.astype(np.float32) * (2.0 / 255.0) - 1.0
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_gather_rows_matches_numpy():
    rng = np.random.RandomState(1)
    data = rng.randn(100, 7, 3).astype(np.float32)
    idx = rng.randint(0, 100, size=(17,))
    np.testing.assert_array_equal(native.gather_rows(data, idx), data[idx])


def test_cifar_bin_decode_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    n = 50
    labels = rng.randint(0, 10, size=(n,), dtype=np.uint8)
    chw = rng.randint(0, 256, size=(n, 3, 32, 32), dtype=np.uint8)
    records = np.concatenate([labels[:, None], chw.reshape(n, -1)], axis=1)
    path = tmp_path / "data_batch_1.bin"
    records.tofile(path)

    out = native.decode_cifar10_bin(str(path), max_records=n)
    assert out is not None
    images, got_labels = out
    np.testing.assert_array_equal(got_labels, labels.astype(np.int32))
    want = chw.transpose(0, 2, 3, 1).astype(np.float32) * (2.0 / 255.0) - 1.0
    np.testing.assert_allclose(images, want, rtol=1e-6, atol=1e-6)


def test_dataset_loader_uses_bin_layout(tmp_path):
    from combat_tpu.config import Config, apply_dataset_preset
    from combat_tpu.data import get_dataset

    rng = np.random.RandomState(3)
    base = tmp_path / "cifar-10-batches-bin"
    os.makedirs(base)
    for fn in [f"data_batch_{i}.bin" for i in range(1, 6)] + ["test_batch.bin"]:
        n = 20
        labels = rng.randint(0, 10, size=(n,), dtype=np.uint8)
        chw = rng.randint(0, 256, size=(n, 3, 32, 32), dtype=np.uint8)
        np.concatenate([labels[:, None], chw.reshape(n, -1)], axis=1).tofile(base / fn)
    cfg = apply_dataset_preset(Config(dataset="cifar10", data_root=str(tmp_path)))
    ds = get_dataset(cfg, train=True)
    assert len(ds) == 100 and ds.images.shape[1:] == (32, 32, 3)
    assert ds.images.min() >= -1.0 and ds.images.max() <= 1.0
