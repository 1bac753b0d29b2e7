"""Dataset registry with full on-device residency.

TPU-first redesign of the reference's DataLoader-worker pipeline (reference
``utils/dataloader.py:98-123``, 6–40 worker processes): the supported image
datasets are small enough that the *entire* split lives in HBM (CIFAR-10
train = 50k x 32 x 32 x 3 fp32 ≈ 590 MB; uint8 ≈ 147 MB), so per-step
minibatching is a device-side gather and there is no host↔device transfer
after startup — the layer the reference spends worker processes on simply
does not exist here.

Sources, in priority order:
  * torchvision-layout pickle batches on disk (``cifar-10-batches-py``),
  * a generic ``<root>/<name>_{train,test}.npz`` with ``images`` (N,H,W,C
    uint8) + ``labels``,
  * a deterministic synthetic dataset (class-template + noise, learnable)
    for network-less environments, behind ``--synthetic_data``.

Images are float32 in [-1, 1] — the reference normalizes with
mean=std=0.5 (``utils/dataloader.py:36-39``), i.e. ``x*2-1`` on [0,1].
CelebA attribute relabeling (3 bits → 8 classes, attributes [18, 31, 21])
follows reference ``utils/dataloader.py:63-80``.
"""

from __future__ import annotations

import os
import pickle
from typing import NamedTuple, Optional, Tuple

import numpy as np

from ..config import Config


class ArrayDataset(NamedTuple):
    images: np.ndarray  # (N, H, W, C) float32 in [-1, 1]
    labels: np.ndarray  # (N,) int32

    def __len__(self):
        return self.images.shape[0]


def _normalize(u8: np.ndarray) -> np.ndarray:
    return (u8.astype(np.float32) / 255.0) * 2.0 - 1.0


def _load_cifar10_bin(root: str, train: bool) -> Optional[ArrayDataset]:
    """CIFAR-10 *binary* layout via the native decoder (combat_io.cc), with a
    numpy fallback parse of the same fixed-record format."""
    base = os.path.join(root, "cifar-10-batches-bin")
    if not os.path.isdir(base):
        return None
    from .. import native

    files = [f"data_batch_{i}.bin" for i in range(1, 6)] if train else ["test_batch.bin"]
    images, labels = [], []
    for fn in files:
        path = os.path.join(base, fn)
        decoded = native.decode_cifar10_bin(path) if native.available() else None
        if decoded is None:
            raw = np.fromfile(path, np.uint8).reshape(-1, 1 + 3 * 32 * 32)
            labels.append(raw[:, 0].astype(np.int32))
            chw = raw[:, 1:].reshape(-1, 3, 32, 32)
            images.append(_normalize(chw.transpose(0, 2, 3, 1)))
        else:
            images.append(decoded[0])
            labels.append(decoded[1])
    return ArrayDataset(np.concatenate(images), np.concatenate(labels))


def _load_cifar10_torchvision(root: str, train: bool) -> Optional[ArrayDataset]:
    base = os.path.join(root, "cifar-10-batches-py")
    if not os.path.isdir(base):
        return None
    files = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
    images, labels = [], []
    for fn in files:
        with open(os.path.join(base, fn), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        images.append(d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1))
        labels.extend(d[b"labels"])
    return ArrayDataset(_normalize(np.concatenate(images)), np.asarray(labels, np.int32))


def _load_npz(root: str, name: str, train: bool) -> Optional[ArrayDataset]:
    path = os.path.join(root, f"{name}_{'train' if train else 'test'}.npz")
    if not os.path.exists(path):
        return None
    d = np.load(path)
    images = d["images"]
    if images.dtype == np.uint8:
        images = _normalize(images)
    labels = d["labels"].astype(np.int32)
    if name == "celeba" and labels.ndim == 2:
        # raw 40-attr matrix → 8-class target from attrs [18, 31, 21]
        a = labels[:, [18, 31, 21]].astype(np.int32)
        labels = (a[:, 0] << 2) + (a[:, 1] << 1) + a[:, 2]
    return ArrayDataset(images.astype(np.float32), labels)


def _smooth(fields: np.ndarray, passes: int = 2) -> np.ndarray:
    """5-point diffusion over each (.., H, W, C) field, ``passes`` times.

    passes <= 8 runs the literal roll-based loop — bit-for-bit identical to
    the committed 32px evidence runs (r5-r11).  Larger counts (the
    resolution-scaled 64/224px datasets) apply the SAME operator in Fourier
    space: ``np.roll``'s circular boundary makes the diffusion kernel
    diagonal in the FFT basis with multiplier
    ``((1 + 2cos wy + 2cos wx)/5)^passes``, exact up to float rounding, in
    O(HW log HW) instead of O(passes * HW)."""
    if passes <= 8:
        for _ in range(passes):
            fields = (
                fields
                + np.roll(fields, 1, axis=-3)
                + np.roll(fields, -1, axis=-3)
                + np.roll(fields, 1, axis=-2)
                + np.roll(fields, -1, axis=-2)
            ) / 5.0
    else:
        h, w = fields.shape[-3], fields.shape[-2]
        wy = 2.0 * np.pi * np.fft.fftfreq(h)[:, None]
        wx = 2.0 * np.pi * np.fft.rfftfreq(w)[None, :]
        hat = ((1.0 + 2.0 * np.cos(wy) + 2.0 * np.cos(wx)) / 5.0) ** passes
        spec = np.fft.rfft2(fields, axes=(-3, -2))
        fields = np.fft.irfft2(spec * hat[..., None], s=(h, w), axes=(-3, -2)).astype(
            fields.dtype
        )
    return fields / (np.abs(fields).max(axis=(-3, -2, -1), keepdims=True) + 1e-8)


def synthetic_dataset(
    cfg: Config, train: bool, n: Optional[int] = None, return_meta: bool = False
):
    """Deterministic CIFAR-hardness stand-in for network-less environments.

    The round-1 version (single template per class + pixel noise) was too
    easy: classifiers hit 100% train acc with CE≈0, so a poisoned victim
    never needs the trigger shortcut and ASR stalls — unrepresentative of
    CIFAR-10 attack dynamics.  This distribution restores the properties
    the attack relies on (QUALITY.md documents the iteration evidence):
    high intra-class diversity (multi-modal band-pass templates, per-image
    shift/flip/amplitude, smooth label-independent backgrounds) and a
    substantial class-ambiguous mass (blended templates) that keeps
    per-example CE positive at convergence — the gradient pressure that
    makes a poisoned victim absorb the trigger as a feature.  Clean test
    accuracy lands in the 60–75% band with victim clean-acc parity, and
    victim ASR reaches the high-90s at the canonical operating point.
    Split sizes match CIFAR-10 (50k/10k) unless ``--synthetic_size`` caps
    them.  Seeded independently of the model/poison PRNG chain."""
    if n is None:
        if cfg.synthetic_size:
            n = cfg.synthetic_size if train else max(cfg.synthetic_size // 5, 1)
        else:
            n = 50000 if train else 10000
    h, w, c, k = cfg.input_height, cfg.input_width, cfg.input_channel, cfg.num_classes
    modes = 4  # class-template modes (multi-modal classes)
    rng = np.random.RandomState(12345 if train else 54321)
    # Class templates are band-pass (mid-frequency): like natural images,
    # the discriminative signal lives above the lowest DCT band, so the
    # trigger's low-frequency channel is not class-predictive — occupied
    # only by the (label-independent) smooth backgrounds.  (A fully
    # high-frequency variant was tried and rejected: the reference's
    # crop/rotation augmentations decorrelate pure high-freq textures and
    # clean accuracy collapses.)
    # Feature scale must be a constant FRACTION of the image, as in natural
    # images (a CIFAR object spans about half the frame at 32px and an
    # ImageNet object still does at 224px).  Box-diffusion correlation
    # length grows like sqrt(passes), so passes scale with pixel AREA; at
    # 32px scale == 1 and this is exactly the committed r5-r11
    # distribution.  Unscaled, 224px templates are 1-2 px texture that an
    # imagenet-style stride-4 ResNet stem low-passes away — observed as
    # chance-level clean accuracy (quality_logs/quality_imagenet10_r3.log,
    # pre-fix run: test acc 10.75% after 30 epochs).
    scale = max(1, round((h * w) / (32 * 32)))
    raw = np.random.RandomState(999).randn(k, modes, h, w, c).astype(np.float32)
    templates = _smooth(raw, passes=1 * scale) - _smooth(raw, passes=4 * scale)
    templates /= np.abs(templates).max(axis=(-3, -2, -1), keepdims=True) + 1e-8
    backgrounds = _smooth(np.random.RandomState(777).randn(64, h, w, c).astype(np.float32), passes=3 * scale)

    labels = rng.randint(0, k, size=(n,)).astype(np.int32)
    mode = rng.randint(0, modes, size=n)
    base = templates[labels, mode]
    # class ambiguity: a fraction of images blend in a *different* class's
    # template.  This keeps per-example CE positive at convergence (like
    # CIFAR's hard examples) — the gradient pressure that makes a poisoned
    # victim absorb the trigger shortcut; without it classifiers zero out
    # the loss from content alone and ASR stalls (observed in rounds 1-2).
    confuse = rng.rand(n) < 0.68
    other = (labels + rng.randint(1, k, size=n)) % k
    blend = rng.uniform(0.5, 0.9, size=n).astype(np.float32)[:, None, None, None]
    base = np.where(confuse[:, None, None, None], base * (1 - blend) + templates[other, mode] * blend, base)
    # per-image geometric variation: circular shift up to ±h/4, random hflip
    sy = rng.randint(-h // 4, h // 4 + 1, size=n)
    sx = rng.randint(-w // 4, w // 4 + 1, size=n)
    row = (np.arange(h)[None, :] - sy[:, None]) % h
    col = (np.arange(w)[None, :] - sx[:, None]) % w
    base = base[np.arange(n)[:, None, None], row[:, :, None], col[:, None, :]]
    flip = rng.rand(n) < 0.5
    base[flip] = base[flip, :, ::-1]
    # amplitude cap 0.62: round-3 failure analysis (scripts/analyze_asr.py on
    # the r10 victim) showed ASR failures concentrate in the strong-template
    # tail (amp [0.7,0.85) -> ASR 94.6 vs 99.6 at [0.4,0.5)) — content
    # evidence overpowering the trigger, the regime CIFAR's softer content
    # does not occupy at the reference's near-perfect operating point
    amp = rng.uniform(0.4, 0.62, size=n).astype(np.float32)[:, None, None, None]
    bg = backgrounds[rng.randint(0, 64, size=n)]
    # background/noise floors sized so the low-frequency band is usable by a
    # noise_rate-scale signal (natural-image analogy: smooth illumination
    # varies but does not bury a consistent low-band watermark)
    bg_amp = rng.uniform(0.1, 0.35, size=n).astype(np.float32)[:, None, None, None]
    noise = rng.randn(n, h, w, c).astype(np.float32) * 0.12
    images = np.clip(base * amp + bg * bg_amp + noise, -1.0, 1.0)
    # optional label-noise floor (TRAIN split only): caps the achievable
    # confidence of any classifier trained on the split — the calibration
    # lever for the STRIP entropy study (see Config.synthetic_label_noise)
    if train and cfg.synthetic_label_noise > 0.0:
        nz = rng.rand(n) < cfg.synthetic_label_noise
        labels = np.where(
            nz, (labels + rng.randint(1, k, size=n)) % k, labels
        ).astype(np.int32)
    ds = ArrayDataset(images.astype(np.float32), labels)
    if return_meta:
        # per-image generation parameters, for attack-failure analysis
        meta = {
            "confuse": confuse,
            "blend": np.where(confuse, blend[:, 0, 0, 0], 0.0),
            "amp": amp[:, 0, 0, 0],
            "bg_amp": bg_amp[:, 0, 0, 0],
            "other": other,
            "mode": mode,
        }
        return ds, meta
    return ds


def get_mean_and_std(ds: ArrayDataset) -> Tuple[np.ndarray, np.ndarray]:
    """Per-channel mean/std (reference ``utils/utils.py:15-27``)."""
    return ds.images.mean(axis=(0, 1, 2)), ds.images.std(axis=(0, 1, 2))


def with_indices(ds: ArrayDataset) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(images, labels, indices) triplets — the reference's inference-
    bookkeeping dataset variant (``utils/dataloader_infer.py:100-113``
    returns (x, y, index) per row)."""
    return ds.images, ds.labels, np.arange(len(ds), dtype=np.int64)


def get_dataset(cfg: Config, train: bool, target_label: Optional[int] = None) -> ArrayDataset:
    """Load a split as host numpy; mirrors ``get_dataloader``'s dataset
    selection incl. the ``target_label`` filter and the ``--debug`` 1000-row
    subset (reference ``utils/dataloader.py:98-123``)."""
    ds = None
    if not cfg.synthetic_data:
        if cfg.dataset == "cifar10":
            ds = _load_cifar10_bin(cfg.data_root, train) or _load_cifar10_torchvision(cfg.data_root, train)
        if ds is None:
            ds = _load_npz(cfg.data_root, cfg.dataset, train)
    if ds is None:
        if not cfg.synthetic_data:
            raise FileNotFoundError(
                f"no on-disk data for {cfg.dataset!r} under {cfg.data_root!r}; "
                "pass --synthetic_data for the deterministic synthetic fallback"
            )
        ds = synthetic_dataset(cfg, train)
    if target_label is not None:
        sel = ds.labels == target_label
        ds = ArrayDataset(ds.images[sel], ds.labels[sel])
    if cfg.debug:
        ds = ArrayDataset(ds.images[:1000], ds.labels[:1000])
    return ds
