"""Frequency-based backdoor detector: training on synthetic corruptions and
testing against the COMBAT trigger.

Parity targets: reference ``defenses/frequency_based/train.py`` — per batch,
each image gets a poisoned twin via one of 5 random corruptions
(``patching_train:106-143``): white patch, random patch, Gaussian noise
(albumentations GaussNoise mean=25 var∈[10,70], ``:49-53``), random shadow
(``:56-61``), or 0.3-blend with another train image; clean=0/poisoned=1
labels; per-channel DCT-II of the uint8-cast image (``:195-197``); Adadelta
lr 0.05 wd 1e-4 for the "original" backbone, Adam lr 0.02 for the
alternatives (``get_model:146-175``); best-acc checkpoint
``checkpoints/<dataset>/<model>/<dataset>_<model>_detector`` (``:310-311``).
And ``test.py:67-108`` — detector accuracy + detection rate on
generator-triggered images.

TPU-native redesign: all five corruptions are PRNG-keyed pure functions
evaluated on-device (every variant computed, one selected per image with
``where`` — branch-free, fuses under XLA).  The shadow corruption rasterizes
a random convex quadrilateral via half-plane masks and darkens it — a
simplified analog of albumentations' polygon shadow (documented divergence;
SURVEY.md §2.4).  Images here are in [0, 1] (the reference's frequency
dataloader convention, ``train.py:301-302``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.dct import dct_2d


def dct_features_01(x01: jnp.ndarray) -> jnp.ndarray:
    """Per-channel DCT of the uint8-cast [0,1] image (train.py:195-197)."""
    q = (x01 * 255.0).astype(jnp.uint8).astype(x01.dtype)
    return dct_2d(q)


def _block_mask(key, h, w, dtype):
    """Random patch rectangle: size U{2..7}², margin U{0..5}, corner U{0..3}
    (train.py:112-141)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ph = jax.random.randint(k1, (), 2, 8)
    pw = jax.random.randint(k2, (), 2, 8)
    margin = jax.random.randint(k3, (), 0, 6)
    corner = jax.random.randint(k4, (), 0, 4)
    r0 = jnp.where((corner == 0) | (corner == 1), margin, h - margin - ph)
    c0 = jnp.where((corner == 0) | (corner == 2), margin, w - margin - pw)
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    mask = (rows >= r0) & (rows < r0 + ph) & (cols >= c0) & (cols < c0 + pw)
    return mask[:, :, None].astype(dtype)


def _shadow_mask(key, h, w, dtype):
    """Random convex quadrilateral via intersection of 4 half-planes."""
    ks = jax.random.split(key, 2)
    cx = jax.random.uniform(ks[0], (), minval=0.2, maxval=0.8) * w
    cy = jax.random.uniform(ks[1], (), minval=0.2, maxval=0.8) * h
    angles = jnp.arange(4) * (jnp.pi / 2.0) + jax.random.uniform(key, (4,), minval=-0.5, maxval=0.5)
    dists = jax.random.uniform(jax.random.fold_in(key, 1), (4,), minval=0.15, maxval=0.45) * (h + w) / 2.0
    rows = jnp.arange(h)[:, None] - cy
    cols = jnp.arange(w)[None, :] - cx
    inside = jnp.ones((h, w), bool)
    for i in range(4):
        inside &= (jnp.cos(angles[i]) * cols + jnp.sin(angles[i]) * rows) <= dists[i]
    return inside[:, :, None].astype(dtype)


def corrupt_one(key: jax.Array, img: jnp.ndarray, blend_img: jnp.ndarray) -> jnp.ndarray:
    """One random corruption of a single [0,1] HWC image."""
    h, w, c = img.shape
    k_sel, k_blk, k_fill, k_noise, k_var, k_shadow = jax.random.split(key, 6)
    attack = jax.random.randint(k_sel, (), 0, 5)

    mask = _block_mask(k_blk, h, w, img.dtype)
    white = img * (1 - mask) + mask  # attack 0
    randblk = img * (1 - mask) + mask * jax.random.uniform(k_fill, img.shape)  # attack 1
    var = jax.random.uniform(k_var, (), minval=10.0, maxval=70.0)
    noise = (jax.random.normal(k_noise, img.shape) * jnp.sqrt(var) + 25.0) / 255.0
    noisy = jnp.clip(img + noise, 0.0, 1.0)  # attack 2 (GaussNoise mean=25)
    sh = _shadow_mask(k_shadow, h, w, img.dtype)
    shadowed = img * (1.0 - 0.5 * sh)  # attack 3 (simplified RandomShadow)
    blended = jnp.minimum(img + 0.3 * blend_img, 1.0)  # attack 4

    out = jnp.where(attack == 0, white, img)
    out = jnp.where(attack == 1, randblk, out)
    out = jnp.where(attack == 2, noisy, out)
    out = jnp.where(attack == 3, shadowed, out)
    out = jnp.where(attack == 4, blended, out)
    return out


def make_detector_train_step(C, tx):
    """Fused step: corrupt half-batch, featurize, CE on clean/poisoned labels."""
    import optax

    from ..train.steps import cross_entropy

    def step(state, batch, key):
        x01, _ = batch  # labels unused — detector labels are clean/poisoned
        n = x01.shape[0]
        k_corrupt, k_drop = jax.random.split(key)
        blend_idx = jax.random.randint(jax.random.fold_in(key, 2), (n,), 0, n)
        poi = jax.vmap(corrupt_one)(jax.random.split(k_corrupt, n), x01, x01[blend_idx])
        xx = jnp.concatenate([x01, poi], axis=0)
        yy = jnp.concatenate([jnp.zeros((n,), jnp.int32), jnp.ones((n,), jnp.int32)])
        feats = dct_features_01(xx)

        def loss_fn(params):
            logits, mut = C.apply(
                {"params": params, "batch_stats": state.batch_stats}, feats, train=True,
                mutable=["batch_stats"], rngs={"dropout": k_drop},
            )
            return cross_entropy(logits, yy), (mut["batch_stats"], logits)

        (loss, (new_bs, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, batch_stats=new_bs)
        return state, {
            "sample": jnp.asarray(2 * n, jnp.float32),
            "loss_ce": loss,
            "correct": jnp.sum(jnp.argmax(logits, -1) == yy).astype(jnp.float32),
        }

    return step


def make_detector_eval_step(C):
    def step(varsC, batch, key):
        x01, _, valid = batch
        n = x01.shape[0]
        blend_idx = jax.random.randint(jax.random.fold_in(key, 2), (n,), 0, n)
        poi = jax.vmap(corrupt_one)(jax.random.split(key, n), x01, x01[blend_idx])
        xx = jnp.concatenate([x01, poi], axis=0)
        yy = jnp.concatenate([jnp.zeros((n,), jnp.int32), jnp.ones((n,), jnp.int32)])
        vv = jnp.concatenate([valid, valid]).astype(jnp.float32)
        logits = C.apply(varsC, dct_features_01(xx), train=False)
        return {
            "sample": vv.sum(),
            "correct": (vv * (jnp.argmax(logits, -1) == yy)).sum(),
        }

    return step


def make_trigger_test_step(cfg, C_det, G):
    """Detector vs the COMBAT trigger (reference test.py:67-108): half batch
    clean, half triggered by G; reports accuracy and detection rate."""
    from ..attack.triggers import additive_trigger
    from ..ops.dct import detector_features

    def step(vars_det, paramsG, batch, key):
        x, _, valid = batch  # x in [-1, 1] here (main loader convention)
        x_bd = additive_trigger(
            key, x, G.apply({"params": paramsG}, x),
            image_size=cfg.input_height, ratio=cfg.ratio, noise_rate=cfg.noise_rate,
            kernel_size=cfg.kernel_size, sigma=cfg.sigma,
        )
        vf = valid.astype(jnp.float32)
        logits_clean = C_det.apply(vars_det, detector_features(x), train=False)
        logits_bd = C_det.apply(vars_det, detector_features(x_bd), train=False)
        return {
            "sample": vf.sum(),
            "clean_correct": (vf * (jnp.argmax(logits_clean, -1) == 0)).sum(),
            "detected": (vf * (jnp.argmax(logits_bd, -1) == 1)).sum(),
        }

    return step
