"""Defense-suite tests: STRIP entropy separation, Neural Cleanse mask
recovery + MAD verdict, fine-pruning mask equivalence, Grad-CAM shapes,
frequency-detector corruptions."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from combat_tpu.config import Config, apply_dataset_preset
from combat_tpu.defenses.fine_pruning import channel_activations, chunked_mask_eval
from combat_tpu.defenses.frequency import corrupt_one, dct_features_01, make_detector_train_step
from combat_tpu.defenses.gradcam import gradcam, guided_backprop
from combat_tpu.defenses.neural_cleanse import outlier_detection, raw_mask, raw_pattern
from combat_tpu.defenses.strip import strip_verdict, superimpose_entropy
from combat_tpu.models.layers import guided_relu
from combat_tpu.models.preact_resnet import preact_resnet18


def make_cfg(**kw):
    return apply_dataset_preset(Config(dataset="cifar10", synthetic_data=True)).replace(**kw)


class TinyClassifier(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(8, (3, 3), strides=(2, 2), padding=1)(x)
        x = nn.relu(x).mean(axis=(1, 2))
        return nn.Dense(self.num_classes)(x)


def test_strip_entropy_and_verdict():
    C = TinyClassifier()
    x0 = jnp.zeros((1, 32, 32, 3))
    varsC = C.init({"params": jax.random.key(0)}, x0)
    bg = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3), minval=-1, maxval=1)
    pool = jax.random.uniform(jax.random.key(2), (64, 32, 32, 3), minval=-1, maxval=1)
    ent = superimpose_entropy(C.apply, varsC, bg, pool, jax.random.key(3), n_sample=16)
    assert ent.shape == (4,)
    assert np.all(np.asarray(ent) >= 0)
    m, verdict = strip_verdict([0.1], [0.5, 0.9], boundary=0.2)
    assert verdict and np.isclose(m, 0.1)
    m2, verdict2 = strip_verdict([0.5], [0.6], boundary=0.2)
    assert not verdict2


def test_neural_cleanse_mask_parameterization_and_mad():
    m = raw_mask(jnp.zeros((4, 4)))
    np.testing.assert_allclose(np.asarray(m), 0.5, atol=1e-6)
    assert float(raw_pattern(jnp.full((2, 2, 3), 100.0)).max()) <= 1.0
    # MAD: one tiny-mask outlier among big masks → backdoored
    verdict = outlier_detection(np.array([100.0, 98.0, 102.0, 99.0, 101.0, 100.5, 97.0, 3.0, 99.5, 100.2]))
    assert verdict["backdoored"]
    verdict2 = outlier_detection(np.array([100.0, 98.0, 102.0, 99.0, 101.0]))
    assert not verdict2["backdoored"]


def test_fine_pruning_mask_equivalence():
    """Masking layer4 output channels must equal dropping them from the
    linear input (the reference's module surgery)."""
    C = preact_resnet18(10)
    x = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3), minval=-1, maxval=1)
    varsC = C.init({"params": jax.random.key(1)}, x)
    mask = jnp.ones((512,)).at[:100].set(0.0)
    logits_masked = C.apply(varsC, x, train=False, channel_mask=mask)
    # manual equivalent: zero the corresponding linear rows' inputs
    logits_full, feats = C.apply(varsC, x, train=False, capture_features=True)
    pooled = nn.avg_pool(feats["layer4"] * mask, (4, 4), (4, 4)).reshape(2, -1)
    w = varsC["params"]["linear"]["kernel"]
    b = varsC["params"]["linear"]["bias"]
    np.testing.assert_allclose(np.asarray(logits_masked), np.asarray(pooled @ w + b), rtol=1e-4, atol=1e-4)
    acts = channel_activations(C, varsC, x, bs=2)
    assert acts.shape == (512,)


def test_chunked_mask_eval_is_chunk_invariant():
    """The fine-pruning sweep's chunked dispatch (pad with the last mask,
    map per chunk, slice) must return the same results for ANY chunk size,
    including non-dividing ones and chunk > n_masks (--fp_mask_chunk)."""
    masks = jnp.arange(13, dtype=jnp.float32).reshape(13, 1)
    scale = jnp.float32(2.0)

    def eval_with_mask(mask, scale):
        return jnp.stack([mask.sum() * scale, mask.sum() + scale])

    ref = chunked_mask_eval(eval_with_mask, masks, 13, scale)
    assert ref.shape == (13, 2)
    for chunk in (1, 4, 5, 57):
        out = chunked_mask_eval(eval_with_mask, masks, chunk, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_gradcam_shapes_and_range():
    C = preact_resnet18(10)
    x = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3), minval=-1, maxval=1)
    varsC = C.init({"params": jax.random.key(1)}, x)
    cam = gradcam(C, varsC, x, target_index=0)
    assert cam.shape == (2, 32, 32)
    assert float(cam.min()) >= 0.0 and float(cam.max()) <= 1.0 + 1e-6


def test_guided_relu_blocks_negative_grads():
    g = jax.grad(lambda x: guided_relu(x).sum())(jnp.array([-1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(g), [0.0, 1.0])
    # negative upstream gradient blocked even at positive activation
    g2 = jax.grad(lambda x: (-guided_relu(x)).sum())(jnp.array([3.0]))
    np.testing.assert_allclose(np.asarray(g2), [0.0])
    gb = guided_backprop(
        lambda: preact_resnet18(10, act=guided_relu),
        preact_resnet18(10).init({"params": jax.random.key(0)}, jnp.zeros((1, 32, 32, 3))),
        jnp.zeros((1, 32, 32, 3)),
    )
    assert gb.shape == (1, 32, 32, 3)


def test_combine_images_collage(tmp_path):
    """Neural-Cleanse trigger collage (reference combine_images.py analog):
    per-label [mask|pattern|applied] columns joined with white gaps."""
    import numpy as np

    from combat_tpu.defenses.combine_images import build_collage, main

    h = w = 8
    for lab in range(3):
        np.save(tmp_path / f"mask_{lab}.npy", np.random.rand(h, w).astype(np.float32))
        np.save(tmp_path / f"pattern_{lab}.npy", np.random.rand(h, w, 3).astype(np.float32))
    collage = build_collage(str(tmp_path))
    assert collage.shape == (3 * h + 2, 3 * (w + 1) - 1, 3) and collage.dtype == np.uint8
    out = main(["--result", str(tmp_path)])
    with open(out, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_frequency_corruptions_and_step():
    key = jax.random.key(0)
    img = jax.random.uniform(jax.random.key(1), (32, 32, 3))
    blend = jax.random.uniform(jax.random.key(2), (32, 32, 3))
    out = corrupt_one(key, img, blend)
    assert out.shape == img.shape
    assert not np.allclose(np.asarray(out), np.asarray(img))  # some corruption applied
    feats = dct_features_01(img[None])
    assert feats.shape == (1, 32, 32, 3)

    from combat_tpu.train import init_train_state
    import optax

    C = TinyClassifier(2)
    tx = optax.adadelta(0.05)
    state = init_train_state(C, key, jnp.zeros((1, 32, 32, 3)), tx)
    step = jax.jit(make_detector_train_step(C, tx))
    x01 = jax.random.uniform(jax.random.key(3), (8, 32, 32, 3))
    state2, m = step(state, (x01, jnp.zeros((8,), jnp.int32)), jax.random.key(4))
    assert float(m["sample"]) == 16.0  # clean + poisoned twins
    assert int(state2.step) == 1
