"""Attack semantics + fused train-step tests (SURVEY.md §4 rebuild plan):
target mapping, deterministic poison selection, gradient isolation between
the C-step and G-step, BN-stats threading, LR schedule parity, checkpoint
round-trip.  Tiny stand-in models keep compiles fast; the step logic is
model-agnostic."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from combat_tpu.attack import create_targets_bd
from combat_tpu.config import Config, apply_dataset_preset
from combat_tpu.data import poison_flags
from combat_tpu.train import (
    init_frozen,
    init_train_state,
    make_alternated_train_step,
    make_victim_train_step,
    multistep_lr,
    sgd_torch,
    train_epoch_alternated,
)


class TinyClassifier(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(8, (3, 3), strides=(2, 2), padding=1)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes)(x)


class TinyGenerator(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return jnp.tanh(nn.Conv(3, (3, 3), padding=1)(x))


def make_cfg(**kw):
    base = apply_dataset_preset(Config(dataset="cifar10", synthetic_data=True))
    return base.replace(**kw)


def test_create_targets_bd():
    y = jnp.array([0, 1, 9])
    np.testing.assert_array_equal(np.asarray(create_targets_bd(y, "all2one", 0, 10)), [0, 0, 0])
    np.testing.assert_array_equal(np.asarray(create_targets_bd(y, "all2all", 0, 10)), [1, 2, 0])


def test_poison_flags_deterministic_and_sized():
    labels = np.array([0, 0, 0, 0, 1, 1, 2, 0])
    f1 = poison_flags(labels, 0.5, target_label=0, seed=7)
    f2 = poison_flags(labels, 0.5, target_label=0, seed=7)
    np.testing.assert_array_equal(f1, f2)
    assert f1.sum() == int(0.5 * 5)  # 5 target-class rows -> 2 poisoned
    assert not f1[~(labels == 0)].any()  # only target-class rows poisoned
    f3 = poison_flags(labels, 0.5, target_label=0, seed=8)
    assert f1.sum() == f3.sum()
    # all2all poisons across all classes
    fa = poison_flags(labels, 0.5, target_label=0, attack_mode="all2all", seed=7)
    assert fa.sum() == 4


def _setup_states(cfg, key=0):
    C, G = TinyClassifier(cfg.num_classes), TinyGenerator()
    x0 = jnp.zeros((1, 32, 32, 3))
    tx = sgd_torch(multistep_lr(0.01, (100,), 0.1, 10))
    sC = init_train_state(C, jax.random.key(key), x0, tx)
    sG = init_train_state(G, jax.random.key(key + 1), x0, tx)
    cm = init_frozen(C, jax.random.key(key + 2), x0)
    nf = init_frozen(TinyClassifier(2), jax.random.key(key + 3), x0)
    return C, G, sC, sG, cm, nf


def test_alternated_step_updates_both_and_isolates_grads():
    cfg = make_cfg(bs=8)
    C, G, sC, sG, cm, nf = _setup_states(cfg)
    step = jax.jit(make_alternated_train_step(cfg, C, G))
    x = jax.random.uniform(jax.random.key(5), (8, 32, 32, 3), minval=-1, maxval=1)
    y = jax.random.randint(jax.random.key(6), (8,), 0, 10)
    cm_before = [np.array(a) for a in jax.tree.leaves(cm.params)]  # host copies
    sC2, sG2, m = step(sC, sG, cm, nf, (x, y), jax.random.key(7))
    # both nets stepped once
    assert int(sC2.step) == 1 and int(sG2.step) == 1
    # params actually changed
    assert not np.allclose(np.asarray(jax.tree.leaves(sC.params)[0]), np.asarray(jax.tree.leaves(sC2.params)[0]))
    assert not np.allclose(np.asarray(jax.tree.leaves(sG.params)[0]), np.asarray(jax.tree.leaves(sG2.params)[0]))
    # frozen nets untouched: compare the live buffers against host copies
    # taken BEFORE the step (catches in-place corruption via buffer donation)
    for a, b in zip(cm_before, jax.tree.leaves(cm.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    # BN stats updated by the C-step only (G-step runs C in eval mode)
    assert not np.allclose(
        np.asarray(jax.tree.leaves(sC.batch_stats)[0]), np.asarray(jax.tree.leaves(sC2.batch_stats)[0])
    )
    # metrics present and consistent
    assert float(m["sample"]) == 8.0
    assert 0.0 <= float(m["clean_correct"]) <= 8.0


def test_alternated_step_vjp_matches_double_forward():
    """The production step computes G(x) ONCE and pulls dL/d(noise) back
    through ``jax.vjp`` (train/steps.py).  The reference-shaped formulation
    runs a second G forward inside the G-loss (train_generator.py:186,223);
    both must produce the same updated params to fp tolerance."""
    from combat_tpu.train.steps import _apply_eval, _aug_fn, _trigger_fn, cross_entropy

    cfg = make_cfg(bs=8, pc=0.5)
    C, G, sC, sG, cm, nf = _setup_states(cfg)
    x = jax.random.uniform(jax.random.key(5), (8, 32, 32, 3), minval=-1, maxval=1)
    y = jax.random.randint(jax.random.key(6), (8,), 0, 10)
    key = jax.random.key(7)

    aug, trig = _aug_fn(cfg), _trigger_fn(cfg)

    def reference_shaped_step(stateC, stateG):
        """Old-style step: same PRNG layout, G forward re-run in loss_G."""
        bd_targets = create_targets_bd(y, cfg.attack_mode, cfg.target_label, cfg.num_classes)
        k = jax.random.split(key, 10)
        noise = G.apply({"params": jax.lax.stop_gradient(stateG.params)}, x)
        x_bd_c = trig(k[0], x, noise)
        is_target = y == bd_targets
        poison = is_target & jax.random.bernoulli(k[1], cfg.pc, y.shape)
        x_mix = aug(k[2], jnp.where(poison[:, None, None, None], x_bd_c, x))

        def loss_C(params):
            logits, mut = C.apply(
                {"params": params, "batch_stats": stateC.batch_stats}, x_mix, train=True, mutable=["batch_stats"]
            )
            return cross_entropy(logits, y), mut["batch_stats"]

        (_, new_bs), gradsC = jax.value_and_grad(loss_C, has_aux=True)(stateC.params)
        stateC = stateC.apply_gradients(gradsC, batch_stats=new_bs)
        varsC = {"params": stateC.params, "batch_stats": stateC.batch_stats}

        def loss_G(paramsG):
            nz = G.apply({"params": paramsG}, x)
            x_bd = trig(k[4], x, nz)
            pred_bd = C.apply(varsC, aug(k[5], x_bd), train=False)
            l_ce = cross_entropy(pred_bd, bd_targets)
            l_l2 = jnp.mean((x_bd - x) ** 2)
            cm_bd = _apply_eval(cm.apply_fn, cm.variables, aug(k[6], x_bd))
            return l_ce + cfg.L2_weight * l_l2 + cfg.clean_model_weight * cross_entropy(cm_bd, y)

        gradsG = jax.grad(loss_G)(stateG.params)
        return stateC, stateG.apply_gradients(gradsG)

    step = jax.jit(make_alternated_train_step(cfg, C, G))
    sC_new, sG_new, _ = step(sC, sG, cm, nf, (x, y), key)
    sC_old, sG_old = jax.jit(reference_shaped_step)(sC, sG)

    for a, b in zip(jax.tree.leaves(sG_new.params), jax.tree.leaves(sG_old.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(sC_new.params), jax.tree.leaves(sC_old.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_loss_only_metrics_mode_is_trajectory_identical():
    """``--train_metrics loss_only`` drops the metric-only forwards
    (clean_model(aug(x)), C(aug(x)), F(dct(x_bd)) — reference
    ``train_generator.py:214,227,245-247``) for throughput.  None feed
    gradients and PRNG subkeys are consumed by index, so two steps from the
    same state must produce bit-identical params in both modes; the gated
    metrics report 0 and the loss-carried metrics are unchanged."""
    cfg_full = make_cfg(bs=8, pc=0.5)
    cfg_fast = cfg_full.replace(train_metrics="loss_only")
    C, G, sC, sG, cm, nf = _setup_states(cfg_full)
    x = jax.random.uniform(jax.random.key(5), (8, 32, 32, 3), minval=-1, maxval=1)
    y = jax.random.randint(jax.random.key(6), (8,), 0, 10)

    def run(cfg):
        step = jax.jit(make_alternated_train_step(cfg, C, G))
        a, b, m = step(sC, sG, cm, nf, (x, y), jax.random.key(7))
        a, b, m2 = step(a, b, cm, nf, (x, y), jax.random.key(8))
        return a, b, m, m2

    fC, fG, fm, fm2 = run(cfg_full)
    qC, qG, qm, qm2 = run(cfg_fast)

    for a, b in zip(jax.tree.leaves((fC.params, fG.params, fC.batch_stats)),
                    jax.tree.leaves((qC.params, qG.params, qC.batch_stats))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in ("loss_ce", "loss_l2", "bd_correct", "clean_model_bd_ba", "clean_model_bd_asr"):
        np.testing.assert_array_equal(np.asarray(fm[k]), np.asarray(qm[k]))
        np.testing.assert_array_equal(np.asarray(fm2[k]), np.asarray(qm2[k]))
    for k in ("clean_correct", "F_correct", "clean_model_correct"):
        assert float(qm[k]) == 0.0 and float(qm2[k]) == 0.0


def test_remat_step_is_trajectory_identical():
    """``--remat step`` wraps each loss forward in ``jax.checkpoint`` so the
    backward recomputes activations instead of storing them (a bandwidth↔
    FLOPs trade on the HBM-bound step, PERF.md roofline).  Rematerialization
    replays the same ops on the same PRNG subkeys, so params, batch stats,
    and every metric must match the un-rematted step to fp tolerance."""
    cfg_none = make_cfg(bs=8, pc=0.5)
    cfg_remat = cfg_none.replace(remat="step")
    C, G, sC, sG, cm, nf = _setup_states(cfg_none)
    x = jax.random.uniform(jax.random.key(5), (8, 32, 32, 3), minval=-1, maxval=1)
    y = jax.random.randint(jax.random.key(6), (8,), 0, 10)

    def run(cfg):
        step = jax.jit(make_alternated_train_step(cfg, C, G))
        a, b, m = step(sC, sG, cm, nf, (x, y), jax.random.key(7))
        a, b, m2 = step(a, b, cm, nf, (x, y), jax.random.key(8))
        return a, b, m, m2

    nC, nG, nm, nm2 = run(cfg_none)
    rC, rG, rm, rm2 = run(cfg_remat)
    for a, b in zip(
        jax.tree.leaves((nC.params, nG.params, nC.batch_stats)),
        jax.tree.leaves((rC.params, rG.params, rC.batch_stats)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    for k in nm:
        np.testing.assert_allclose(np.asarray(nm[k]), np.asarray(rm[k]), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(nm2[k]), np.asarray(rm2[k]), rtol=1e-5, atol=1e-6)


def test_remat_victim_and_clean_steps_match():
    """Same exactness contract for the clean-classifier and victim steps."""
    from combat_tpu.train.steps import make_clean_train_step, make_victim_train_step

    cfg_none = make_cfg(bs=8, pc=0.5)
    cfg_remat = cfg_none.replace(remat="step")
    C, G, sC, sG, cm, nf = _setup_states(cfg_none)
    x = jax.random.uniform(jax.random.key(5), (8, 32, 32, 3), minval=-1, maxval=1)
    y = jax.random.randint(jax.random.key(6), (8,), 0, 10)
    poisoned = jax.random.bernoulli(jax.random.key(9), 0.3, (8,))

    outs = []
    for cfg in (cfg_none, cfg_remat):
        c_step = jax.jit(make_clean_train_step(cfg, C))
        v_step = jax.jit(make_victim_train_step(cfg, C, G))
        a, mc = c_step(sC, (x, y), jax.random.key(7))
        b, mv = v_step(sC, sG.params, (x, y, poisoned), jax.random.key(8))
        outs.append((a.params, mc, b.params, mv))
    for a, b in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_alternated_epoch_loss_decreases():
    cfg = make_cfg(bs=8, pc=0.5)
    C, G, sC, sG, cm, nf = _setup_states(cfg)
    step = make_alternated_train_step(cfg, C, G)
    from combat_tpu.data import synthetic_dataset

    ds = synthetic_dataset(cfg, True, n=64)
    imgs, labs = jnp.asarray(ds.images), jnp.asarray(ds.labels)
    losses = []
    for e in range(4):
        sC, sG, m = train_epoch_alternated(step, sC, sG, cm, nf, imgs, labs, jax.random.key(e), 8)
        losses.append(float(m["loss_ce"]) / 8.0)
    assert losses[-1] < losses[0], losses


def test_train_epoch_covers_ragged_tail():
    """drop_last=False parity: a 19-row dataset at bs=8 trains on all 19 rows
    (2 full batches in the scan + one 3-row tail step) and advances the
    optimizer 3 times."""
    cfg = make_cfg(bs=8, pc=0.5)
    C, G, sC, sG, cm, nf = _setup_states(cfg)
    step = make_alternated_train_step(cfg, C, G)
    from combat_tpu.data import synthetic_dataset

    ds = synthetic_dataset(cfg, True, n=19)
    imgs, labs = jnp.asarray(ds.images), jnp.asarray(ds.labels)
    sC2, sG2, m = train_epoch_alternated(step, sC, sG, cm, nf, imgs, labs, jax.random.key(0), 8)
    assert float(m["sample"]) == 19.0
    assert int(sC2.step) - int(sC.step) == 3


def test_victim_step_uses_mask_not_dropping_rows():
    """The fixed version of reference train_victim.py:121: all rows train;
    poisoned rows get (trigger, bd_target), others (clean, y)."""
    cfg = make_cfg(bs=8, attack_mode="all2all")  # all2all makes bd labels != y
    C, G, sC, sG, cm, nf = _setup_states(cfg)
    step = jax.jit(make_victim_train_step(cfg, C, G))
    x = jax.random.uniform(jax.random.key(1), (8, 32, 32, 3), minval=-1, maxval=1)
    y = jnp.zeros((8,), jnp.int32)
    poisoned = jnp.array([True, False] * 4)
    sC2, m = step(sC, sG.params, (x, y, poisoned), jax.random.key(2))
    assert float(m["sample"]) == 8.0  # every row contributes
    assert int(sC2.step) == 1


def test_multistep_lr_matches_torch_semantics():
    sched = multistep_lr(1e-2, (100, 150), 0.1, steps_per_epoch=10)
    assert np.isclose(float(sched(0)), 1e-2)
    assert np.isclose(float(sched(999)), 1e-2)  # epoch 99
    assert np.isclose(float(sched(1000)), 1e-3)  # epoch 100 crossed
    assert np.isclose(float(sched(1500)), 1e-4)  # epoch 150 crossed
    assert np.isclose(float(sched(1999)), 1e-4)


def test_checkpoint_roundtrip(tmp_path):
    from combat_tpu.checkpoint import load_checkpoint, save_checkpoint

    payload = {
        "netC": {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}},
        "best_clean_acc": 93.4,
        "epoch_current": 7,
    }
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, payload)
    out = load_checkpoint(path)
    np.testing.assert_array_equal(out["netC"]["params"]["w"], payload["netC"]["params"]["w"])
    assert float(out["best_clean_acc"]) == 93.4 and int(out["epoch_current"]) == 7
    # overwrite with new best (the save gate re-saves to the same path)
    payload["best_clean_acc"] = 95.0
    save_checkpoint(path, payload)
    assert float(load_checkpoint(path)["best_clean_acc"]) == 95.0


def test_best_gates():
    from combat_tpu.checkpoint import best_gate_attack, best_gate_clean

    assert best_gate_clean(90.0, 89.0) and not best_gate_clean(89.0, 89.0)
    assert best_gate_attack(90.0, 10.0, 89.0, 99.0)  # higher clean wins
    assert best_gate_attack(89.0, 99.5, 89.0, 99.0)  # tie on clean, higher bd
    assert not best_gate_attack(89.0, 98.0, 89.0, 99.0)


def test_synthetic_size_override():
    """--synthetic_size N caps the splits at N train / N//5 test rows (the
    knob that makes 224px full pipelines tractable on one chip)."""
    from combat_tpu.data import synthetic_dataset

    cfg = make_cfg(bs=8).replace(synthetic_size=40)
    assert len(synthetic_dataset(cfg, True)) == 40
    assert len(synthetic_dataset(cfg, False)) == 8
    # explicit n still wins; 0 keeps the CIFAR-scale default
    assert len(synthetic_dataset(cfg, True, n=16)) == 16
    assert len(synthetic_dataset(cfg.replace(synthetic_size=0), False)) == 10000


def test_synthetic_label_noise_train_only_images_unchanged():
    """--synthetic_label_noise p flips ~p of TRAIN labels to a random other
    class (the STRIP-calibration lever, Config.synthetic_label_noise); images
    and the test split must be untouched so every other metric stays
    comparable."""
    import numpy as np

    from combat_tpu.data import synthetic_dataset

    cfg = make_cfg(bs=8).replace(synthetic_size=2000, synthetic_label_noise=0.1)
    base = cfg.replace(synthetic_label_noise=0.0)
    tr, tr0 = synthetic_dataset(cfg, True), synthetic_dataset(base, True)
    flipped = (tr.labels != tr0.labels).mean()
    assert 0.07 < flipped < 0.13, flipped
    # flips go to a DIFFERENT class, never the original
    assert (tr.labels[tr.labels != tr0.labels] != tr0.labels[tr.labels != tr0.labels]).all()
    np.testing.assert_array_equal(tr.images, tr0.images)
    te, te0 = synthetic_dataset(cfg, False), synthetic_dataset(base, False)
    np.testing.assert_array_equal(te.labels, te0.labels)
    np.testing.assert_array_equal(te.images, te0.images)


def test_smooth_fft_path_matches_loop():
    """The Fourier fast path for large pass counts (resolution-scaled 64/224px
    synthetic datasets) must reproduce the literal 5-point diffusion loop."""
    import numpy as np

    from combat_tpu.data.datasets import _smooth

    x = np.random.RandomState(0).randn(2, 24, 20, 3).astype(np.float32)
    loop = x.copy()
    for _ in range(9):
        loop = (
            loop
            + np.roll(loop, 1, -3) + np.roll(loop, -1, -3)
            + np.roll(loop, 1, -2) + np.roll(loop, -1, -2)
        ) / 5.0
    loop = loop / (np.abs(loop).max(axis=(-3, -2, -1), keepdims=True) + 1e-8)
    fft = _smooth(x, passes=9)  # > 8 routes through the FFT branch
    np.testing.assert_allclose(fft, loop, atol=1e-5)


def test_synthetic_class_signal_survives_resolution_scaling():
    """At 64px the templates' diffusion passes scale with pixel area; a
    shift-invariant spectral template matcher must stay well above chance
    (the 224px pre-fix failure mode was chance-level learnability —
    quality_logs/quality_imagenet10_r3.log)."""
    import numpy as np

    from combat_tpu.config import Config, apply_dataset_preset
    from combat_tpu.data.datasets import _smooth, synthetic_dataset

    cfg = apply_dataset_preset(Config(dataset="celeba", synthetic_size=600))
    ds = synthetic_dataset(cfg, train=False)
    h, w, k, modes = cfg.input_height, cfg.input_width, cfg.num_classes, 4
    scale = max(1, round((h * w) / (32 * 32)))
    raw = np.random.RandomState(999).randn(k, modes, h, w, 3).astype(np.float32)
    t = _smooth(raw, passes=1 * scale) - _smooth(raw, passes=4 * scale)
    n = 120
    xs = np.abs(np.fft.rfft2(ds.images[:n], axes=(1, 2))).reshape(n, -1)
    ts = np.abs(np.fft.rfft2(t, axes=(2, 3))).reshape(k * modes, -1)
    xs /= np.linalg.norm(xs, axis=1, keepdims=True)
    ts /= np.linalg.norm(ts, axis=1, keepdims=True)
    acc = ((xs @ ts.T).argmax(1) // modes == ds.labels[:n]).mean()
    assert acc > 2.0 / k, acc  # measured ~0.35 vs chance 0.125


def test_uint8_residency_matches_float32_run():
    """u8-resident splits (cli/common.device_dataset for >1GB datasets) must
    train identically to an f32 split holding the same dequantized values."""
    import jax
    import jax.numpy as jnp

    from combat_tpu.models import get_classifier
    from combat_tpu.train import (
        dequantize,
        gather_batch,
        init_train_state,
        multistep_lr,
        sgd_torch,
        train_epoch_classifier,
    )
    from combat_tpu.train.steps import make_clean_train_step

    cfg = make_cfg(bs=8)
    u8 = jax.random.randint(jax.random.key(0), (24, 32, 32, 3), 0, 256, dtype=jnp.uint8)
    f32 = dequantize(u8)
    assert float(jnp.abs(gather_batch(u8, jnp.arange(4)) - f32[:4]).max()) == 0.0
    labels = jax.random.randint(jax.random.key(1), (24,), 0, cfg.num_classes)

    C = get_classifier(cfg)
    tx = sgd_torch(multistep_lr(cfg.lr_C, cfg.schedulerC_milestones, cfg.schedulerC_lambda, 3))
    step = make_clean_train_step(cfg, C)
    outs = []
    for images in (u8, f32):
        state = init_train_state(C, jax.random.key(2), f32[:1], tx)
        state, m = train_epoch_classifier(step, state, None, images, labels, None, jax.random.key(3), 8)
        outs.append((m, state.params))
    # inputs are bit-equal (asserted above); the in-graph uint8->f32 convert
    # shifts XLA fusion boundaries, so accumulations reassociate ~1e-5
    assert jnp.allclose(outs[0][0]["loss_ce"], outs[1][0]["loss_ce"], rtol=1e-4)
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), outs[0][1], outs[1][1])
    assert max(jax.tree.leaves(diffs)) < 1e-3


def test_device_dataset_u8_quantization_blocked(monkeypatch):
    """device_dataset's block-quantized u8 path must equal the single-shot
    expression clip(round((x+1)*127.5)) for the whole split (the blocking
    exists only to bound host-RAM temporaries on >1GB corpora)."""
    import jax.numpy as jnp

    from combat_tpu.cli import common as cc

    cfg = make_cfg(bs=8).replace(synthetic_size=40)
    ds = cc.get_dataset(cfg, train=True)
    monkeypatch.setattr(cc, "_U8_RESIDENCY_BYTES", 0)  # force the u8 branch
    # tiny block size => exercises multi-block assembly, not just one pass
    monkeypatch.setattr(cc, "_QUANT_BLOCK_BYTES", ds.images[0].nbytes * 7)
    images, labels, _ = cc.device_dataset(cfg, cc.make_mesh(1, "data"), train=True)
    assert images.dtype == jnp.uint8
    want = np.clip(np.round((ds.images + 1.0) * 127.5), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(images), want)
