"""Trigger-variant step tests (WaNet / input-aware / imperceptible /
multilabel + victim variants), with tiny stand-in models."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from combat_tpu.config import Config, apply_dataset_preset
from combat_tpu.train import init_frozen, init_train_state, multistep_lr, sgd_torch
from combat_tpu.train.variants import (
    make_imperceptible_train_step,
    make_inputaware_train_step,
    make_inputaware_victim_eval_step,
    make_multilabel_eval_step,
    make_multilabel_train_step,
    make_wanet_eval_step,
    make_wanet_train_step,
    make_wanet_victim_train_step,
    wanet_apply,
)


class TinyClassifier(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(8, (3, 3), strides=(2, 2), padding=1)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x).mean(axis=(1, 2))
        return nn.Dense(self.num_classes)(x)


class TinyGenerator(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return jnp.tanh(nn.Conv(3, (3, 3), padding=1)(x))


class TinyGridGenerator(nn.Module):
    s: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = nn.Conv(8, (3, 3), strides=(4, 4), padding=1)(x).mean(axis=(1, 2))
        f = nn.Dense(self.s * self.s * 2)(f)
        return jnp.tanh(f.reshape((-1, self.s, self.s, 2)))


class TinyCondGenerator(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, y, train: bool = False):
        emb = nn.Embed(self.num_classes, 3)(y)[:, None, None, :]
        return jnp.tanh(nn.Conv(3, (3, 3), padding=1)(x) + emb)


def make_cfg(**kw):
    return apply_dataset_preset(Config(dataset="cifar10", synthetic_data=True)).replace(**kw)


def setup(C, G, cond=False):
    x0 = jnp.zeros((1, 32, 32, 3))
    tx = sgd_torch(multistep_lr(0.01, (100,), 0.1, 10))
    extra = (jnp.zeros((1,), jnp.int32),) if cond else ()
    sC = init_train_state(C, jax.random.key(0), x0, tx)
    sG = init_train_state(G, jax.random.key(1), x0, tx, extra_args=extra)
    cm = init_frozen(C, jax.random.key(2), x0)
    nf = init_frozen(TinyClassifier(2), jax.random.key(3), x0)
    return sC, sG, cm, nf


def batch(n=8, k=10):
    x = jax.random.uniform(jax.random.key(4), (n, 32, 32, 3), minval=-1, maxval=1)
    y = jax.random.randint(jax.random.key(5), (n,), 0, k)
    return x, y


def test_wanet_apply_identity_flow_at_zero_rescale():
    x, _ = batch(2)
    flow = jnp.ones((2, 2, 2, 2)) * 0.5
    out, flow_up = wanet_apply(x, flow, grid_rescale=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=2e-5)
    assert flow_up.shape == (2, 32, 32, 2)


def test_wanet_train_and_eval_step():
    cfg = make_cfg(bs=8)
    C, G = TinyClassifier(), TinyGridGenerator(s=cfg.s)
    sC, sG, cm, nf = setup(C, G)
    step = jax.jit(make_wanet_train_step(cfg, C, G))
    x, y = batch()
    sC2, sG2, m = step(sC, sG, cm, nf, (x, y), jax.random.key(8))
    assert int(sC2.step) == 1 and int(sG2.step) == 1
    assert float(m["sample"]) == 8.0 and np.isfinite(float(m["loss_l2"]))
    ev = jax.jit(make_wanet_eval_step(cfg, C, G))
    em = ev({"params": sC2.params, "batch_stats": sC2.batch_stats}, sG2.params, cm, nf,
            (x, y, jnp.ones((8,), bool)), jax.random.key(9))
    assert float(em["clean_sample"]) == 8.0


def test_inputaware_cross_loss_and_metrics():
    cfg = make_cfg(bs=8)
    C, G = TinyClassifier(), TinyGenerator()
    sC, sG, cm, nf = setup(C, G)
    step = jax.jit(make_inputaware_train_step(cfg, C, G))
    x, y = batch()
    x2 = jnp.roll(x, 1, axis=0)
    sC2, sG2, m = step(sC, sG, cm, nf, (x, y, x2), jax.random.key(8))
    assert "cross_correct" in m and "loss_cross" in m
    assert np.isfinite(float(m["loss_cross"]))
    ev = jax.jit(make_inputaware_victim_eval_step(cfg, C, G))
    em = ev({"params": sC2.params, "batch_stats": sC2.batch_stats}, sG2.params,
            (x, y, x2, jnp.ones((8,), bool)), jax.random.key(9))
    assert "cross_correct" in em


def test_imperceptible_adds_tv_term():
    cfg = make_cfg(bs=8, tv_weight=1000.0)  # huge TV weight must change grads
    C, G = TinyClassifier(), TinyGenerator()
    sC, sG, cm, nf = setup(C, G)
    x, y = batch()
    step_tv = jax.jit(make_imperceptible_train_step(cfg, C, G))
    _, sG_tv, m = step_tv(sC, sG, cm, nf, (x, y), jax.random.key(8))
    assert "loss_tv" in m and float(m["loss_tv"]) > 0
    cfg0 = cfg.replace(tv_weight=0.0)
    step_0 = jax.jit(make_imperceptible_train_step(cfg0, C, G))
    _, sG_0, _ = step_0(sC, sG, cm, nf, (x, y), jax.random.key(8))
    a = np.asarray(jax.tree.leaves(sG_tv.params)[0])
    b = np.asarray(jax.tree.leaves(sG_0.params)[0])
    assert not np.allclose(a, b)


def test_multilabel_chunk_targets_and_eval():
    cfg = make_cfg(bs=10)
    C, G = TinyClassifier(), TinyCondGenerator()
    sC, sG, cm, nf = setup(C, G, cond=True)
    step = jax.jit(make_multilabel_train_step(cfg, C, G))
    x, y = batch(10)
    sC2, sG2, m = step(sC, sG, cm, nf, (x, y), jax.random.key(8))
    assert float(m["sample"]) == 10.0
    ev = jax.jit(make_multilabel_eval_step(cfg, C, G))
    em = ev({"params": sC2.params, "batch_stats": sC2.batch_stats}, sG2.params, cm, nf,
            (x, y, jnp.ones((10,), bool)), jax.random.key(9))
    # bd_sample counts non-target rows across all 10 class passes: 10*10 - 10
    assert float(em["bd_sample"]) == 90.0


def test_loss_only_metrics_trajectory_identical_across_variants():
    """``--train_metrics loss_only`` must leave every variant step's updated
    params bit-identical (the gated forwards are metric-only; see
    tests/test_attack_train.py for the base step)."""
    cases = [
        ("wanet", make_wanet_train_step, TinyGridGenerator(s=2), False, 2),
        ("inputaware", make_inputaware_train_step, TinyGenerator(), False, 3),
        ("imperceptible", make_imperceptible_train_step, TinyGenerator(), False, 2),
        ("multilabel", make_multilabel_train_step, TinyCondGenerator(), True, 2),
    ]
    x, y = batch()
    for name, factory, G, cond, arity in cases:
        C = TinyClassifier()
        sC, sG, cm, nf = setup(C, G, cond=cond)
        b = (x, y, jnp.roll(x, 1, axis=0)) if arity == 3 else (x, y)
        outs = []
        for mode in ("full", "loss_only"):
            cfg = make_cfg(bs=8, train_metrics=mode)
            sC2, sG2, m = jax.jit(factory(cfg, C, G))(sC, sG, cm, nf, b, jax.random.key(8))
            outs.append((sC2, sG2, m))
        (fC, fG, fm), (qC, qG, qm) = outs
        for a, b2 in zip(jax.tree.leaves((fC.params, fG.params)), jax.tree.leaves((qC.params, qG.params))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b2), err_msg=name)
        assert float(qm["F_correct"]) == 0.0 and float(qm["clean_correct"]) == 0.0, name
        np.testing.assert_array_equal(np.asarray(fm["loss_ce"]), np.asarray(qm["loss_ce"]), err_msg=name)


def test_wanet_victim_step():
    cfg = make_cfg(bs=8)
    C, G = TinyClassifier(), TinyGridGenerator(s=cfg.s)
    sC, sG, cm, nf = setup(C, G)
    step = jax.jit(make_wanet_victim_train_step(cfg, C, G))
    x, y = batch()
    poisoned = jnp.array([True] * 4 + [False] * 4)
    sC2, m = step(sC, sG.params, (x, y, poisoned), jax.random.key(8))
    assert float(m["sample"]) == 8.0 and int(sC2.step) == 1


def test_remat_step_matches_for_all_variants():
    """``--remat step`` must be trajectory-identical for every variant step
    (same contract as the base step,
    tests/test_attack_train.py::test_remat_step_is_trajectory_identical)."""
    x, y = batch()
    x2 = jnp.roll(x, 1, axis=0)
    cases = [
        (make_wanet_train_step, TinyGridGenerator(s=make_cfg().s), (x, y), False),
        (make_inputaware_train_step, TinyGenerator(), (x, y, x2), False),
        (make_imperceptible_train_step, TinyGenerator(), (x, y), False),
        (make_multilabel_train_step, TinyCondGenerator(), (x, y), True),
    ]
    for maker, G, b, cond in cases:
        cfg = make_cfg(bs=8)
        C = TinyClassifier()
        sC, sG, cm, nf = setup(C, G, cond=cond)
        outs = []
        for c in (cfg, cfg.replace(remat="step")):
            step = jax.jit(maker(c, C, G))
            a, g, m = step(sC, sG, cm, nf, b, jax.random.key(8))
            outs.append((a.params, g.params, m))
        for p, q in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
            np.testing.assert_allclose(np.asarray(p), np.asarray(q), rtol=1e-5, atol=1e-6)
