"""Chunked epoch scans are numerically identical to the whole-epoch scan.

``scan_chunk`` exists because the shared-TPU tunnel kills the worker on
multi-minute single XLA executions (config.py scan_chunk note); these tests
pin the invariant that chunking only changes *dispatch granularity*: same
permutation, same per-step PRNG subkeys, same tail handling, same final
states and metric sums (up to fp summation reordering of the loss terms).
Covers every runner: alternated, alternated-pair, classifier (clean +
poisoned), and eval (with/without key, with/without pair), including ragged
tails and a chunk size that does not divide the step count.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from combat_tpu.config import Config, apply_dataset_preset
from combat_tpu.train import (
    eval_epoch,
    init_frozen,
    init_train_state,
    make_alternated_train_step,
    make_victim_train_step,
    multistep_lr,
    sgd_torch,
    train_epoch_alternated,
    train_epoch_classifier,
)
from combat_tpu.train.loop import padded_eval_batches, train_epoch_alternated_pair


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
    return base.replace(bs=8, kernel_size=3, **kw)


def _setup(cfg, key=0):
    C, G = TinyClassifier(cfg.num_classes), TinyGenerator()
    x0 = jnp.zeros((1, 32, 32, 3))
    tx = sgd_torch(multistep_lr(0.01, (100,), 0.1, 10))
    sC = init_train_state(C, jax.random.key(key), x0, tx)
    sG = init_train_state(G, jax.random.key(key + 1), x0, tx)
    cm = init_frozen(C, jax.random.key(key + 2), x0)
    nf = init_frozen(TinyClassifier(2), jax.random.key(key + 3), x0)
    return C, G, sC, sG, cm, nf


def _data(n, key=42, dtype="float32"):
    k1, k2 = jax.random.split(jax.random.key(key))
    if dtype == "uint8":
        imgs = jax.random.randint(k1, (n, 32, 32, 3), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
    else:
        imgs = jax.random.uniform(k1, (n, 32, 32, 3), minval=-1.0, maxval=1.0)
    labs = jax.random.randint(k2, (n,), 0, 10)
    return imgs, labs


def _assert_tree_close(a, b, rtol=1e-6, atol=1e-6):
    flat_a, _ = jax.tree_util.tree_flatten_with_path(a)
    flat_b = jax.tree_util.tree_leaves(b)
    for (path, la), lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=rtol, atol=atol,
                                   err_msg=jax.tree_util.keystr(path))


def test_alternated_chunked_matches_whole_with_tail_and_uint8():
    cfg = make_cfg()
    C, G, sC, sG, cm, nf = _setup(cfg)
    step = make_alternated_train_step(cfg, C, G)
    imgs, labs = _data(37, dtype="uint8")  # 4 full batches of 8 + tail of 5
    key = jax.random.key(9)
    sC0, sG0, m0 = train_epoch_alternated(step, sC, sG, cm, nf, imgs, labs, key, cfg.bs)
    sC3, sG3, m3 = train_epoch_alternated(step, sC, sG, cm, nf, imgs, labs, key, cfg.bs, chunk=3)
    _assert_tree_close((sC0.params, sC0.batch_stats, sG0.params), (sC3.params, sC3.batch_stats, sG3.params))
    _assert_tree_close(m0, m3, rtol=1e-5)
    assert int(sC3.step) == int(sC0.step) == 5
    # chunk larger than the epoch degenerates to one segment
    sCb, sGb, mb = train_epoch_alternated(step, sC, sG, cm, nf, imgs, labs, key, cfg.bs, chunk=100)
    _assert_tree_close((sC0.params, sG0.params), (sCb.params, sGb.params))
    _assert_tree_close(m0, mb, rtol=1e-5)


def test_alternated_pair_chunked_matches_whole():
    cfg = make_cfg()
    _, _, sC, sG, cm, nf = _setup(cfg)

    # lightweight pair step with the production signature; exercises both
    # index streams and the PRNG fold
    def pair_step(stateC, stateG, clean_model, netF, batch, key):
        x, y, x2 = batch
        bump = (x.mean() + x2.mean() + jax.random.uniform(key, ())) * 1e-3
        stateC = stateC.replace(
            params=jax.tree.map(lambda p: p + bump, stateC.params), step=stateC.step + 1
        )
        stateG = stateG.replace(params=jax.tree.map(lambda p: p - bump, stateG.params))
        return stateC, stateG, {"sample": jnp.float32(x.shape[0]), "ysum": y.sum().astype(jnp.float32)}

    imgs, labs = _data(29)  # 3 full batches + tail of 5
    key = jax.random.key(3)
    sC0, sG0, m0 = train_epoch_alternated_pair(pair_step, sC, sG, cm, nf, imgs, labs, key, cfg.bs)
    sC2, sG2, m2 = train_epoch_alternated_pair(pair_step, sC, sG, cm, nf, imgs, labs, key, cfg.bs, chunk=2)
    _assert_tree_close((sC0.params, sG0.params), (sC2.params, sG2.params))
    _assert_tree_close(m0, m2, rtol=1e-5)


def test_classifier_poisoned_chunked_matches_whole():
    cfg = make_cfg()
    C, G, sC, sG, cm, nf = _setup(cfg)
    step = make_victim_train_step(cfg, C, G)
    imgs, labs = _data(26)  # 3 full batches + tail of 2
    poisoned = (jnp.arange(26) % 4) == 0
    key = jax.random.key(11)
    s0, m0 = train_epoch_classifier(step, sC, sG.params, imgs, labs, poisoned, key, cfg.bs, has_poison=True)
    s2, m2 = train_epoch_classifier(step, sC, sG.params, imgs, labs, poisoned, key, cfg.bs, has_poison=True, chunk=2)
    _assert_tree_close((s0.params, s0.batch_stats), (s2.params, s2.batch_stats))
    _assert_tree_close(m0, m2, rtol=1e-5)


def test_eval_chunked_matches_whole_all_modes():
    cfg = make_cfg()
    imgs, labs = _data(21)
    eidx, evalid = padded_eval_batches(21, cfg.bs)
    eidx, evalid = jnp.asarray(eidx), jnp.asarray(evalid)
    key = jax.random.key(5)

    def eval_step_key(w, batch, k):
        x, y, vd = batch
        r = jax.random.uniform(k, (x.shape[0],))
        return {"s": jnp.where(vd, x.mean(axis=(1, 2, 3)) + w + r, 0.0).sum(),
                "n": vd.astype(jnp.float32).sum()}

    def eval_step_nokey(w, batch):
        x, y, vd = batch
        return {"s": jnp.where(vd, x.mean(axis=(1, 2, 3)) + w, 0.0).sum(),
                "n": vd.astype(jnp.float32).sum()}

    def eval_step_pair(w, batch, k):
        x, y, x2, vd = batch
        return {"s": jnp.where(vd, (x - x2).mean(axis=(1, 2, 3)) + w, 0.0).sum(),
                "n": vd.astype(jnp.float32).sum()}

    w = jnp.float32(0.5)
    for step_fn, kw in [
        (eval_step_key, dict(with_key=True)),
        (eval_step_nokey, dict(with_key=False)),
        (eval_step_pair, dict(with_key=True, with_pair=True)),
    ]:
        m0 = eval_epoch(step_fn, (w,), imgs, labs, eidx, evalid, key, cfg.bs, **kw)
        m2 = eval_epoch(step_fn, (w,), imgs, labs, eidx, evalid, key, cfg.bs, chunk=2, **kw)
        _assert_tree_close(m0, m2, rtol=1e-5)
        assert float(m2["n"]) == 21.0
