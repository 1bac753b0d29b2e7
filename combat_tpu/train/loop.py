"""Epoch runners: one ``lax.scan`` per epoch, compiled once.

TPU-first design: the whole dataset is device-resident (data/datasets.py), so
an epoch is a jitted scan over permuted index batches — zero host↔device
traffic and zero host sync until the final metric read-back (one transfer per
epoch, vs the reference's per-batch ``progress_bar`` scalar syncs at
``utils/utils.py:55-94``).  Under a multi-device mesh the batch axis of the
index matrix is sharded, which shards every activation downstream; params are
replicated and GSPMD inserts the gradient ``psum`` over ICI (train/mesh.py).

Remainder policy: every training epoch covers all N rows, like the
reference's ``DataLoader(drop_last=False)``.  The full batches run inside the
``lax.scan``; the ragged tail (n % bs rows) runs as ONE extra ``step_fn``
call at its true (static) shape — XLA compiles a second program for the tail
shape once, and BN/loss/metrics see the genuine small batch exactly as the
reference does.  Eval pads to a full batch with a validity mask, so eval
metrics are exact.

Chunking (``chunk > 0``): the epoch is split into dispatches of at most
``chunk`` steps.  Same permutation, same per-step PRNG subkeys (folded from
``state.step``), same tail handling — numerically identical to the
whole-epoch scan (tests/test_scan_chunk.py) — but no single XLA execution
runs longer than ``chunk`` steps.  Needed because the shared-TPU tunnel
kills the worker on multi-minute executions (config.py ``scan_chunk``).
All full segments share one compiled program (the segment start is a
*dynamic* ``dynamic_slice`` index); a non-dividing remainder adds one more
compilation, and cross-segment metric sums go through a trivially-compiled
``_tree_add`` so no large program is retraced.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def dequantize(x: jnp.ndarray) -> jnp.ndarray:
    """Map a uint8-resident split back to the [-1, 1] float range.

    Large splits live in HBM as uint8 (cli/common.py ``device_dataset``):
    4x smaller residency/upload, and ``u8/127.5 - 1`` is exactly the
    reference's ToTensor+Normalize(±0.5) of a uint8 frame
    (``utils/dataloader.py:24-42``).  Float splits pass through untouched.
    """
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 127.5 - 1.0
    return x


def gather_batch(images: jnp.ndarray, idx) -> jnp.ndarray:
    """Batch gather from the device-resident split; XLA fuses the dequant
    into the consuming step."""
    return dequantize(images[idx])


def epoch_permutation(key: jax.Array, n: int, bs: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(full_batches, tail): a (n//bs, bs) index matrix plus the ragged
    remainder (static length n % bs, possibly 0)."""
    steps = n // bs
    perm = jax.random.permutation(key, n)
    return perm[: steps * bs].reshape(steps, bs), perm[steps * bs :]


def padded_eval_batches(n: int, bs: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static index + validity-mask matrices covering all n rows."""
    steps = (n + bs - 1) // bs
    idx = np.arange(steps * bs)
    valid = idx < n
    return idx.clip(max=n - 1).reshape(steps, bs), valid.reshape(steps, bs)


@jax.jit
def _tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def _accumulate(metrics, msum):
    return msum if metrics is None else _tree_add(metrics, msum)


def _segment_starts(steps: int, chunk: int):
    """(start, length) pairs covering range(steps) in runs of <= chunk."""
    full = steps - steps % chunk
    out = [(s, chunk) for s in range(0, full, chunk)]
    if steps % chunk:
        out.append((full, steps % chunk))
    return out


# ---------------------------------------------------------------------------
# Alternated (C + G) epochs — reference train_generator.py train()
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("step_fn", "bs"))
def _train_epoch_alternated_whole(step_fn, stateC, stateG, clean_model, netF, images, labels, key, bs):
    kperm, kstep = jax.random.split(key)
    perm, tail = epoch_permutation(kperm, images.shape[0], bs)

    def body(carry, idx):
        stateC, stateG = carry
        sub = jax.random.fold_in(kstep, stateC.step)
        batch = (gather_batch(images, idx), labels[idx])
        stateC, stateG, m = step_fn(stateC, stateG, clean_model, netF, batch, sub)
        return (stateC, stateG), m

    (stateC, stateG), ms = jax.lax.scan(body, (stateC, stateG), perm)
    metrics = jax.tree.map(lambda a: a.sum(0), ms)
    if tail.shape[0]:
        sub = jax.random.fold_in(kstep, stateC.step)
        stateC, stateG, mt = step_fn(stateC, stateG, clean_model, netF, (gather_batch(images, tail), labels[tail]), sub)
        metrics = jax.tree.map(jnp.add, metrics, mt)
    return stateC, stateG, metrics


@partial(jax.jit, static_argnames=("step_fn", "seg_len"))
def _alt_segment(step_fn, stateC, stateG, clean_model, netF, images, labels, kstep, perm, start, seg_len):
    seg = jax.lax.dynamic_slice_in_dim(perm, start, seg_len, axis=0)

    def body(carry, idx):
        stateC, stateG = carry
        sub = jax.random.fold_in(kstep, stateC.step)
        batch = (gather_batch(images, idx), labels[idx])
        stateC, stateG, m = step_fn(stateC, stateG, clean_model, netF, batch, sub)
        return (stateC, stateG), m

    (stateC, stateG), ms = jax.lax.scan(body, (stateC, stateG), seg)
    return stateC, stateG, jax.tree.map(lambda a: a.sum(0), ms)


@partial(jax.jit, static_argnames=("step_fn",))
def _alt_tail(step_fn, stateC, stateG, clean_model, netF, images, labels, kstep, tail):
    sub = jax.random.fold_in(kstep, stateC.step)
    return step_fn(stateC, stateG, clean_model, netF, (gather_batch(images, tail), labels[tail]), sub)


def train_epoch_alternated(
    step_fn: Callable,
    stateC,
    stateG,
    clean_model,
    netF,
    images: jnp.ndarray,
    labels: jnp.ndarray,
    key: jax.Array,
    bs: int,
    chunk: int = 0,
):
    """One alternated-training epoch (reference train_generator.py train())."""
    if chunk <= 0:
        return _train_epoch_alternated_whole(step_fn, stateC, stateG, clean_model, netF, images, labels, key, bs)
    kperm, kstep = jax.random.split(key)
    perm, tail = epoch_permutation(kperm, images.shape[0], bs)
    metrics = None
    for start, seg_len in _segment_starts(perm.shape[0], chunk):
        stateC, stateG, msum = _alt_segment(
            step_fn, stateC, stateG, clean_model, netF, images, labels, kstep, perm, jnp.asarray(start), seg_len
        )
        metrics = _accumulate(metrics, msum)
    if tail.shape[0]:
        stateC, stateG, mt = _alt_tail(step_fn, stateC, stateG, clean_model, netF, images, labels, kstep, tail)
        metrics = _accumulate(metrics, mt)
    return stateC, stateG, metrics


@partial(jax.jit, static_argnames=("step_fn", "bs"))
def _train_epoch_alternated_pair_whole(step_fn, stateC, stateG, clean_model, netF, images, labels, key, bs):
    kperm, kperm2, kstep = jax.random.split(key, 3)
    perm, tail = epoch_permutation(kperm, images.shape[0], bs)
    perm2, tail2 = epoch_permutation(kperm2, images.shape[0], bs)

    def body(carry, idx_pair):
        stateC, stateG = carry
        idx, idx2 = idx_pair
        sub = jax.random.fold_in(kstep, stateC.step)
        batch = (gather_batch(images, idx), labels[idx], gather_batch(images, idx2))
        stateC, stateG, m = step_fn(stateC, stateG, clean_model, netF, batch, sub)
        return (stateC, stateG), m

    (stateC, stateG), ms = jax.lax.scan(body, (stateC, stateG), (perm, perm2))
    metrics = jax.tree.map(lambda a: a.sum(0), ms)
    if tail.shape[0]:
        sub = jax.random.fold_in(kstep, stateC.step)
        stateC, stateG, mt = step_fn(
            stateC, stateG, clean_model, netF, (gather_batch(images, tail), labels[tail], gather_batch(images, tail2)), sub
        )
        metrics = jax.tree.map(jnp.add, metrics, mt)
    return stateC, stateG, metrics


@partial(jax.jit, static_argnames=("step_fn", "seg_len"))
def _alt_pair_segment(step_fn, stateC, stateG, clean_model, netF, images, labels, kstep, perm, perm2, start, seg_len):
    seg = jax.lax.dynamic_slice_in_dim(perm, start, seg_len, axis=0)
    seg2 = jax.lax.dynamic_slice_in_dim(perm2, start, seg_len, axis=0)

    def body(carry, idx_pair):
        stateC, stateG = carry
        idx, idx2 = idx_pair
        sub = jax.random.fold_in(kstep, stateC.step)
        batch = (gather_batch(images, idx), labels[idx], gather_batch(images, idx2))
        stateC, stateG, m = step_fn(stateC, stateG, clean_model, netF, batch, sub)
        return (stateC, stateG), m

    (stateC, stateG), ms = jax.lax.scan(body, (stateC, stateG), (seg, seg2))
    return stateC, stateG, jax.tree.map(lambda a: a.sum(0), ms)


@partial(jax.jit, static_argnames=("step_fn",))
def _alt_pair_tail(step_fn, stateC, stateG, clean_model, netF, images, labels, kstep, tail, tail2):
    sub = jax.random.fold_in(kstep, stateC.step)
    return step_fn(
        stateC, stateG, clean_model, netF, (gather_batch(images, tail), labels[tail], gather_batch(images, tail2)), sub
    )


def train_epoch_alternated_pair(
    step_fn: Callable,
    stateC,
    stateG,
    clean_model,
    netF,
    images: jnp.ndarray,
    labels: jnp.ndarray,
    key: jax.Array,
    bs: int,
    chunk: int = 0,
):
    """Alternated epoch with a second independent shuffled stream (the
    input-aware variant's two dataloaders, reference
    ``train_generator_inputaware.py:535-538``); batch = (x, y, x2)."""
    if chunk <= 0:
        return _train_epoch_alternated_pair_whole(step_fn, stateC, stateG, clean_model, netF, images, labels, key, bs)
    kperm, kperm2, kstep = jax.random.split(key, 3)
    perm, tail = epoch_permutation(kperm, images.shape[0], bs)
    perm2, tail2 = epoch_permutation(kperm2, images.shape[0], bs)
    metrics = None
    for start, seg_len in _segment_starts(perm.shape[0], chunk):
        stateC, stateG, msum = _alt_pair_segment(
            step_fn, stateC, stateG, clean_model, netF, images, labels, kstep, perm, perm2, jnp.asarray(start), seg_len
        )
        metrics = _accumulate(metrics, msum)
    if tail.shape[0]:
        stateC, stateG, mt = _alt_pair_tail(step_fn, stateC, stateG, clean_model, netF, images, labels, kstep, tail, tail2)
        metrics = _accumulate(metrics, mt)
    return stateC, stateG, metrics


# ---------------------------------------------------------------------------
# Classifier-only epochs — clean training / victim training
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("step_fn", "bs", "has_poison"))
def _train_epoch_classifier_whole(step_fn, stateC, paramsG, images, labels, poisoned, key, bs, has_poison=False):
    kperm, kstep = jax.random.split(key)
    perm, tail = epoch_permutation(kperm, images.shape[0], bs)

    def one(stateC, idx):
        sub = jax.random.fold_in(kstep, stateC.step)
        if has_poison:
            return step_fn(stateC, paramsG, (gather_batch(images, idx), labels[idx], poisoned[idx]), sub)
        return step_fn(stateC, (gather_batch(images, idx), labels[idx]), sub)

    stateC, ms = jax.lax.scan(one, stateC, perm)
    metrics = jax.tree.map(lambda a: a.sum(0), ms)
    if tail.shape[0]:
        stateC, mt = one(stateC, tail)
        metrics = jax.tree.map(jnp.add, metrics, mt)
    return stateC, metrics


@partial(jax.jit, static_argnames=("step_fn", "seg_len", "has_poison"))
def _cls_segment(step_fn, stateC, paramsG, images, labels, poisoned, kstep, perm, start, seg_len, has_poison):
    seg = jax.lax.dynamic_slice_in_dim(perm, start, seg_len, axis=0)

    def one(stateC, idx):
        sub = jax.random.fold_in(kstep, stateC.step)
        if has_poison:
            return step_fn(stateC, paramsG, (gather_batch(images, idx), labels[idx], poisoned[idx]), sub)
        return step_fn(stateC, (gather_batch(images, idx), labels[idx]), sub)

    stateC, ms = jax.lax.scan(one, stateC, seg)
    return stateC, jax.tree.map(lambda a: a.sum(0), ms)


@partial(jax.jit, static_argnames=("step_fn", "has_poison"))
def _cls_tail(step_fn, stateC, paramsG, images, labels, poisoned, kstep, tail, has_poison):
    sub = jax.random.fold_in(kstep, stateC.step)
    if has_poison:
        return step_fn(stateC, paramsG, (gather_batch(images, tail), labels[tail], poisoned[tail]), sub)
    return step_fn(stateC, (gather_batch(images, tail), labels[tail]), sub)


def train_epoch_classifier(
    step_fn: Callable,
    stateC,
    paramsG: Any,
    images: jnp.ndarray,
    labels: jnp.ndarray,
    poisoned: Optional[jnp.ndarray],
    key: jax.Array,
    bs: int,
    has_poison: bool = False,
    chunk: int = 0,
):
    """One classifier-only epoch: clean training (paramsG/poisoned unused) or
    victim training on the fixed poisoned subset."""
    if chunk <= 0:
        return _train_epoch_classifier_whole(
            step_fn, stateC, paramsG, images, labels, poisoned, key, bs, has_poison=has_poison
        )
    kperm, kstep = jax.random.split(key)
    perm, tail = epoch_permutation(kperm, images.shape[0], bs)
    metrics = None
    for start, seg_len in _segment_starts(perm.shape[0], chunk):
        stateC, msum = _cls_segment(
            step_fn, stateC, paramsG, images, labels, poisoned, kstep, perm, jnp.asarray(start), seg_len, has_poison
        )
        metrics = _accumulate(metrics, msum)
    if tail.shape[0]:
        stateC, mt = _cls_tail(step_fn, stateC, paramsG, images, labels, poisoned, kstep, tail, has_poison)
        metrics = _accumulate(metrics, mt)
    return stateC, metrics


# ---------------------------------------------------------------------------
# Eval epochs — padded fixed-shape batches, exact masked sums
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("step_fn", "bs", "with_key", "with_pair"))
def _eval_epoch_whole(step_fn, step_args, images, labels, idx, valid, key, bs, with_key=True, with_pair=False):
    pair_perm = None
    if with_pair:
        pair_perm = jax.random.permutation(jax.random.fold_in(key, 0x7FFFFFFF), images.shape[0])

    def body(i, pair):
        ix, vd = pair
        if with_pair:
            ix2 = pair_perm[ix % images.shape[0]]
            batch = (gather_batch(images, ix), labels[ix], gather_batch(images, ix2), vd)
        else:
            batch = (gather_batch(images, ix), labels[ix], vd)
        if with_key:
            m = step_fn(*step_args, batch, jax.random.fold_in(key, i))
        else:
            m = step_fn(*step_args, batch)
        return i + 1, m

    _, ms = jax.lax.scan(body, 0, (idx, valid))
    return jax.tree.map(lambda a: a.sum(0), ms)


@partial(jax.jit, static_argnames=("step_fn", "seg_len", "with_key", "with_pair"))
def _eval_segment(step_fn, step_args, images, labels, idx, valid, pair_perm, key, start, seg_len, with_key, with_pair):
    seg_idx = jax.lax.dynamic_slice_in_dim(idx, start, seg_len, axis=0)
    seg_valid = jax.lax.dynamic_slice_in_dim(valid, start, seg_len, axis=0)

    def body(i, pair):
        ix, vd = pair
        if with_pair:
            ix2 = pair_perm[ix % images.shape[0]]
            batch = (gather_batch(images, ix), labels[ix], gather_batch(images, ix2), vd)
        else:
            batch = (gather_batch(images, ix), labels[ix], vd)
        if with_key:
            m = step_fn(*step_args, batch, jax.random.fold_in(key, i))
        else:
            m = step_fn(*step_args, batch)
        return i + 1, m

    _, ms = jax.lax.scan(body, start, (seg_idx, seg_valid))
    return jax.tree.map(lambda a: a.sum(0), ms)


def eval_epoch(
    step_fn: Callable,
    step_args: Tuple,
    images: jnp.ndarray,
    labels: jnp.ndarray,
    idx: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    bs: int,
    with_key: bool = True,
    with_pair: bool = False,
    chunk: int = 0,
):
    """Scan an eval step over padded fixed-shape batches; exact masked sums.
    ``with_pair`` adds a second shuffled image stream to each batch (the
    input-aware cross-accuracy eval)."""
    if chunk <= 0:
        return _eval_epoch_whole(
            step_fn, step_args, images, labels, idx, valid, key, bs, with_key=with_key, with_pair=with_pair
        )
    pair_perm = None
    if with_pair:
        # same derivation as the whole-epoch path, computed once per epoch
        pair_perm = jax.random.permutation(jax.random.fold_in(key, 0x7FFFFFFF), images.shape[0])
    metrics = None
    for start, seg_len in _segment_starts(idx.shape[0], chunk):
        msum = _eval_segment(
            step_fn, step_args, images, labels, idx, valid, pair_perm, key,
            jnp.asarray(start), seg_len, with_key, with_pair,
        )
        metrics = _accumulate(metrics, msum)
    return metrics


def metrics_to_host(metrics: Dict[str, jnp.ndarray]) -> Dict[str, float]:
    return {k: float(v) for k, v in jax.device_get(metrics).items()}
