"""Fused jitted train/eval steps — the heart of the framework.

The reference's per-batch hot loop (reference ``train_generator.py:170-290``)
is a Python sequence of ~6 forwards + 2 backwards with host syncs between
(``np.random`` poison draw at ``:183``, scalar metric reads at ``:257-290``).
Here each batch is ONE pure function: both losses, both optimizer updates,
trigger synthesis (DCT low-pass + blur), augmentations, and all metrics fuse
under XLA; randomness is an explicit PRNG key; metrics return as a device
pytree summed once per epoch.  Dynamic-shape gathers (``nonzero()`` row
selection, binomial ``num_bd``) become fixed-shape boolean masks —
``where(mask, x_bd, x)`` — which is the jit-compatible equivalent
(per-example Bernoulli(pc) over target-class rows is exactly what
``np.sum(np.random.rand(n) < pc)`` samples; SURVEY.md §7.1).

BatchNorm mode threading replicates the reference's ``.train()/.eval()``
toggles precisely (``train_generator.py:176-178,217-219``): the C-step
updates C's batch stats; the G-step runs C frozen in eval mode on the
*just-updated* stats, so G's gradient flows through frozen-BN C.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..attack.triggers import additive_trigger, create_targets_bd
from ..config import Config
from ..ops.augment import post_tensor_transform
from ..ops.dct import detector_features
from .state import FrozenModel, TrainState


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    # f32 softmax regardless of compute dtype (mixed-precision recipe)
    return optax.softmax_cross_entropy_with_integer_labels(logits.astype(jnp.float32), labels).mean()


def _aug_fn(cfg: Config):
    return partial(
        post_tensor_transform,
        crop_padding=cfg.random_crop,
        rotation_degrees=float(cfg.random_rotation),
        hflip=cfg.dataset == "cifar10",
        option=cfg.post_transform_option,
    )


def _trigger_fn(cfg: Config):
    return partial(
        additive_trigger,
        image_size=cfg.input_height,
        ratio=cfg.ratio,
        noise_rate=cfg.noise_rate,
        kernel_size=cfg.kernel_size,
        sigma=cfg.sigma,
        use_pallas=cfg.pallas_lowfreq,
        use_pallas_fused=cfg.pallas_trigger,
    )


def grad_l2_metric(x: jnp.ndarray, x_bd: jnp.ndarray) -> jnp.ndarray:
    """Computed-but-unused gradient-L2 loss, kept as a metric for parity
    (reference ``train_generator.py:235-243``: F.pad (1,1,2,1) then MSE of
    adjacent diffs along H and W). NHWC: pad H by (2,1), W by (1,1)."""

    def pad(t):
        return jnp.pad(t, ((0, 0), (2, 1), (1, 1), (0, 0)))

    xe, be = pad(x), pad(x_bd)
    dh = jnp.mean((xe[:, 1:] - xe[:, :-1] - (be[:, 1:] - be[:, :-1])) ** 2)
    dw = jnp.mean((xe[:, :, 1:] - xe[:, :, :-1] - (be[:, :, 1:] - be[:, :, :-1])) ** 2)
    return dh + dw


def full_metrics_mode(cfg: Config) -> bool:
    """True for per-batch train metrics (reference parity), False for the
    loss_only production mode — and a hard error for anything else, so a
    typo'd ``--train_metrics`` can't silently zero the logged accuracies."""
    if cfg.train_metrics not in ("full", "loss_only"):
        raise ValueError(
            f"train_metrics must be 'full' or 'loss_only', got {cfg.train_metrics!r}"
        )
    return cfg.train_metrics == "full"


def _apply_eval(model_apply, variables, x, dropout_key=None):
    """Eval-mode forward; supplies a dropout rng for the detector variants
    that keep dropout live in eval (frequency_based/model.py:55-84)."""
    rngs = {"dropout": dropout_key} if dropout_key is not None else None
    return model_apply(variables, x, train=False, rngs=rngs)


# --------------------------------------------------------------------------
# Alternated attack training (reference train_generator.py:131-318)
# --------------------------------------------------------------------------


def _remat_wrapper(cfg: Config):
    """Identity, or ``jax.checkpoint`` for ``--remat step``: the backward
    then recomputes each loss forward instead of reading stored activations
    back from HBM — a bandwidth↔FLOPs trade on a step that is
    HBM-bandwidth-bound with the MXU half idle (PERF.md roofline).  Exact:
    the recompute closes over the same PRNG subkeys, so losses, gradients,
    and the training trajectory are unchanged."""
    if cfg.remat == "step":
        return jax.checkpoint
    if cfg.remat == "none":
        return lambda f: f
    raise ValueError(f"remat must be 'none' or 'step', got {cfg.remat!r}")


def make_alternated_train_step(cfg: Config, C, G):
    aug = _aug_fn(cfg)
    trig = _trigger_fn(cfg)
    full_metrics = full_metrics_mode(cfg)
    remat = _remat_wrapper(cfg)

    def step(
        stateC: TrainState,
        stateG: TrainState,
        clean_model: FrozenModel,
        netF: FrozenModel,
        batch: Tuple[jnp.ndarray, jnp.ndarray],
        key: jax.Array,
    ):
        x, y = batch
        bs = x.shape[0]
        bd_targets = create_targets_bd(y, cfg.attack_mode, cfg.target_label, cfg.num_classes)
        k = jax.random.split(key, 10)

        # The reference runs the SAME generator forward twice per batch —
        # once for the C-step poison batch (train_generator.py:186) and once
        # inside the G-step loss (:223) — because torch's autograd tape ties
        # gradients to a fresh forward.  With an explicit ``jax.vjp`` the
        # single forward serves both: its primal feeds the C-step (a
        # constant there — loss_C differentiates w.r.t. C only) and its
        # pullback turns dL/d(noise) into dL/d(paramsG), saving one full
        # UNet forward per step (~10% of step FLOPs) with bit-identical
        # semantics (G is updated only after both uses, so both see the
        # same params; the trigger PRNG draws are unchanged).
        noise, g_vjp = jax.vjp(remat(lambda p: G.apply({"params": p}, x)), stateG.params)

        # ---- C-step (netG eval/frozen, netC train) ----
        x_bd_c = trig(k[0], x, noise)
        is_target = y == bd_targets
        poison = is_target & jax.random.bernoulli(k[1], cfg.pc, y.shape)
        x_mix = jnp.where(poison[:, None, None, None], x_bd_c, x)
        x_mix = aug(k[2], x_mix)

        def loss_C(params):
            logits, mut = C.apply(
                {"params": params, "batch_stats": stateC.batch_stats}, x_mix, train=True, mutable=["batch_stats"]
            )
            # poisoned rows keep their (clean == target-class) labels
            return cross_entropy(logits, y), mut["batch_stats"]

        (loss_ce_c, new_bs), gradsC = jax.value_and_grad(remat(loss_C), has_aux=True)(stateC.params)
        stateC = stateC.apply_gradients(gradsC, batch_stats=new_bs)

        # clean-model forward on augmented clean inputs (metrics only, :214);
        # skipped in loss_only mode — k[3] stays reserved so the other
        # subkey streams are unchanged either way
        zero = jnp.zeros((), jnp.float32)
        if full_metrics:
            clean_preds = _apply_eval(clean_model.apply_fn, clean_model.variables, aug(k[3], x))

        # ---- G-step (netC eval with just-updated stats, netG train) ----
        varsC = {"params": stateC.params, "batch_stats": stateC.batch_stats}

        def loss_G(nz):
            # loss as a function of the generator OUTPUT; pulled back
            # through g_vjp below (reference loss: train_generator.py:253)
            x_bd = trig(k[4], x, nz)
            pred_bd = C.apply(varsC, aug(k[5], x_bd), train=False)
            l_ce = cross_entropy(pred_bd, bd_targets)
            l_l2 = jnp.mean((x_bd - x) ** 2)
            cm_bd = _apply_eval(clean_model.apply_fn, clean_model.variables, aug(k[6], x_bd))
            l_cm = cross_entropy(cm_bd, y)
            total = l_ce + cfg.L2_weight * l_l2 + cfg.clean_model_weight * l_cm
            return total, (x_bd, pred_bd, cm_bd, l_ce, l_l2, l_cm)

        (_, auxG), grad_noise = jax.value_and_grad(remat(loss_G), has_aux=True)(noise)
        (gradsG,) = g_vjp(grad_noise)
        stateG = stateG.apply_gradients(gradsG)
        x_bd, pred_bd, cm_bd, l_ce, l_l2, l_cm = auxG

        if full_metrics:
            pred_clean = C.apply(varsC, aug(k[7], x), train=False)
            pred_F = _apply_eval(netF.apply_fn, netF.variables, detector_features(x_bd), dropout_key=k[8])

        metrics = {
            "sample": jnp.asarray(bs, jnp.float32),
            "loss_ce": l_ce,
            "loss_l2": l_l2,
            "loss_grad_l2": grad_l2_metric(x, x_bd),
            "clean_model_loss": l_cm,
            "clean_correct": jnp.sum(jnp.argmax(pred_clean, -1) == y).astype(jnp.float32) if full_metrics else zero,
            "bd_correct": jnp.sum(jnp.argmax(pred_bd, -1) == bd_targets).astype(jnp.float32),
            "F_correct": jnp.sum(jnp.argmax(pred_F, -1) == 1).astype(jnp.float32) if full_metrics else zero,
            "clean_model_correct": jnp.sum(jnp.argmax(clean_preds, -1) == y).astype(jnp.float32)
            if full_metrics
            else zero,
            "clean_model_bd_ba": jnp.sum(jnp.argmax(cm_bd, -1) == y).astype(jnp.float32),
            "clean_model_bd_asr": jnp.sum(jnp.argmax(cm_bd, -1) == bd_targets).astype(jnp.float32),
        }
        return stateC, stateG, metrics

    return step


def make_attack_eval_step(cfg: Config, C, G):
    """Eval-side metrics over non-target test rows
    (reference ``train_generator.py:321-431``)."""
    trig = _trigger_fn(cfg)

    def step(
        varsC: Dict[str, Any],
        paramsG: Any,
        clean_model: FrozenModel,
        netF: FrozenModel,
        batch: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        key: jax.Array,
    ):
        x, y, valid = batch
        k = jax.random.split(key, 2)
        bd_targets = create_targets_bd(y, cfg.attack_mode, cfg.target_label, cfg.num_classes)
        preds_clean = C.apply(varsC, x, train=False)
        ntrg = (y != cfg.target_label) & valid

        noise = G.apply({"params": paramsG}, x)
        x_bd = trig(k[0], x, noise)
        preds_bd = C.apply(varsC, x_bd, train=False)
        pred_F = _apply_eval(netF.apply_fn, netF.variables, detector_features(x_bd), dropout_key=k[1])
        cm_clean = _apply_eval(clean_model.apply_fn, clean_model.variables, x)
        cm_bd = _apply_eval(clean_model.apply_fn, clean_model.variables, x_bd)

        vf = valid.astype(jnp.float32)
        nf = ntrg.astype(jnp.float32)
        return {
            "clean_sample": vf.sum(),
            "bd_sample": nf.sum(),
            "clean_correct": (vf * (jnp.argmax(preds_clean, -1) == y)).sum(),
            "bd_correct": (nf * (jnp.argmax(preds_bd, -1) == bd_targets)).sum(),
            "F_correct": (nf * (jnp.argmax(pred_F, -1) == 1)).sum(),
            "clean_model_correct": (vf * (jnp.argmax(cm_clean, -1) == y)).sum(),
            "clean_model_bd_ba": (nf * (jnp.argmax(cm_bd, -1) == y)).sum(),
            "clean_model_bd_asr": (nf * (jnp.argmax(cm_bd, -1) == bd_targets)).sum(),
        }

    return step


# --------------------------------------------------------------------------
# Clean classifier training (reference train_clean_classifier.py:75-161)
# --------------------------------------------------------------------------


def make_clean_train_step(cfg: Config, C):
    aug = _aug_fn(cfg)
    remat = _remat_wrapper(cfg)

    def step(stateC: TrainState, batch, key):
        x, y = batch
        x_aug = aug(key, x)

        def loss_fn(params):
            logits, mut = C.apply(
                {"params": params, "batch_stats": stateC.batch_stats}, x_aug, train=True, mutable=["batch_stats"]
            )
            return cross_entropy(logits, y), (mut["batch_stats"], logits)

        (loss, (new_bs, logits)), grads = jax.value_and_grad(remat(loss_fn), has_aux=True)(stateC.params)
        stateC = stateC.apply_gradients(grads, batch_stats=new_bs)
        metrics = {
            "sample": jnp.asarray(x.shape[0], jnp.float32),
            "loss_ce": loss,
            "clean_correct": jnp.sum(jnp.argmax(logits, -1) == y).astype(jnp.float32),
        }
        return stateC, metrics

    return step


def make_clean_eval_step(C):
    def step(varsC, batch):
        x, y, valid = batch
        logits = C.apply(varsC, x, train=False)
        vf = valid.astype(jnp.float32)
        return {
            "clean_sample": vf.sum(),
            "clean_correct": (vf * (jnp.argmax(logits, -1) == y)).sum(),
        }

    return step


# --------------------------------------------------------------------------
# Victim training on a fixed poisoned subset (reference train_victim.py:93-231)
# --------------------------------------------------------------------------


def make_victim_train_step(cfg: Config, C, G):
    aug = _aug_fn(cfg)
    trig = _trigger_fn(cfg)
    remat = _remat_wrapper(cfg)

    def step(stateC: TrainState, paramsG: Any, batch, key):
        x, y, poisoned = batch
        k = jax.random.split(key, 3)
        bd_targets = create_targets_bd(y, cfg.attack_mode, cfg.target_label, cfg.num_classes)
        noise = G.apply({"params": paramsG}, x)
        x_bd = trig(k[0], x, noise)
        x_mix = jnp.where(poisoned[:, None, None, None], x_bd, x)
        x_mix = aug(k[1], x_mix)
        labels = jnp.where(poisoned, bd_targets, y)

        def loss_fn(params):
            logits, mut = C.apply(
                {"params": params, "batch_stats": stateC.batch_stats}, x_mix, train=True, mutable=["batch_stats"]
            )
            return cross_entropy(logits, labels), (mut["batch_stats"], logits)

        (loss, (new_bs, logits)), grads = jax.value_and_grad(remat(loss_fn), has_aux=True)(stateC.params)
        stateC = stateC.apply_gradients(grads, batch_stats=new_bs)
        metrics = {
            "sample": jnp.asarray(x.shape[0], jnp.float32),
            "loss_ce": loss,
            "clean_correct": jnp.sum(jnp.argmax(logits, -1) == labels).astype(jnp.float32),
        }
        return stateC, metrics

    return step


def make_victim_eval_step(cfg: Config, C, G):
    """Clean acc + ASR over non-target rows (reference train_victim.py:168-231)."""
    trig = _trigger_fn(cfg)

    def step(varsC, paramsG, batch, key):
        x, y, valid = batch
        bd_targets = create_targets_bd(y, cfg.attack_mode, cfg.target_label, cfg.num_classes)
        preds_clean = C.apply(varsC, x, train=False)
        ntrg = (y != cfg.target_label) & valid
        noise = G.apply({"params": paramsG}, x)
        x_bd = trig(key, x, noise)
        preds_bd = C.apply(varsC, x_bd, train=False)
        vf = valid.astype(jnp.float32)
        nf = ntrg.astype(jnp.float32)
        return {
            "clean_sample": vf.sum(),
            "bd_sample": nf.sum(),
            "clean_correct": (vf * (jnp.argmax(preds_clean, -1) == y)).sum(),
            "bd_correct": (nf * (jnp.argmax(preds_bd, -1) == bd_targets)).sum(),
        }

    return step
