"""Trigger-variant train/eval steps: WaNet warp, input-aware cross-trigger,
imperceptible (TV), class-conditional multilabel.

Each is the fused-jitted-step re-design of the corresponding reference
script's hot loop:
  * WaNet        — reference ``train_generator_wanet.py:95-305``
  * input-aware  — reference ``train_generator_inputaware.py:141-336``
  * imperceptible— reference ``train_generator_imperceptible.py:114-312``
  * multilabel   — reference ``train_generator_multilabel.py:121-305``

Shared structure (C-step with Bernoulli(pc) poison mask, clean-labels CE;
G-step against eval-mode C with just-updated BN stats + frozen clean model;
netF evasion as a metric only) matches steps.py; this module implements the
per-variant deltas:

  wanet:        trigger = grid_sample(x, clamp(id*(1-r) + upsample(flow)*r));
                G L2 term = MSE(flow_up, 0) (``:212``)
  inputaware:   second independent batch x2; cross loss
                ``cross_weight * CE(C(aug(trigger_from(x2) on x)), y)``
                (``:236-266``); G lr = lr_C*0.1 (``:120-127``)
  imperceptible: + ``tv_weight * total_variation(x_bd).mean()`` (``:228-237``)
  multilabel:   conditional G(x, class); C-step poisons Bernoulli(pc) rows
                toward their own labels (``:160-188``); G-step assigns row i
                target class ``i // ceil(bs/K)`` — the jit-friendly
                equivalent of the reference's per-class chunk loop
                (``:203-224``); eval loops every target class (``:355-378``)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..attack.triggers import create_targets_bd, warp_trigger
from ..config import Config
from ..ops.dct import detector_features
from ..ops.image import resize2d, total_variation
from .state import FrozenModel, TrainState
from .steps import (
    _apply_eval,
    _aug_fn,
    _remat_wrapper,
    _trigger_fn,
    cross_entropy,
    full_metrics_mode,
    grad_l2_metric,
)


def _flow_upsample(flow: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """(B, s, s, 2) → (B, H, W, 2), bicubic, align_corners=True
    (reference ``train_generator_wanet.py:151-152``)."""
    return resize2d(flow, (height, width), method="bicubic", align_corners=True)


def _wanet_grid(flow_up: jnp.ndarray, grid_rescale: float) -> jnp.ndarray:
    from ..attack.triggers import identity_grid

    h, w = flow_up.shape[1], flow_up.shape[2]
    grid = identity_grid(h, w)[None] * (1.0 - grid_rescale) + flow_up * grid_rescale
    return jnp.clip(grid, -1.0, 1.0)


def wanet_apply(x: jnp.ndarray, flow: jnp.ndarray, grid_rescale: float) -> jnp.ndarray:
    from ..ops.image import grid_sample

    flow_up = _flow_upsample(flow, x.shape[1], x.shape[2])
    return grid_sample(x, _wanet_grid(flow_up, grid_rescale), align_corners=True), flow_up


def _wanet_grad_l2(flow_up: jnp.ndarray) -> jnp.ndarray:
    """Replicates the reference's quirky metric (``wanet:213-222``):
    ``F.pad(noise_grid, (1,1,2,1))`` on the permuted (B,H,W,2) tensor pads the
    last (xy) axis by (1,1) and W by (2,1); diffs run along W and xy."""
    a = jnp.pad(flow_up, ((0, 0), (0, 0), (2, 1), (1, 1)))
    b = jnp.zeros_like(a)
    d1 = jnp.mean((a[:, :, 1:] - a[:, :, :-1] - (b[:, :, 1:] - b[:, :, :-1])) ** 2)
    d2 = jnp.mean((a[..., 1:] - a[..., :-1] - (b[..., 1:] - b[..., :-1])) ** 2)
    return d1 + d2


def make_wanet_train_step(cfg: Config, C, G):
    aug = _aug_fn(cfg)
    full_metrics = full_metrics_mode(cfg)  # validates the flag; see config.train_metrics

    remat = _remat_wrapper(cfg)
    def step(stateC, stateG, clean_model, netF, batch, key):
        x, y = batch
        bs = x.shape[0]
        bd_targets = create_targets_bd(y, cfg.attack_mode, cfg.target_label, cfg.num_classes)
        k = jax.random.split(key, 8)

        # One G forward serves both the C-step (constant there) and the
        # G-step pullback — see the vjp note in steps.py.
        flow, g_vjp = jax.vjp(remat(lambda p: G.apply({"params": p}, x)), stateG.params)

        # C-step
        x_bd_c, _ = wanet_apply(x, flow, cfg.grid_rescale)
        poison = (y == bd_targets) & jax.random.bernoulli(k[0], cfg.pc, y.shape)
        x_mix = aug(k[1], jnp.where(poison[:, None, None, None], x_bd_c, x))

        def loss_C(params):
            logits, mut = C.apply(
                {"params": params, "batch_stats": stateC.batch_stats}, x_mix, train=True, mutable=["batch_stats"]
            )
            return cross_entropy(logits, y), mut["batch_stats"]

        (_, new_bs), gradsC = jax.value_and_grad(remat(loss_C), has_aux=True)(stateC.params)
        stateC = stateC.apply_gradients(gradsC, batch_stats=new_bs)

        zero = jnp.zeros((), jnp.float32)
        if full_metrics:
            clean_preds = _apply_eval(clean_model.apply_fn, clean_model.variables, aug(k[2], x))
        varsC = {"params": stateC.params, "batch_stats": stateC.batch_stats}

        def loss_G(fl):
            x_bd, flow_up = wanet_apply(x, fl, cfg.grid_rescale)
            pred_bd = C.apply(varsC, aug(k[3], x_bd), train=False)
            l_ce = cross_entropy(pred_bd, bd_targets)
            l_l2 = jnp.mean(flow_up**2)  # MSE(noise_grid, 0) — wanet:212
            cm_bd = _apply_eval(clean_model.apply_fn, clean_model.variables, aug(k[4], x_bd))
            l_cm = cross_entropy(cm_bd, y)
            total = l_ce + cfg.L2_weight * l_l2 + cfg.clean_model_weight * l_cm
            return total, (x_bd, flow_up, pred_bd, cm_bd, l_ce, l_l2, l_cm)

        (_, auxG), grad_flow = jax.value_and_grad(remat(loss_G), has_aux=True)(flow)
        (gradsG,) = g_vjp(grad_flow)
        stateG = stateG.apply_gradients(gradsG)
        x_bd, flow_up, pred_bd, cm_bd, l_ce, l_l2, l_cm = auxG

        if full_metrics:
            pred_clean = C.apply(varsC, aug(k[5], x), train=False)
            pred_F = _apply_eval(netF.apply_fn, netF.variables, detector_features(x_bd), dropout_key=k[6])

        metrics = {
            "sample": jnp.asarray(bs, jnp.float32),
            "loss_ce": l_ce,
            "loss_l2": l_l2,
            "loss_grad_l2": _wanet_grad_l2(flow_up),
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


def make_wanet_eval_step(cfg: Config, C, G):
    def step(varsC, paramsG, clean_model, netF, batch, key):
        x, y, valid = batch
        bd_targets = create_targets_bd(y, cfg.attack_mode, cfg.target_label, cfg.num_classes)
        preds_clean = C.apply(varsC, x, train=False)
        ntrg = (y != cfg.target_label) & valid
        flow = G.apply({"params": paramsG}, x)
        x_bd, _ = wanet_apply(x, flow, cfg.grid_rescale)
        preds_bd = C.apply(varsC, x_bd, train=False)
        pred_F = _apply_eval(netF.apply_fn, netF.variables, detector_features(x_bd), dropout_key=key)
        cm_clean = _apply_eval(clean_model.apply_fn, clean_model.variables, x)
        cm_bd = _apply_eval(clean_model.apply_fn, clean_model.variables, x_bd)
        vf, nf = valid.astype(jnp.float32), ntrg.astype(jnp.float32)
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
# Input-aware (cross-trigger non-reusability)
# --------------------------------------------------------------------------


def make_inputaware_train_step(cfg: Config, C, G):
    aug = _aug_fn(cfg)
    trig = _trigger_fn(cfg)
    full_metrics = full_metrics_mode(cfg)  # validates the flag; see config.train_metrics

    remat = _remat_wrapper(cfg)
    def step(stateC, stateG, clean_model, netF, batch, key):
        x, y, x2 = batch
        bs = x.shape[0]
        bd_targets = create_targets_bd(y, cfg.attack_mode, cfg.target_label, cfg.num_classes)
        k = jax.random.split(key, 10)

        # C-step (identical to base); the G(x) forward is shared with the
        # G-step pullback (vjp note in steps.py) — G(x2) is a different
        # input and keeps its own forward below.
        noise, g_vjp = jax.vjp(remat(lambda p: G.apply({"params": p}, x)), stateG.params)
        noise2, g2_vjp = jax.vjp(remat(lambda p: G.apply({"params": p}, x2)), stateG.params)
        x_bd_c = trig(k[0], x, noise)
        poison = (y == bd_targets) & jax.random.bernoulli(k[1], cfg.pc, y.shape)
        x_mix = aug(k[2], jnp.where(poison[:, None, None, None], x_bd_c, x))

        def loss_C(params):
            logits, mut = C.apply(
                {"params": params, "batch_stats": stateC.batch_stats}, x_mix, train=True, mutable=["batch_stats"]
            )
            return cross_entropy(logits, y), mut["batch_stats"]

        (_, new_bs), gradsC = jax.value_and_grad(remat(loss_C), has_aux=True)(stateC.params)
        stateC = stateC.apply_gradients(gradsC, batch_stats=new_bs)
        zero = jnp.zeros((), jnp.float32)
        if full_metrics:
            clean_preds = _apply_eval(clean_model.apply_fn, clean_model.variables, aug(k[3], x))
        varsC = {"params": stateC.params, "batch_stats": stateC.batch_stats}

        def loss_G(nz, nz2):
            x_bd = trig(k[4], x, nz)
            # cross trigger: noise from x2 applied to x (inputaware:254-258)
            x_bd2 = trig(k[5], x, nz2)
            pred_bd = C.apply(varsC, aug(k[6], x_bd), train=False)
            pred_cross = C.apply(varsC, aug(k[7], x_bd2), train=False)
            l_ce = cross_entropy(pred_bd, bd_targets)
            l_cross = cross_entropy(pred_cross, y)
            l_l2 = jnp.mean((x_bd - x) ** 2)
            cm_bd = _apply_eval(clean_model.apply_fn, clean_model.variables, aug(k[8], x_bd))
            l_cm = cross_entropy(cm_bd, y)
            total = l_ce + cfg.cross_weight * l_cross + cfg.L2_weight * l_l2 + cfg.clean_model_weight * l_cm
            return total, (x_bd, pred_bd, pred_cross, cm_bd, l_ce, l_cross, l_l2, l_cm)

        (_, auxG), (gn, gn2) = jax.value_and_grad(remat(loss_G), argnums=(0, 1), has_aux=True)(noise, noise2)
        (gradsG,) = g_vjp(gn)
        (gradsG2,) = g2_vjp(gn2)
        gradsG = jax.tree.map(jnp.add, gradsG, gradsG2)
        stateG = stateG.apply_gradients(gradsG)
        x_bd, pred_bd, pred_cross, cm_bd, l_ce, l_cross, l_l2, l_cm = auxG

        if full_metrics:
            pred_clean = C.apply(varsC, aug(k[9], x), train=False)
            pred_F = _apply_eval(netF.apply_fn, netF.variables, detector_features(x_bd), dropout_key=k[0])

        metrics = {
            "sample": jnp.asarray(bs, jnp.float32),
            "loss_ce": l_ce,
            "loss_l2": l_l2,
            "loss_cross": l_cross,
            "clean_model_loss": l_cm,
            "clean_correct": jnp.sum(jnp.argmax(pred_clean, -1) == y).astype(jnp.float32) if full_metrics else zero,
            "cross_correct": jnp.sum(jnp.argmax(pred_cross, -1) == y).astype(jnp.float32),
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


def make_inputaware_eval_step(cfg: Config, C, G):
    """Adds cross accuracy vs a second shuffled test stream
    (reference ``train_generator_inputaware.py:339-508``)."""
    trig = _trigger_fn(cfg)

    def step(varsC, paramsG, clean_model, netF, batch, key):
        x, y, x2, valid = batch
        k = jax.random.split(key, 3)
        bd_targets = create_targets_bd(y, cfg.attack_mode, cfg.target_label, cfg.num_classes)
        preds_clean = C.apply(varsC, x, train=False)
        ntrg = (y != cfg.target_label) & valid
        noise = G.apply({"params": paramsG}, x)
        x_bd = trig(k[0], x, noise)
        noise2 = G.apply({"params": paramsG}, x2)
        x_bd2 = trig(k[1], x, noise2)
        preds_bd = C.apply(varsC, x_bd, train=False)
        preds_cross = C.apply(varsC, x_bd2, train=False)
        pred_F = _apply_eval(netF.apply_fn, netF.variables, detector_features(x_bd), dropout_key=k[2])
        cm_clean = _apply_eval(clean_model.apply_fn, clean_model.variables, x)
        cm_bd = _apply_eval(clean_model.apply_fn, clean_model.variables, x_bd)
        vf, nf = valid.astype(jnp.float32), ntrg.astype(jnp.float32)
        return {
            "clean_sample": vf.sum(),
            "bd_sample": nf.sum(),
            "clean_correct": (vf * (jnp.argmax(preds_clean, -1) == y)).sum(),
            "cross_correct": (nf * (jnp.argmax(preds_cross, -1) == y)).sum(),
            "bd_correct": (nf * (jnp.argmax(preds_bd, -1) == bd_targets)).sum(),
            "F_correct": (nf * (jnp.argmax(pred_F, -1) == 1)).sum(),
            "clean_model_correct": (vf * (jnp.argmax(cm_clean, -1) == y)).sum(),
            "clean_model_bd_ba": (nf * (jnp.argmax(cm_bd, -1) == y)).sum(),
            "clean_model_bd_asr": (nf * (jnp.argmax(cm_bd, -1) == bd_targets)).sum(),
        }

    return step


# --------------------------------------------------------------------------
# Imperceptible (TV-regularized)
# --------------------------------------------------------------------------


def make_imperceptible_train_step(cfg: Config, C, G):
    aug = _aug_fn(cfg)
    trig = _trigger_fn(cfg)
    full_metrics = full_metrics_mode(cfg)  # validates the flag; see config.train_metrics

    remat = _remat_wrapper(cfg)
    def step(stateC, stateG, clean_model, netF, batch, key):
        x, y = batch
        bs = x.shape[0]
        bd_targets = create_targets_bd(y, cfg.attack_mode, cfg.target_label, cfg.num_classes)
        k = jax.random.split(key, 10)

        # single shared G forward (vjp note in steps.py)
        noise, g_vjp = jax.vjp(remat(lambda p: G.apply({"params": p}, x)), stateG.params)
        x_bd_c = trig(k[0], x, noise)
        poison = (y == bd_targets) & jax.random.bernoulli(k[1], cfg.pc, y.shape)
        x_mix = aug(k[2], jnp.where(poison[:, None, None, None], x_bd_c, x))

        def loss_C(params):
            logits, mut = C.apply(
                {"params": params, "batch_stats": stateC.batch_stats}, x_mix, train=True, mutable=["batch_stats"]
            )
            return cross_entropy(logits, y), mut["batch_stats"]

        (_, new_bs), gradsC = jax.value_and_grad(remat(loss_C), has_aux=True)(stateC.params)
        stateC = stateC.apply_gradients(gradsC, batch_stats=new_bs)
        zero = jnp.zeros((), jnp.float32)
        if full_metrics:
            clean_preds = _apply_eval(clean_model.apply_fn, clean_model.variables, aug(k[3], x))
        varsC = {"params": stateC.params, "batch_stats": stateC.batch_stats}

        def loss_G(nz):
            x_bd = trig(k[4], x, nz)
            pred_bd = C.apply(varsC, aug(k[5], x_bd), train=False)
            l_ce = cross_entropy(pred_bd, bd_targets)
            l_l2 = jnp.mean((x_bd - x) ** 2)
            l_tv = total_variation(x_bd).mean()  # imperceptible:228
            cm_bd = _apply_eval(clean_model.apply_fn, clean_model.variables, aug(k[6], x_bd))
            l_cm = cross_entropy(cm_bd, y)
            total = l_ce + cfg.L2_weight * l_l2 + cfg.tv_weight * l_tv + cfg.clean_model_weight * l_cm
            return total, (x_bd, pred_bd, cm_bd, l_ce, l_l2, l_tv, l_cm)

        (_, auxG), grad_noise = jax.value_and_grad(remat(loss_G), has_aux=True)(noise)
        (gradsG,) = g_vjp(grad_noise)
        stateG = stateG.apply_gradients(gradsG)
        x_bd, pred_bd, cm_bd, l_ce, l_l2, l_tv, l_cm = auxG

        if full_metrics:
            pred_clean = C.apply(varsC, aug(k[7], x), train=False)
            pred_F = _apply_eval(netF.apply_fn, netF.variables, detector_features(x_bd), dropout_key=k[8])

        metrics = {
            "sample": jnp.asarray(bs, jnp.float32),
            "loss_ce": l_ce,
            "loss_l2": l_l2,
            "loss_tv": l_tv,
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


# --------------------------------------------------------------------------
# Multilabel (class-conditional generator)
# --------------------------------------------------------------------------


def make_multilabel_train_step(cfg: Config, C, G):
    aug = _aug_fn(cfg)
    trig = _trigger_fn(cfg)
    full_metrics = full_metrics_mode(cfg)  # validates the flag; see config.train_metrics

    remat = _remat_wrapper(cfg)
    def step(stateC, stateG, clean_model, netF, batch, key):
        x, y = batch
        bs = x.shape[0]
        k = jax.random.split(key, 10)

        # C-step: Bernoulli(pc) rows (any class) triggered toward their OWN
        # label; labels unchanged (multilabel:160-188).
        noise = G.apply({"params": jax.lax.stop_gradient(stateG.params)}, x, y)
        x_bd_c = trig(k[0], x, noise)
        poison = jax.random.bernoulli(k[1], cfg.pc, y.shape)
        x_mix = aug(k[2], jnp.where(poison[:, None, None, None], x_bd_c, x))

        def loss_C(params):
            logits, mut = C.apply(
                {"params": params, "batch_stats": stateC.batch_stats}, x_mix, train=True, mutable=["batch_stats"]
            )
            return cross_entropy(logits, y), mut["batch_stats"]

        (_, new_bs), gradsC = jax.value_and_grad(remat(loss_C), has_aux=True)(stateC.params)
        stateC = stateC.apply_gradients(gradsC, batch_stats=new_bs)
        zero = jnp.zeros((), jnp.float32)
        if full_metrics:
            clean_preds = _apply_eval(clean_model.apply_fn, clean_model.variables, aug(k[3], x))
        varsC = {"params": stateC.params, "batch_stats": stateC.batch_stats}

        # G-step: row i targets class i // ceil(bs/K) — jit-friendly form of
        # the per-class chunk loop (multilabel:203-224).
        ps = (bs - 1) // cfg.num_classes + 1
        bd_targets = jnp.minimum(jnp.arange(bs) // ps, cfg.num_classes - 1).astype(y.dtype)

        def loss_G(paramsG):
            noise = G.apply({"params": paramsG}, x, bd_targets)
            x_bd = trig(k[4], x, noise)
            pred_bd = C.apply(varsC, aug(k[5], x_bd), train=False)
            l_ce = cross_entropy(pred_bd, bd_targets)
            l_l2 = jnp.mean((x_bd - x) ** 2)
            cm_bd = _apply_eval(clean_model.apply_fn, clean_model.variables, aug(k[6], x_bd))
            l_cm = cross_entropy(cm_bd, y)
            total = l_ce + cfg.L2_weight * l_l2 + cfg.clean_model_weight * l_cm
            return total, (x_bd, pred_bd, cm_bd, l_ce, l_l2, l_cm)

        (_, auxG), gradsG = jax.value_and_grad(remat(loss_G), has_aux=True)(stateG.params)
        stateG = stateG.apply_gradients(gradsG)
        x_bd, pred_bd, cm_bd, l_ce, l_l2, l_cm = auxG

        if full_metrics:
            pred_clean = C.apply(varsC, aug(k[7], x), train=False)
            pred_F = _apply_eval(netF.apply_fn, netF.variables, detector_features(x_bd), dropout_key=k[8])

        metrics = {
            "sample": jnp.asarray(bs, jnp.float32),
            "loss_ce": l_ce,
            "loss_l2": l_l2,
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


# --------------------------------------------------------------------------
# Victim variants
# --------------------------------------------------------------------------


def make_wanet_victim_train_step(cfg: Config, C, G):
    """Victim training with the warp trigger on the fixed poisoned subset
    (reference ``train_victim_wanet.py:58-135``, warp at ``:88-94``)."""
    aug = _aug_fn(cfg)

    remat = _remat_wrapper(cfg)
    def step(stateC: TrainState, paramsG, batch, key):
        x, y, poisoned = batch
        k = jax.random.split(key, 2)
        bd_targets = create_targets_bd(y, cfg.attack_mode, cfg.target_label, cfg.num_classes)
        flow = G.apply({"params": paramsG}, x)
        x_bd, _ = wanet_apply(x, flow, cfg.grid_rescale)
        x_mix = aug(k[0], jnp.where(poisoned[:, None, None, None], x_bd, x))
        labels = jnp.where(poisoned, bd_targets, y)

        def loss_fn(params):
            logits, mut = C.apply(
                {"params": params, "batch_stats": stateC.batch_stats}, x_mix, train=True, mutable=["batch_stats"]
            )
            return cross_entropy(logits, labels), (mut["batch_stats"], logits)

        (loss, (new_bs, logits)), grads = jax.value_and_grad(remat(loss_fn), has_aux=True)(stateC.params)
        stateC = stateC.apply_gradients(grads, batch_stats=new_bs)
        return stateC, {
            "sample": jnp.asarray(x.shape[0], jnp.float32),
            "loss_ce": loss,
            "clean_correct": jnp.sum(jnp.argmax(logits, -1) == labels).astype(jnp.float32),
        }

    return step


def make_wanet_victim_eval_step(cfg: Config, C, G):
    def step(varsC, paramsG, batch, key):
        x, y, valid = batch
        bd_targets = create_targets_bd(y, cfg.attack_mode, cfg.target_label, cfg.num_classes)
        preds_clean = C.apply(varsC, x, train=False)
        ntrg = (y != cfg.target_label) & valid
        flow = G.apply({"params": paramsG}, x)
        x_bd, _ = wanet_apply(x, flow, cfg.grid_rescale)
        preds_bd = C.apply(varsC, x_bd, train=False)
        vf, nf = valid.astype(jnp.float32), ntrg.astype(jnp.float32)
        return {
            "clean_sample": vf.sum(),
            "bd_sample": nf.sum(),
            "clean_correct": (vf * (jnp.argmax(preds_clean, -1) == y)).sum(),
            "bd_correct": (nf * (jnp.argmax(preds_bd, -1) == bd_targets)).sum(),
        }

    return step


def make_inputaware_victim_eval_step(cfg: Config, C, G):
    """Victim eval with cross-trigger accuracy from a second test stream
    (reference ``train_victim_inputaware.py:162-254``)."""
    trig = _trigger_fn(cfg)

    def step(varsC, paramsG, batch, key):
        x, y, x2, valid = batch
        k = jax.random.split(key, 2)
        bd_targets = create_targets_bd(y, cfg.attack_mode, cfg.target_label, cfg.num_classes)
        preds_clean = C.apply(varsC, x, train=False)
        ntrg = (y != cfg.target_label) & valid
        noise = G.apply({"params": paramsG}, x)
        x_bd = trig(k[0], x, noise)
        preds_bd = C.apply(varsC, x_bd, train=False)
        noise2 = G.apply({"params": paramsG}, x2)
        x_bd2 = trig(k[1], x, noise2)
        preds_cross = C.apply(varsC, x_bd2, train=False)
        vf, nf = valid.astype(jnp.float32), ntrg.astype(jnp.float32)
        return {
            "clean_sample": vf.sum(),
            "bd_sample": nf.sum(),
            "clean_correct": (vf * (jnp.argmax(preds_clean, -1) == y)).sum(),
            "bd_correct": (nf * (jnp.argmax(preds_bd, -1) == bd_targets)).sum(),
            "cross_correct": (nf * (jnp.argmax(preds_cross, -1) == y)).sum(),
        }

    return step


def make_multilabel_eval_step(cfg: Config, C, G):
    """Eval loops every target class ci, masking rows with y == ci
    (reference ``train_generator_multilabel.py:355-378``).  The class loop is
    a ``lax.map`` over the (static) class count."""
    trig = _trigger_fn(cfg)

    def step(varsC, paramsG, clean_model, netF, batch, key):
        x, y, valid = batch
        vf = valid.astype(jnp.float32)
        preds_clean = C.apply(varsC, x, train=False)
        cm_clean = _apply_eval(clean_model.apply_fn, clean_model.variables, x)

        def per_class(ci):
            tmp = jnp.full_like(y, ci)
            noise = G.apply({"params": paramsG}, x, tmp)
            x_bd = trig(jax.random.fold_in(key, ci), x, noise)
            preds_bd = C.apply(varsC, x_bd, train=False)
            cm_bd = _apply_eval(clean_model.apply_fn, clean_model.variables, x_bd)
            pred_F = _apply_eval(netF.apply_fn, netF.variables, detector_features(x_bd),
                                 dropout_key=jax.random.fold_in(key, 1000 + ci))
            nf = ((y != tmp) & valid).astype(jnp.float32)
            return {
                "bd_sample": nf.sum(),
                "bd_correct": (nf * (jnp.argmax(preds_bd, -1) == tmp)).sum(),
                "clean_model_bd_ba": (nf * (jnp.argmax(cm_bd, -1) == y)).sum(),
                "clean_model_bd_asr": (nf * (jnp.argmax(cm_bd, -1) == tmp)).sum(),
                # reference counts F over ALL rows each class pass (:378)
                "F_correct": (vf * (jnp.argmax(pred_F, -1) == 1)).sum(),
            }

        per = jax.lax.map(per_class, jnp.arange(cfg.num_classes))
        summed = jax.tree.map(lambda a: a.sum(0), per)
        return {
            "clean_sample": vf.sum(),
            "clean_correct": (vf * (jnp.argmax(preds_clean, -1) == y)).sum(),
            "clean_model_correct": (vf * (jnp.argmax(cm_clean, -1) == y)).sum(),
            **summed,
        }

    return step
