"""Shared harness for victim-training entry points (base/imperceptible,
WaNet, input-aware).  Deduplicates the per-script main the reference copies
into ``train_victim*.py``; the multilabel victim lives in the alternated
harness instead (it continues G+C training)."""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..checkpoint import best_gate_clean, load_checkpoint, load_checkpoint_compat, save_checkpoint
from ..config import Config
from ..data import poison_flags
from ..models import get_classifier, get_generator
from ..train import (
    eval_epoch,
    init_train_state,
    make_victim_eval_step,
    make_victim_train_step,
    metrics_to_host,
    multistep_lr,
    multistep_lr_resume,
    padded_eval_batches,
    sgd_torch,
    train_epoch_classifier,
)
from ..utils import MetricsLogger, Timer, profile_epoch
from ..train.mesh import replicate
from .common import build_mesh, device_dataset, fmt_pct, ref_ckpt_path, setup_run_dirs, steps_per_epoch


@dataclass
class VictimSpec:
    name: str
    generator_kind: str = "unet"
    make_train_step: Callable = make_victim_train_step
    make_eval_step: Callable = make_victim_eval_step
    eval_pair: bool = False  # second test stream for cross accuracy
    track_cross: bool = False
    extra_ckpt: Optional[Callable[[Config], Dict]] = None


def run_victim(cfg: Config, spec: VictimSpec):
    mesh = build_mesh(cfg)
    imgs, labs, train_ds = device_dataset(cfg, mesh, True)
    timgs, tlabs, tds = device_dataset(cfg, mesh, False)
    spe = steps_per_epoch(imgs.shape[0], cfg.bs)

    flags = poison_flags(train_ds.labels, cfg.pc, cfg.target_label, cfg.attack_mode, seed=cfg.seed)
    n_candidates = (
        int((train_ds.labels == cfg.target_label).sum()) if cfg.attack_mode == "all2one" else len(train_ds.labels)
    )
    print(f"Poison {int(flags.sum())} images ({cfg.pc * n_candidates})")
    poisoned = jnp.asarray(flags)

    C = get_classifier(cfg)
    G = get_generator(cfg, spec.generator_kind)
    key = jax.random.key(cfg.seed)
    kC, kG, k_run = jax.random.split(key, 3)
    sample = jnp.zeros((1, cfg.input_height, cfg.input_width, cfg.input_channel))
    tx = sgd_torch(multistep_lr(cfg.lr_C, cfg.schedulerC_milestones, cfg.schedulerC_lambda, spe))
    stateC = init_train_state(C, kC, sample, tx)
    varsG = G.init({"params": kG}, sample)

    if not cfg.load_checkpoint:
        raise SystemExit("--load_checkpoint is required (generator run name, e.g. <prefix>_clean)")
    g_path = ref_ckpt_path(cfg.checkpoints, cfg.load_checkpoint, cfg.dataset)
    if not os.path.exists(g_path):
        raise SystemExit(f"Error: {g_path} not found")
    payload = load_checkpoint(g_path)
    paramsG = jax.tree.map(jnp.asarray, payload["netG"]["params"])

    mode = cfg.saving_prefix or spec.name
    ckpt_folder = os.path.join(cfg.checkpoints, f"{mode}_clean", cfg.dataset)
    ckpt_path = os.path.join(ckpt_folder, f"{cfg.dataset}_{mode}_clean.ckpt")
    extra = spec.extra_ckpt(cfg) if spec.extra_ckpt else {}

    best = {"best_clean_acc": 0.0, "best_bd_acc": 0.0}
    if spec.track_cross:
        best["best_cross_acc"] = 0.0
    epoch_current = 0

    def payload_of(epoch):
        return {
            "netC": {"params": stateC.params, "batch_stats": stateC.batch_stats},
            "schedulerC": {"step": stateC.step},
            "optimizerC": stateC.opt_state,
            "netG": {"params": paramsG},
            **best,
            **extra,
            # persist the epoch→step milestone binding (see _alternated.py)
            "scheduler_steps_per_epoch": spe,
            "epoch_current": epoch,
        }

    if cfg.continue_training:
        if not os.path.exists(ckpt_path):
            raise SystemExit("Pretrained model doesnt exist")
        print("Continue training!!")
        payload = load_checkpoint_compat(ckpt_path, payload_of(0))
        saved_spe = int(payload.get("scheduler_steps_per_epoch", spe))
        if saved_spe != spe:
            print(
                f"WARNING: checkpoint was trained at {saved_spe} steps/epoch but the "
                f"current dataset gives {spe}; re-anchoring the remaining LR milestones "
                "on the new cadence (epoch-indexed MultiStepLR semantics)"
            )
        # Rebuild the schedule anchored at the resume point: torch MultiStepLR
        # is epoch-indexed, so remaining milestones must fire at the right
        # EPOCH even if steps/epoch changed (multistep_lr_resume docstring);
        # with an unchanged cadence this is identical to the fresh schedule.
        stateC = stateC.replace(
            tx=sgd_torch(
                multistep_lr_resume(
                    cfg.lr_C, cfg.schedulerC_milestones, cfg.schedulerC_lambda, spe,
                    epochs_done=int(payload["epoch_current"]) + 1,
                    resume_step=int(payload["schedulerC"]["step"]),
                )
            )
        )
        stateC = stateC.replace(
            params=payload["netC"]["params"], batch_stats=payload["netC"]["batch_stats"],
            opt_state=payload["optimizerC"], step=jnp.asarray(payload["schedulerC"]["step"]),
        )
        # restored arrays are committed to one device; re-replicate over the
        # mesh so they compose with the sharded batches under jit
        stateC = replicate(mesh, stateC)
        best = {k: float(payload[k]) for k in best}
        epoch_current = int(payload["epoch_current"]) + 1
        log_dir = setup_run_dirs(cfg, ckpt_folder, fresh=False)
    else:
        print("Train from scratch!!!")
        log_dir = setup_run_dirs(cfg, ckpt_folder, fresh=True)

    logger = MetricsLogger(log_dir)
    train_step = spec.make_train_step(cfg, C, G)
    eval_step = spec.make_eval_step(cfg, C, G)
    eidx, evalid = padded_eval_batches(len(tds), cfg.bs)
    eidx, evalid = jnp.asarray(eidx), jnp.asarray(evalid)

    with mesh:
        for epoch in range(epoch_current, cfg.n_iters):
            with Timer() as t, profile_epoch(cfg.profile_dir, epoch, epoch_current):
                stateC, m = train_epoch_classifier(
                    train_step, stateC, paramsG, imgs, labs, poisoned,
                    jax.random.fold_in(k_run, epoch), cfg.bs, has_poison=True, chunk=cfg.scan_chunk,
                )
                m = metrics_to_host(m)
            n = m["sample"]
            ips = n / t.seconds
            em = metrics_to_host(eval_epoch(
                eval_step,
                ({"params": stateC.params, "batch_stats": stateC.batch_stats}, paramsG),
                timgs, tlabs, eidx, evalid, jax.random.fold_in(k_run, 10_000_000 + epoch), cfg.bs,
                with_pair=spec.eval_pair, chunk=cfg.scan_chunk,
            ))
            acc_clean = em["clean_correct"] * 100 / em["clean_sample"]
            acc_bd = em["bd_correct"] * 100 / max(em["bd_sample"], 1.0)
            line = (
                f"Epoch {epoch + 1}: CE Loss: {fmt_pct(m['loss_ce'] / n)} | "
                f"Train Acc: {fmt_pct(m['clean_correct'] * 100 / n)} | "
                f"Clean Acc: {fmt_pct(acc_clean)} - Best: {fmt_pct(best['best_clean_acc'])} | "
                f"Bd Acc: {fmt_pct(acc_bd)} - Best: {fmt_pct(best['best_bd_acc'])}"
            )
            scalars = {"Clean": acc_clean, "Bd": acc_bd}
            if spec.track_cross:
                cross = em["cross_correct"] * 100 / max(em["bd_sample"], 1.0)
                line += f" | Cross Acc: {fmt_pct(cross)}"
                scalars["Cross"] = cross
            line += f" | {ips:.0f} img/s"
            print(line)
            logger.log(epoch, {"loss_ce": m["loss_ce"] / n, "Clean": m["clean_correct"] * 100 / n,
                               "images_per_sec": ips})
            logger.log(epoch, scalars, group="test")
            if best_gate_clean(acc_clean, best["best_clean_acc"]):
                print(" Saving...")
                best["best_clean_acc"], best["best_bd_acc"] = acc_clean, acc_bd
                if spec.track_cross:
                    best["best_cross_acc"] = cross
                save_checkpoint(ckpt_path, payload_of(epoch))
    logger.close()
    return best
