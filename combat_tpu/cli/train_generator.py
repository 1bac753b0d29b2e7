"""Alternated training of trigger generator G + surrogate classifier C.

CLI/semantics parity with reference ``train_generator.py``: per batch, (1) a
C-step on Bernoulli(pc)-poisoned target-class rows with clean labels, (2) a
G-step minimizing ``CE(C(aug(x_bd)), target) + L2_weight*MSE +
clean_model_weight*CE(cleanModel(aug(x_bd)), y)`` against a frozen clean
model, with frequency-detector evasion tracked as a metric
(``train:131-318``); eval-side Clean/Bd/F/clean-model metrics over non-target
rows (``eval:321-465``); lexicographic (clean acc, bd acc) best gate and the
full checkpoint key layout (``:433-457``); loads the pretrained frequency
detector and clean model (``main:503-527``); ``--continue_training`` resume
(``:529-552``).

TPU-native: the whole alternated batch (2 fwd+bwd + 4 aux forwards + trigger
synthesis + augs + metrics) is one fused jitted step, scanned over the epoch
(train/steps.py, train/loop.py).

Example (synthetic smoke):
  python -m combat_tpu.cli.train_clean_classifier --synthetic_data --debug \
      --n_iters 2 --saving_prefix cleanrun
  python -m combat_tpu.cli.train_generator --synthetic_data --debug \
      --n_iters 2 --saving_prefix atk --load_checkpoint_clean cleanrun
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..checkpoint import best_gate_attack, load_checkpoint, save_checkpoint
from ..config import Config, from_args
from ..models import get_classifier, get_frequency_detector, get_generator
from ..train import (
    FrozenModel,
    eval_epoch,
    init_frozen,
    init_train_state,
    make_alternated_train_step,
    make_attack_eval_step,
    metrics_to_host,
    multistep_lr,
    padded_eval_batches,
    sgd_torch,
    train_epoch_alternated,
)
from ..utils import MetricsLogger, Timer
from .common import build_mesh, device_dataset, fmt_pct, ref_ckpt_path, setup_run_dirs, steps_per_epoch

BEST_KEYS = (
    "best_clean_acc",
    "best_bd_acc",
    "best_F_acc",
    "best_clean_model_acc",
    "best_clean_model_bd_ba",
    "best_clean_model_bd_asr",
)


def _state_payload(stateC, stateG, clean_model, best, epoch):
    return {
        "netC": {"params": stateC.params, "batch_stats": stateC.batch_stats},
        "schedulerC": {"step": stateC.step},
        "optimizerC": stateC.opt_state,
        "netG": {"params": stateG.params},
        "schedulerG": {"step": stateG.step},
        "optimizerG": stateG.opt_state,
        "clean_model": {"params": clean_model.params, "batch_stats": clean_model.batch_stats},
        **best,
        "epoch_current": epoch,
    }


def run(cfg: Config):
    mesh = build_mesh(cfg)
    imgs, labs, _ = device_dataset(cfg, mesh, True)
    timgs, tlabs, tds = device_dataset(cfg, mesh, False)
    spe = steps_per_epoch(imgs.shape[0], cfg.bs)

    C = get_classifier(cfg)
    G = get_generator(cfg, "unet")
    F = get_frequency_detector(cfg)
    key = jax.random.key(cfg.seed)
    kC, kG, kF, kCM, k_run = jax.random.split(key, 5)
    sample = jnp.zeros((1, cfg.input_height, cfg.input_width, cfg.input_channel))

    txC = sgd_torch(multistep_lr(cfg.lr_C, cfg.schedulerC_milestones, cfg.schedulerC_lambda, spe))
    txG = sgd_torch(multistep_lr(cfg.lr_G, cfg.schedulerG_milestones, cfg.schedulerG_lambda, spe))
    stateC = init_train_state(C, kC, sample, txC)
    stateG = init_train_state(G, kG, sample, txG)
    netF = init_frozen(F, kF, sample)
    clean_model = init_frozen(C, kCM, sample)

    # ---- run dirs (reference :497-501) ----
    mode = cfg.saving_prefix or "attack"
    ckpt_folder = os.path.join(cfg.checkpoints, f"{mode}_clean", cfg.dataset)
    ckpt_path = os.path.join(ckpt_folder, f"{cfg.dataset}_{mode}_clean.ckpt")

    # ---- frozen frequency detector (reference :503-512) ----
    f_ckpt = os.path.join(
        cfg.F_checkpoints, cfg.dataset, cfg.F_model, f"{cfg.dataset}_{cfg.F_model}_detector.ckpt"
    )
    print(f"Loading {cfg.F_model} at {f_ckpt}")
    if os.path.exists(f_ckpt):
        payload = load_checkpoint(f_ckpt)
        netF = netF.replace(
            params=jax.tree.map(jnp.asarray, payload["netC"]["params"]),
            batch_stats=jax.tree.map(jnp.asarray, payload["netC"]["batch_stats"]),
        )
        print("Done")
    else:
        # netF only feeds the F-evasion *metric* (never G's loss —
        # reference :245-253), so training proceeds with a random detector.
        print(f"WARNING: frequency-detector checkpoint not found at {f_ckpt}; "
              "F Acc metrics will be meaningless (train one with combat_tpu.defenses.frequency).")

    # ---- frozen clean model (reference :514-527) ----
    if not cfg.load_checkpoint_clean:
        raise SystemExit("--load_checkpoint_clean is required (path to the clean-classifier run prefix)")
    clean_path = ref_ckpt_path(cfg.checkpoints, cfg.load_checkpoint_clean, cfg.dataset)
    if not os.path.exists(clean_path):
        raise SystemExit(f"Error: {clean_path} not found")
    payload = load_checkpoint(clean_path)
    clean_model = clean_model.replace(
        params=jax.tree.map(jnp.asarray, payload["netC"]["params"]),
        batch_stats=jax.tree.map(jnp.asarray, payload["netC"]["batch_stats"]),
    )

    best = {k: 0.0 for k in BEST_KEYS}
    epoch_current = 0
    if cfg.continue_training:
        if not os.path.exists(ckpt_path):
            raise SystemExit("Pretrained model doesnt exist")
        print("Continue training!!")
        template = _state_payload(stateC, stateG, clean_model, best, 0)
        payload = load_checkpoint(ckpt_path, template)
        stateC = stateC.replace(
            params=payload["netC"]["params"], batch_stats=payload["netC"]["batch_stats"],
            opt_state=payload["optimizerC"], step=jnp.asarray(payload["schedulerC"]["step"]),
        )
        stateG = stateG.replace(
            params=payload["netG"]["params"], opt_state=payload["optimizerG"],
            step=jnp.asarray(payload["schedulerG"]["step"]),
        )
        clean_model = clean_model.replace(
            params=payload["clean_model"]["params"], batch_stats=payload["clean_model"]["batch_stats"]
        )
        best = {k: float(payload[k]) for k in BEST_KEYS}
        epoch_current = int(payload["epoch_current"]) + 1
        log_dir = setup_run_dirs(cfg, ckpt_folder, fresh=False)
    else:
        print("Train from scratch!!!")
        log_dir = setup_run_dirs(cfg, ckpt_folder, fresh=True)

    logger = MetricsLogger(log_dir)
    train_step = make_alternated_train_step(cfg, C, G)
    eval_step = make_attack_eval_step(cfg, C, G)
    eidx, evalid = padded_eval_batches(len(tds), cfg.bs)
    eidx, evalid = jnp.asarray(eidx), jnp.asarray(evalid)

    with mesh:
        for epoch in range(epoch_current, cfg.n_iters):
            with Timer() as t:
                stateC, stateG, m = train_epoch_alternated(
                    train_step, stateC, stateG, clean_model, netF, imgs, labs,
                    jax.random.fold_in(k_run, epoch), cfg.bs,
                )
                m = metrics_to_host(m)
            n = m["sample"]
            ips = n / t.seconds
            print(
                f"Epoch {epoch + 1}: Clean Acc: {fmt_pct(m['clean_correct'] * 100 / n)} | "
                f"Bd Acc: {fmt_pct(m['bd_correct'] * 100 / n)} | F Acc: {fmt_pct(m['F_correct'] * 100 / n)} | "
                f"Clean Model Acc: {fmt_pct(m['clean_model_correct'] * 100 / n)} | "
                f"Clean Model Bd BA: {fmt_pct(m['clean_model_bd_ba'] * 100 / n)} | "
                f"Clean Model Bd ASR: {fmt_pct(m['clean_model_bd_asr'] * 100 / n)} | {ips:.0f} img/s"
            )
            logger.log(epoch, {
                "Clean": m["clean_correct"] * 100 / n, "Bd": m["bd_correct"] * 100 / n,
                "F": m["F_correct"] * 100 / n, "CleanModel Acc": m["clean_model_correct"] * 100 / n,
                "CleanModel Bd BA": m["clean_model_bd_ba"] * 100 / n,
                "CleanModel Bd ASR": m["clean_model_bd_asr"] * 100 / n,
                "L2 Loss": m["loss_l2"] / n, "Grad L2 Loss": m["loss_grad_l2"] / n,
                "CleanModel Loss": m["clean_model_loss"] / n, "images_per_sec": ips,
            })

            em = metrics_to_host(eval_epoch(
                eval_step,
                ({"params": stateC.params, "batch_stats": stateC.batch_stats}, stateG.params, clean_model, netF),
                timgs, tlabs, eidx, evalid, jax.random.fold_in(k_run, 10_000_000 + epoch), cfg.bs,
            ))
            cs, bs_ = em["clean_sample"], max(em["bd_sample"], 1.0)
            acc_clean = em["clean_correct"] * 100 / cs
            acc_bd = em["bd_correct"] * 100 / bs_
            acc_F = em["F_correct"] * 100 / bs_
            acc_cm = em["clean_model_correct"] * 100 / cs
            ba_cm = em["clean_model_bd_ba"] * 100 / bs_
            asr_cm = em["clean_model_bd_asr"] * 100 / bs_
            print(
                f"  Eval: Clean Acc: {fmt_pct(acc_clean)} - Best: {fmt_pct(best['best_clean_acc'])} | "
                f"Bd Acc: {fmt_pct(acc_bd)} - Best: {fmt_pct(best['best_bd_acc'])} | F Acc: {fmt_pct(acc_F)}"
            )
            logger.log(epoch, {"Clean": acc_clean, "Bd": acc_bd, "F": acc_F,
                               "Clean Model Acc": acc_cm, "Clean Model Bd BA": ba_cm,
                               "Clean Model Bd ASR": asr_cm}, group="test")

            if best_gate_attack(acc_clean, acc_bd, best["best_clean_acc"], best["best_bd_acc"]):
                print(" Saving...")
                best = dict(zip(BEST_KEYS, (acc_clean, acc_bd, acc_F, acc_cm, ba_cm, asr_cm)))
                save_checkpoint(ckpt_path, _state_payload(stateC, stateG, clean_model, best, epoch))
    logger.close()
    return best


def main(argv=None):
    run(from_args(argv))


if __name__ == "__main__":
    main()
