"""Train a victim classifier on a fixed poisoned subset with a frozen G.

CLI/semantics parity with reference ``train_victim.py``: deterministic
poison-index selection of ``int(pc * |target class|)`` rows
(``utils/dataloader_cleanbd.py:142-150``), trigger application identical to
the generator script (``train:119-130``), CE on clean labels (poisoned rows
keep their target-class label under all2one), best-clean-acc checkpoint with
keys {netC, schedulerC, optimizerC, netG, best_clean_acc, best_bd_acc,
epoch_current} (``eval:221-230``), G loaded frozen from the generator run
(``main:270-280``).

The reference's ``(poisoned is False).nonzero()`` bug (``train_victim.py:121``)
is fixed by construction — the step consumes the boolean poison mask with
``where`` so non-poisoned rows are never dropped (SURVEY.md §7.3 policy).
``train_victim_imperceptible.py`` is byte-identical to ``train_victim.py``
upstream, so this entry point serves the imperceptible variant too.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..checkpoint import best_gate_clean, load_checkpoint, save_checkpoint
from ..config import Config, from_args
from ..data import poison_flags
from ..models import get_classifier, get_generator
from ..train import (
    eval_epoch,
    init_train_state,
    make_victim_eval_step,
    make_victim_train_step,
    metrics_to_host,
    multistep_lr,
    padded_eval_batches,
    sgd_torch,
    train_epoch_classifier,
)
from ..utils import MetricsLogger, Timer
from .common import build_mesh, device_dataset, fmt_pct, ref_ckpt_path, setup_run_dirs, steps_per_epoch


def run(cfg: Config):
    mesh = build_mesh(cfg)
    imgs, labs, train_ds = device_dataset(cfg, mesh, True)
    timgs, tlabs, tds = device_dataset(cfg, mesh, False)
    spe = steps_per_epoch(imgs.shape[0], cfg.bs)

    # Fixed poison subset (PoisonedDataset parity).
    flags = poison_flags(train_ds.labels, cfg.pc, cfg.target_label, cfg.attack_mode, seed=cfg.seed)
    n_candidates = (
        int((train_ds.labels == cfg.target_label).sum()) if cfg.attack_mode == "all2one" else len(train_ds.labels)
    )
    print(f"Poison {int(flags.sum())} images ({cfg.pc * n_candidates})")
    poisoned = jnp.asarray(flags)

    C = get_classifier(cfg)
    G = get_generator(cfg, "unet")
    key = jax.random.key(cfg.seed)
    kC, kG, k_run = jax.random.split(key, 3)
    sample = jnp.zeros((1, cfg.input_height, cfg.input_width, cfg.input_channel))
    tx = sgd_torch(multistep_lr(cfg.lr_C, cfg.schedulerC_milestones, cfg.schedulerC_lambda, spe))
    stateC = init_train_state(C, kC, sample, tx)
    varsG = G.init({"params": kG}, sample)

    # Load frozen G from the generator run (reference :270-280).
    if not cfg.load_checkpoint:
        raise SystemExit("--load_checkpoint is required (generator run name, e.g. <prefix>_clean)")
    g_path = ref_ckpt_path(cfg.checkpoints, cfg.load_checkpoint, cfg.dataset)
    if not os.path.exists(g_path):
        raise SystemExit(f"Error: {g_path} not found")
    payload = load_checkpoint(g_path)
    paramsG = jax.tree.map(jnp.asarray, payload["netG"]["params"])

    mode = cfg.saving_prefix or "victim"
    ckpt_folder = os.path.join(cfg.checkpoints, f"{mode}_clean", cfg.dataset)
    ckpt_path = os.path.join(ckpt_folder, f"{cfg.dataset}_{mode}_clean.ckpt")

    best_clean_acc, best_bd_acc, epoch_current = 0.0, 0.0, 0
    if cfg.continue_training:
        if not os.path.exists(ckpt_path):
            raise SystemExit("Pretrained model doesnt exist")
        print("Continue training!!")
        template = {
            "netC": {"params": stateC.params, "batch_stats": stateC.batch_stats},
            "schedulerC": {"step": stateC.step},
            "optimizerC": stateC.opt_state,
            "netG": {"params": paramsG},
            "best_clean_acc": 0.0,
            "best_bd_acc": 0.0,
            "epoch_current": 0,
        }
        payload = load_checkpoint(ckpt_path, template)
        stateC = stateC.replace(
            params=payload["netC"]["params"], batch_stats=payload["netC"]["batch_stats"],
            opt_state=payload["optimizerC"], step=jnp.asarray(payload["schedulerC"]["step"]),
        )
        best_clean_acc = float(payload["best_clean_acc"])
        best_bd_acc = float(payload["best_bd_acc"])
        epoch_current = int(payload["epoch_current"]) + 1
        log_dir = setup_run_dirs(cfg, ckpt_folder, fresh=False)
    else:
        print("Train from scratch!!!")
        log_dir = setup_run_dirs(cfg, ckpt_folder, fresh=True)

    logger = MetricsLogger(log_dir)
    train_step = make_victim_train_step(cfg, C, G)
    eval_step = make_victim_eval_step(cfg, C, G)
    eidx, evalid = padded_eval_batches(len(tds), cfg.bs)
    eidx, evalid = jnp.asarray(eidx), jnp.asarray(evalid)

    with mesh:
        for epoch in range(epoch_current, cfg.n_iters):
            with Timer() as t:
                stateC, m = train_epoch_classifier(
                    train_step, stateC, paramsG, imgs, labs, poisoned,
                    jax.random.fold_in(k_run, epoch), cfg.bs, has_poison=True,
                )
                m = metrics_to_host(m)
            n = m["sample"]
            ips = n / t.seconds
            em = metrics_to_host(eval_epoch(
                eval_step,
                ({"params": stateC.params, "batch_stats": stateC.batch_stats}, paramsG),
                timgs, tlabs, eidx, evalid, jax.random.fold_in(k_run, 10_000_000 + epoch), cfg.bs,
            ))
            acc_clean = em["clean_correct"] * 100 / em["clean_sample"]
            acc_bd = em["bd_correct"] * 100 / max(em["bd_sample"], 1.0)
            print(
                f"Epoch {epoch + 1}: CE Loss: {fmt_pct(m['loss_ce'] / n)} | "
                f"Train Acc: {fmt_pct(m['clean_correct'] * 100 / n)} | "
                f"Clean Acc: {fmt_pct(acc_clean)} - Best: {fmt_pct(best_clean_acc)} | "
                f"Bd Acc: {fmt_pct(acc_bd)} - Best: {fmt_pct(best_bd_acc)} | {ips:.0f} img/s"
            )
            logger.log(epoch, {"loss_ce": m["loss_ce"] / n, "Clean": m["clean_correct"] * 100 / n,
                               "images_per_sec": ips})
            logger.log(epoch, {"Clean": acc_clean, "Bd": acc_bd}, group="test")
            if best_gate_clean(acc_clean, best_clean_acc):
                print(" Saving...")
                best_clean_acc, best_bd_acc = acc_clean, acc_bd
                save_checkpoint(ckpt_path, {
                    "netC": {"params": stateC.params, "batch_stats": stateC.batch_stats},
                    "schedulerC": {"step": stateC.step},
                    "optimizerC": stateC.opt_state,
                    "netG": {"params": paramsG},
                    "best_clean_acc": best_clean_acc,
                    "best_bd_acc": best_bd_acc,
                    "epoch_current": epoch,
                })
    logger.close()
    return best_clean_acc, best_bd_acc


def main(argv=None):
    run(from_args(argv))


if __name__ == "__main__":
    main()
