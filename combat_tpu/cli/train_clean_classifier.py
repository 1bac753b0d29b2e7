"""Train the clean reference classifier.

CLI/semantics parity with reference ``train_clean_classifier.py``: per-epoch
augmented CE training (``train:75-121``), clean-accuracy eval (``eval:124-161``),
best-clean-acc checkpoint gate with keys {netC, schedulerC, optimizerC,
best_clean_acc, epoch_current} (``:150-160``), path scheme
``checkpoints/<prefix>/<dataset>/<dataset>_<prefix>.ckpt`` (``:191-193``),
``--continue_training`` resume (``:197-219``).

TPU-native: the whole dataset is device-resident and every epoch is one
compiled ``lax.scan`` (see train/loop.py).

Run (synthetic data smoke):
  python -m combat_tpu.cli.train_clean_classifier --dataset cifar10 \
      --synthetic_data --debug --n_iters 2 --saving_prefix cleanmodel
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..checkpoint import best_gate_clean, load_checkpoint_compat, save_checkpoint
from ..config import Config, from_args
from ..models import get_classifier
from ..train import (
    eval_epoch,
    init_train_state,
    make_clean_eval_step,
    make_clean_train_step,
    metrics_to_host,
    multistep_lr,
    multistep_lr_resume,
    padded_eval_batches,
    sgd_torch,
    train_epoch_classifier,
)
from ..utils import MetricsLogger, Timer, profile_epoch
from ..train.mesh import replicate
from .common import build_mesh, device_dataset, fmt_pct, setup_run_dirs, steps_per_epoch


def run(cfg: Config) -> float:
    mesh = build_mesh(cfg)
    imgs, labs, _ = device_dataset(cfg, mesh, True)
    timgs, tlabs, tds = device_dataset(cfg, mesh, False)
    spe = steps_per_epoch(imgs.shape[0], cfg.bs)

    C = get_classifier(cfg)
    tx = sgd_torch(multistep_lr(cfg.lr_C, cfg.schedulerC_milestones, cfg.schedulerC_lambda, spe))
    key = jax.random.key(cfg.seed)
    k_init, k_run = jax.random.split(key)
    sample = jnp.zeros((1, cfg.input_height, cfg.input_width, cfg.input_channel))
    stateC = init_train_state(C, k_init, sample, tx)

    mode = cfg.saving_prefix or "clean"
    ckpt_folder = os.path.join(cfg.checkpoints, mode, cfg.dataset)
    ckpt_path = os.path.join(ckpt_folder, f"{cfg.dataset}_{mode}.ckpt")

    best_clean_acc, epoch_current = 0.0, 0
    if cfg.continue_training:
        if not os.path.exists(ckpt_path):
            raise SystemExit("Pretrained model doesnt exist")
        print("Continue training!!")
        payload = load_checkpoint_compat(
            ckpt_path,
            {
                "netC": {"params": stateC.params, "batch_stats": stateC.batch_stats},
                "optimizerC": stateC.opt_state,
                "schedulerC": {"step": stateC.step},
                "best_clean_acc": 0.0,
                "scheduler_steps_per_epoch": 0,
                "epoch_current": 0,
            },
        )
        saved_spe = int(payload.get("scheduler_steps_per_epoch", spe)) or spe
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
            params=payload["netC"]["params"],
            batch_stats=payload["netC"]["batch_stats"],
            opt_state=payload["optimizerC"],
            step=jnp.asarray(payload["schedulerC"]["step"]),
        )
        # restored arrays are committed to one device; re-replicate over the
        # mesh so they compose with the sharded batches under jit
        stateC = replicate(mesh, stateC)
        best_clean_acc = float(payload["best_clean_acc"])
        epoch_current = int(payload["epoch_current"]) + 1
        log_dir = setup_run_dirs(cfg, ckpt_folder, fresh=False)
    else:
        print("Train from scratch!!!")
        log_dir = setup_run_dirs(cfg, ckpt_folder, fresh=True)

    logger = MetricsLogger(log_dir)
    train_step = make_clean_train_step(cfg, C)
    eval_step = make_clean_eval_step(C)
    eidx, evalid = padded_eval_batches(len(tds), cfg.bs)
    eidx, evalid = jnp.asarray(eidx), jnp.asarray(evalid)

    with mesh:
        for epoch in range(epoch_current, cfg.n_iters):
            with Timer() as t, profile_epoch(cfg.profile_dir, epoch, epoch_current):
                stateC, m = train_epoch_classifier(
                    train_step, stateC, None, imgs, labs, None,
                    jax.random.fold_in(k_run, epoch), cfg.bs, chunk=cfg.scan_chunk,
                )
                m = metrics_to_host(m)
            train_acc = m["clean_correct"] * 100.0 / m["sample"]
            ips = m["sample"] / t.seconds
            em = metrics_to_host(
                eval_epoch(eval_step, ({"params": stateC.params, "batch_stats": stateC.batch_stats},),
                           timgs, tlabs, eidx, evalid, jax.random.key(0), cfg.bs, with_key=False,
                           chunk=cfg.scan_chunk)
            )
            acc_clean = em["clean_correct"] * 100.0 / em["clean_sample"]
            print(
                f"Epoch {epoch + 1}: CE Loss: {fmt_pct(m['loss_ce'] / m['sample'])} | "
                f"Train Acc: {fmt_pct(train_acc)} | Clean Acc: {fmt_pct(acc_clean)} - Best: {fmt_pct(best_clean_acc)} | "
                f"{ips:.0f} img/s"
            )
            logger.log(epoch, {"loss_ce": m["loss_ce"] / m["sample"], "train_acc": train_acc, "images_per_sec": ips})
            logger.log(epoch, {"clean_acc": acc_clean}, group="test")
            if best_gate_clean(acc_clean, best_clean_acc):
                print(" Saving...")
                best_clean_acc = acc_clean
                save_checkpoint(
                    ckpt_path,
                    {
                        "netC": {"params": stateC.params, "batch_stats": stateC.batch_stats},
                        "optimizerC": stateC.opt_state,
                        "schedulerC": {"step": stateC.step},
                        "best_clean_acc": best_clean_acc,
                        # epoch→step milestone binding (see _alternated.py)
                        "scheduler_steps_per_epoch": spe,
                        "epoch_current": epoch,
                    },
                )
    logger.close()
    return best_clean_acc


def main(argv=None):
    cfg = from_args(argv)
    run(cfg)


if __name__ == "__main__":
    main()
