"""Train the DCT-domain frequency detector on synthetic corruptions.

CLI parity with reference ``defenses/frequency_based/train.py:275-344``:
per-dataset geometry, Adadelta lr 0.05 wd 1e-4 for the "original" backbone /
Adam lr 0.02 wd 1e-4 for alternatives (``get_model:146-175``), best-acc
checkpoint {netC, optimizerC, best_acc, epoch_current} under
``<F_checkpoints>/<dataset>/<model>/<dataset>_<model>_detector.ckpt``
(``:310-311``) — the exact path the generator scripts load from.

Run (synthetic smoke):
  python -m combat_tpu.defenses.frequency_train --synthetic_data --debug \
      --n_iters 2 --F_model original
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import optax

from ..checkpoint import load_checkpoint, save_checkpoint
from ..cli.common import build_mesh, setup_run_dirs, steps_per_epoch
from ..config import Config, from_args
from ..data import get_dataset
from ..models import get_frequency_detector
from ..train import eval_epoch, init_train_state, metrics_to_host, padded_eval_batches, train_epoch_classifier
from ..utils import MetricsLogger, Timer
from .frequency import make_detector_eval_step, make_detector_train_step


def detector_optimizer(cfg: Config) -> optax.GradientTransformation:
    if cfg.F_model in ("original", "original_holdout", "original_dropout", "original_dropout_ensemble"):
        return optax.chain(optax.add_decayed_weights(1e-4), optax.adadelta(0.05))
    return optax.chain(optax.add_decayed_weights(1e-4), optax.adam(0.02))


def run(cfg: Config):
    mesh = build_mesh(cfg)
    train_ds = get_dataset(cfg, train=True)
    test_ds = get_dataset(cfg, train=False)
    # frequency dataloaders yield [0,1] images (reference train.py:301-302)
    imgs01 = jnp.asarray((train_ds.images + 1.0) / 2.0)
    labs = jnp.asarray(train_ds.labels)
    timgs01 = jnp.asarray((test_ds.images + 1.0) / 2.0)
    tlabs = jnp.asarray(test_ds.labels)

    C = get_frequency_detector(cfg)
    tx = detector_optimizer(cfg)
    key = jax.random.key(cfg.seed)
    sample = jnp.zeros((1, cfg.input_height, cfg.input_width, cfg.input_channel))
    state = init_train_state(C, key, sample, tx)

    ckpt_folder = os.path.join(cfg.F_checkpoints, cfg.dataset, cfg.F_model)
    ckpt_path = os.path.join(ckpt_folder, f"{cfg.dataset}_{cfg.F_model}_detector.ckpt")

    best_acc, epoch_current = 0.0, 0
    if cfg.continue_training:
        if not os.path.exists(ckpt_path):
            raise SystemExit("Pretrained model doesnt exist")
        print("Continue training!!")
        payload = load_checkpoint(ckpt_path)
        state = state.replace(
            params=jax.tree.map(jnp.asarray, payload["netC"]["params"]),
            batch_stats=jax.tree.map(jnp.asarray, payload["netC"]["batch_stats"]),
        )
        best_acc = float(payload["best_acc"])
        epoch_current = int(payload["epoch_current"]) + 1
        log_dir = setup_run_dirs(cfg, ckpt_folder, fresh=False)
    else:
        print("Train from scratch!!!")
        log_dir = setup_run_dirs(cfg, ckpt_folder, fresh=True)

    logger = MetricsLogger(log_dir, run_name="detector")
    train_step = make_detector_train_step(C, tx)
    eval_step = make_detector_eval_step(C)
    eidx, evalid = padded_eval_batches(len(test_ds), cfg.bs)
    eidx, evalid = jnp.asarray(eidx), jnp.asarray(evalid)

    with mesh:
        for epoch in range(epoch_current, cfg.n_iters):
            with Timer() as t:
                state, m = train_epoch_classifier(
                    train_step, state, None, imgs01, labs, None, jax.random.fold_in(key, epoch), cfg.bs,
                    chunk=cfg.scan_chunk,
                )
                m = metrics_to_host(m)
            acc_train = m["correct"] * 100 / m["sample"]
            em = metrics_to_host(eval_epoch(
                eval_step, ({"params": state.params, "batch_stats": state.batch_stats},),
                timgs01, tlabs, eidx, evalid, jax.random.fold_in(key, 7_000_000 + epoch), cfg.bs,
                chunk=cfg.scan_chunk,
            ))
            acc = em["correct"] * 100 / em["sample"]
            print(f"Epoch {epoch + 1}: CE Loss: {m['loss_ce'] / m['sample']:.4f} | Train Acc: {acc_train:.4f} | "
                  f"Acc: {acc:.4f} - Best: {best_acc:.4f} | {m['sample'] / t.seconds:.0f} img/s")
            logger.log(epoch, {"loss_ce": m["loss_ce"] / m["sample"], "train_acc": acc_train})
            logger.log(epoch, {"acc": acc}, group="test")
            if acc > best_acc:
                print(" Saving...")
                best_acc = acc
                save_checkpoint(ckpt_path, {
                    "netC": {"params": state.params, "batch_stats": state.batch_stats},
                    "optimizerC": state.opt_state,
                    "best_acc": best_acc,
                    "epoch_current": epoch,
                })
    logger.close()
    return best_acc


def main(argv=None):
    run(from_args(argv))


if __name__ == "__main__":
    main()
