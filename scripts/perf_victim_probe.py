"""Probe: why does the victim *pipeline* stage log ~1.2k img/s when the
isolated victim step benches at ~27k img/s (internal tool)?

Reproduces cli/_victim.py's per-epoch structure (train_epoch_classifier +
eval_epoch on the full synthetic splits) and times each phase separately,
at both the pipeline's 50k-row dataset and the bench harness's 8k rows.

Run on the TPU: PYTHONPATH=/root/repo python scripts/perf_victim_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from combat_tpu.config import Config, apply_dataset_preset
    from combat_tpu.data import poison_flags, synthetic_dataset
    from combat_tpu.models import get_classifier, get_generator
    from combat_tpu.models.layers import set_compute_dtype
    from combat_tpu.train import (
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

    cfg = apply_dataset_preset(Config(dataset="cifar10", synthetic_data=True)).replace(
        bs=128, compute_dtype="bfloat16", pc=0.5, noise_rate=0.08
    )
    set_compute_dtype(cfg.compute_dtype)

    C = get_classifier(cfg)
    G = get_generator(cfg, "unet")
    key = jax.random.key(0)
    sample = jnp.zeros((1, 32, 32, 3))

    train_step = make_victim_train_step(cfg, C, G)
    eval_step = make_victim_eval_step(cfg, C, G)

    for n_train in (8192, 50000):
        ds = synthetic_dataset(cfg, True, n=n_train)
        tds = synthetic_dataset(cfg, False, n=min(10000, n_train))
        imgs, labs = jnp.asarray(ds.images), jnp.asarray(ds.labels)
        timgs, tlabs = jnp.asarray(tds.images), jnp.asarray(tds.labels)
        spe = imgs.shape[0] // cfg.bs
        flags = poison_flags(ds.labels, cfg.pc, cfg.target_label, cfg.attack_mode, seed=1)
        poisoned = jnp.asarray(flags)
        tx = sgd_torch(multistep_lr(cfg.lr_C, cfg.schedulerC_milestones, cfg.schedulerC_lambda, spe))
        stateC = init_train_state(C, key, sample, tx)
        paramsG = G.init({"params": jax.random.key(1)}, sample)["params"]
        eidx, evalid = padded_eval_batches(len(tds), cfg.bs)
        eidx, evalid = jnp.asarray(eidx), jnp.asarray(evalid)

        print(f"--- n_train={n_train} ---", flush=True)
        for epoch in range(4):
            t0 = time.perf_counter()
            stateC, m = train_epoch_classifier(
                train_step, stateC, paramsG, imgs, labs, poisoned,
                jax.random.fold_in(key, epoch), cfg.bs, has_poison=True,
            )
            m = metrics_to_host(m)
            t1 = time.perf_counter()
            em = metrics_to_host(eval_epoch(
                eval_step,
                ({"params": stateC.params, "batch_stats": stateC.batch_stats}, paramsG),
                timgs, tlabs, eidx, evalid, jax.random.fold_in(key, 10_000_000 + epoch), cfg.bs,
            ))
            t2 = time.perf_counter()
            print(
                f"epoch {epoch}: train {t1 - t0:.2f}s ({m['sample'] / (t1 - t0):.0f} img/s) | "
                f"eval {t2 - t1:.2f}s ({em['clean_sample'] / (t2 - t1):.0f} img/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
