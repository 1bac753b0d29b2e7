"""AOT HBM probe for the alternated epoch at imagenet10 scale.

The 10k-image 224px alternated stage killed the TPU worker twice (r3e
without remat, r3h with ``--remat step``) at the first epoch's metric
read-back, while the identical 2k-image recipe and the 10k clean-classifier
stage both ran fine.  This probe lowers+compiles the exact epoch program at
both geometries WITHOUT executing it (abstract ``ShapeDtypeStruct`` inputs —
zero device allocation) and prints XLA's memory analysis, so we can see
whether the failure is an HBM overflow and how far over the ceiling we are.

Usage: python scripts/hbm_probe.py [n_images ...]
"""

import sys

import jax
import jax.numpy as jnp

from combat_tpu.config import Config, apply_dataset_preset, from_args
from combat_tpu.models import get_classifier, get_frequency_detector, get_generator
from combat_tpu.train import init_frozen, init_train_state, multistep_lr, sgd_torch
from combat_tpu.train.loop import train_epoch_alternated
from combat_tpu.train.steps import make_alternated_train_step


def analyze(n: int, remat: str, bs: int = 32, train_metrics: str = "full") -> None:
    cfg = apply_dataset_preset(
        Config(
            dataset="imagenet10", synthetic_data=True, synthetic_size=n, bs=bs,
            remat=remat, train_metrics=train_metrics,
        )
    )
    C = get_classifier(cfg)
    G = get_generator(cfg, "unet")
    F = get_frequency_detector(cfg)
    sample = jnp.zeros((1, cfg.input_height, cfg.input_width, cfg.input_channel))
    spe = (n + bs - 1) // bs
    txC = sgd_torch(multistep_lr(cfg.lr_C, cfg.schedulerC_milestones, cfg.schedulerC_lambda, spe))
    txG = sgd_torch(multistep_lr(cfg.lr_G, cfg.schedulerG_milestones, cfg.schedulerG_lambda, spe))

    # Abstract state trees: shapes only, no device memory.
    stateC = jax.eval_shape(lambda k: init_train_state(C, k, sample, txC), jax.random.key(0))
    stateG = jax.eval_shape(lambda k: init_train_state(G, k, sample, txG), jax.random.key(1))
    netF = jax.eval_shape(lambda k: init_frozen(F, k, sample), jax.random.key(2))
    clean = jax.eval_shape(lambda k: init_frozen(C, k, sample), jax.random.key(3))

    imgs = jax.ShapeDtypeStruct((n, cfg.input_height, cfg.input_width, cfg.input_channel), jnp.uint8)
    labs = jax.ShapeDtypeStruct((n,), jnp.int32)
    key = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)

    step_fn = make_alternated_train_step(cfg, C, G)
    lowered = train_epoch_alternated.lower(step_fn, stateC, stateG, clean, netF, imgs, labs, key, bs)
    mem = lowered.compile().memory_analysis()
    gb = 1024**3
    print(
        f"n={n:6d} bs={bs:3d} remat={remat:5s} metrics={train_metrics:9s} | "
        f"args {mem.argument_size_in_bytes / gb:6.2f} GB | "
        f"out {mem.output_size_in_bytes / gb:6.2f} GB | temp {mem.temp_size_in_bytes / gb:6.2f} GB | "
        f"alias {mem.alias_size_in_bytes / gb:6.2f} GB | "
        f"peak<= {(mem.argument_size_in_bytes + mem.output_size_in_bytes + mem.temp_size_in_bytes - mem.alias_size_in_bytes) / gb:6.2f} GB",
        flush=True,
    )


if __name__ == "__main__":
    d = jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)() or {}
    print("devices:", jax.devices(), "| bytes_limit:", stats.get("bytes_limit"), flush=True)
    if sys.argv[1:] == ["sweep"]:
        for bs in (32, 16):
            for tm in ("full", "loss_only"):
                analyze(10000, "step", bs=bs, train_metrics=tm)
        analyze(10000, "none", bs=16)
    else:
        sizes = [int(a) for a in sys.argv[1:]] or [2000, 10000]
        for n in sizes:
            for remat in ("none", "step"):
                analyze(n, remat)
