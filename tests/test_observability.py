"""Observability + multi-host plumbing: image grids, profiler gating,
distributed-init decision logic, STRIP mode flag."""

import json
import os

import numpy as np

from combat_tpu.cli.common import distributed_init_kwargs
from combat_tpu.config import Config
from combat_tpu.utils import MetricsLogger, profile_epoch
from combat_tpu.utils.logging import profile_epoch as _pe  # same object via package


def test_distributed_init_kwargs_gating():
    assert distributed_init_kwargs(Config()) is None
    # bare multihost: auto-detect form (empty kwargs)
    assert distributed_init_kwargs(Config(multihost=True)) == {}
    kw = distributed_init_kwargs(
        Config(multihost=True, coordinator_address="h:1234", num_processes=4, process_id=1)
    )
    assert kw == {"coordinator_address": "h:1234", "num_processes": 4, "process_id": 1}


def test_profile_epoch_noop_without_dir(tmp_path):
    ran = []
    with profile_epoch("", epoch=1, first_epoch=0):
        ran.append(1)
    assert ran == [1]
    # wrong epoch: no trace dir created
    with profile_epoch(str(tmp_path / "prof"), epoch=0, first_epoch=0):
        pass
    assert not (tmp_path / "prof").exists()


def test_profile_epoch_traces_second_epoch(tmp_path):
    import jax
    import jax.numpy as jnp

    prof = tmp_path / "prof"
    with profile_epoch(str(prof), epoch=1, first_epoch=0):
        float(jnp.square(jnp.arange(8.0)).sum())
    assert prof.exists() and any(prof.rglob("*"))


def test_log_images_grid(tmp_path):
    logger = MetricsLogger(str(tmp_path))
    imgs = np.random.RandomState(0).uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)
    logger.log_images(0, imgs, ncol=2)  # no-throw; grid written if tb present
    logger.log(0, {"F_detector_loaded": 1}, group="meta")
    logger.close()
    rec = [json.loads(line) for line in open(os.path.join(tmp_path, "train.jsonl"))]
    assert rec[-1]["group"] == "meta" and rec[-1]["F_detector_loaded"] == 1


def test_strip_mode_flag_reachable():
    """--strip_mode clean must be accepted (the round-1 heuristic
    '2 in attack_mode' made the benign baseline unreachable)."""
    import argparse

    from combat_tpu.config import build_parser

    parser = build_parser()
    parser.add_argument("--strip_mode", choices=["attack", "clean"], default="attack")
    ns = parser.parse_args(["--strip_mode", "clean", "--attack_mode", "all2one"])
    assert ns.strip_mode == "clean"
