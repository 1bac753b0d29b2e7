"""Resume (--continue_training) regressions.

Covers the two checkpoint-robustness guarantees added in round 3:
  * resuming under a different dataset size / batch size rebuilds the
    MultiStepLR schedule on the checkpoint's recorded steps-per-epoch, so
    the epoch-indexed milestone boundaries (reference MultiStepLR semantics,
    ``train_clean_classifier.py:205-210``) never silently shift;
  * checkpoints written before the optional top-level keys existed
    (``scheduler_steps_per_epoch``, ``F_detector_loaded``) still restore
    (orbax structure matching rejects template keys absent on disk).
"""

import os

import pytest


def _run(args):
    from combat_tpu.cli import train_clean_classifier as tcc
    from combat_tpu.config import from_args

    return tcc.run(from_args(args))


@pytest.mark.slow
def test_resume_lr_milestones_and_old_checkpoint_compat(tmp_path, monkeypatch):
    ck = str(tmp_path / "checkpoints")
    base = [
        "--dataset", "cifar10", "--synthetic_data", "--debug", "--model", "lenet",
        "--saving_prefix", "rsm", "--checkpoints", ck, "--temps", str(tmp_path / "temps"),
    ]
    _run(base + ["--n_iters", "1"])  # bs=128 -> ceil(1000/128) = 8 steps/epoch at debug scale

    # Resume at a different batch size (ceil(1000/200) = 5 steps/epoch): the
    # LR schedule must be rebuilt on the checkpoint's 8 steps/epoch so
    # milestone boundaries keep their original epoch positions.
    import combat_tpu.cli.train_clean_classifier as tcc

    from combat_tpu.checkpoint import load_checkpoint, save_checkpoint

    path = os.path.join(ck, "rsm", "cifar10", "cifar10_rsm.ckpt")
    # zero the best-acc gate so the resumed run is guaranteed to save
    payload = load_checkpoint(path)
    payload["best_clean_acc"] = 0.0
    save_checkpoint(path, payload)

    spe_calls = []
    real = tcc.multistep_lr
    monkeypatch.setattr(
        tcc, "multistep_lr",
        lambda lr, ms, gamma, spe: (spe_calls.append(spe), real(lr, ms, gamma, spe))[1],
    )
    _run(base + ["--continue_training", "--n_iters", "2", "--bs", "200"])
    assert spe_calls == [5, 8], spe_calls  # construction at 5, rebuilt on saved 8
    monkeypatch.undo()

    # The resumed run must persist the spe its rebuilt schedule is actually
    # bound to (8), not the current run's 5 — otherwise a SECOND resume
    # rebuilds on the wrong value and the milestone boundaries shift.
    assert int(load_checkpoint(path)["scheduler_steps_per_epoch"]) == 8

    # Old-vintage checkpoint (no scheduler_steps_per_epoch key) still resumes.
    payload = load_checkpoint(path)
    payload.pop("scheduler_steps_per_epoch")
    save_checkpoint(path, payload)
    _run(base + ["--continue_training", "--n_iters", "3"])


def test_load_checkpoint_compat_drops_missing_optional_keys(tmp_path):
    import numpy as np

    from combat_tpu.checkpoint import load_checkpoint_compat, save_checkpoint

    path = str(tmp_path / "old.ckpt")
    save_checkpoint(path, {"netC": {"w": np.ones((2, 2), np.float32)}, "epoch_current": 3})
    template = {
        "netC": {"w": np.zeros((2, 2), np.float32)},
        "epoch_current": 0,
        "F_detector_loaded": False,
        "scheduler_steps_per_epoch": 0,
    }
    out = load_checkpoint_compat(path, template)
    assert int(out["epoch_current"]) == 3
    assert "scheduler_steps_per_epoch" not in out
    # a new-vintage checkpoint restores the full template unchanged
    save_checkpoint(path, {**template, "epoch_current": 9})
    out = load_checkpoint_compat(path, template)
    assert int(out["epoch_current"]) == 9 and int(out["scheduler_steps_per_epoch"]) == 0
