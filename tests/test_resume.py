"""Resume (--continue_training) regressions.

Covers the checkpoint-robustness guarantees added in round 3:
  * torch's MultiStepLR is EPOCH-indexed (reference
    ``train_clean_classifier.py:205-210``; on resume it reloads the
    scheduler state dict so its epoch counter continues) — resuming under a
    different dataset size / batch size must therefore re-anchor the
    remaining milestones on the new step cadence so they still fire at the
    right epoch (``multistep_lr_resume``);
  * checkpoints written before the optional top-level keys existed
    (``scheduler_steps_per_epoch``, ``F_detector_loaded``) still restore
    (orbax structure matching rejects template keys absent on disk).
"""

import os

import pytest


def test_multistep_lr_resume_semantics():
    """Pure schedule math: epoch-indexed milestones survive a cadence change."""
    from combat_tpu.train import multistep_lr, multistep_lr_resume

    base, ms, gamma = 0.01, (2, 4), 0.1

    # Unchanged cadence reduces exactly to the fresh schedule for every
    # post-resume step (resume after epoch 1 at 8 steps/epoch).
    fresh = multistep_lr(base, ms, gamma, 8)
    resumed = multistep_lr_resume(base, ms, gamma, 8, epochs_done=1, resume_step=8)
    for s in range(8, 50):
        assert float(resumed(s)) == pytest.approx(float(fresh(s)))

    # Cadence change: trained 3 epochs at 8 steps/epoch (milestone 2 already
    # passed), resumed at 5 steps/epoch.  Milestone 4 must fire when the
    # EPOCH counter reaches 4 — i.e. at step 24 + (4-3)*5 = 29 — not at the
    # stale step-indexed position 4*8=32 (and not never, as a schedule kept
    # on the old cadence would under a shrinking dataset).
    re2 = multistep_lr_resume(base, ms, gamma, 5, epochs_done=3, resume_step=24)
    assert float(re2(24)) == pytest.approx(base * gamma)  # one decay in effect
    assert float(re2(28)) == pytest.approx(base * gamma)
    assert float(re2(29)) == pytest.approx(base * gamma**2)  # epoch-4 decay
    # All milestones already passed: single folded boundary.
    re3 = multistep_lr_resume(base, ms, gamma, 5, epochs_done=5, resume_step=40)
    assert float(re3(41)) == pytest.approx(base * gamma**2)


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
    # LR schedule must be re-anchored at the resume point on the NEW cadence
    # (epoch-indexed MultiStepLR semantics — see multistep_lr_resume).
    import combat_tpu.cli.train_clean_classifier as tcc

    from combat_tpu.checkpoint import load_checkpoint, save_checkpoint

    path = os.path.join(ck, "rsm", "cifar10", "cifar10_rsm.ckpt")
    # zero the best-acc gate so the resumed run is guaranteed to save
    payload = load_checkpoint(path)
    payload["best_clean_acc"] = 0.0
    save_checkpoint(path, payload)

    anchors = []
    real = tcc.multistep_lr_resume
    monkeypatch.setattr(
        tcc, "multistep_lr_resume",
        lambda lr, ms, gamma, spe, epochs_done, resume_step: (
            anchors.append((spe, epochs_done, resume_step)),
            real(lr, ms, gamma, spe, epochs_done=epochs_done, resume_step=resume_step),
        )[1],
    )
    _run(base + ["--continue_training", "--n_iters", "2", "--bs", "200"])
    # rebuilt on the NEW cadence (5), anchored at 1 epoch done / step 8
    assert anchors == [(5, 1, 8)], anchors
    monkeypatch.undo()

    # The resumed run persists its own cadence; a SECOND resume re-anchors
    # from (epoch_current, step) again, so this stays correct regardless of
    # how many cadence changes preceded it.
    assert int(load_checkpoint(path)["scheduler_steps_per_epoch"]) == 5

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
