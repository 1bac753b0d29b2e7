"""quality_report.py log parsers: synthetic fixtures for the frequency and
multi-resolution sections (guards the report against format drift in
frequency_train/frequency_eval/quality_run prints)."""

import importlib.util
import os
import sys


def _load(tmp_path, monkeypatch, round_id="rX"):
    monkeypatch.setenv("QUALITY_ROUND", round_id)
    spec = importlib.util.spec_from_file_location(
        "quality_report", os.path.join(os.path.dirname(__file__), "..", "scripts", "quality_report.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_frequency_section_parses_detector_and_evals(tmp_path, monkeypatch):
    qr = _load(tmp_path, monkeypatch)
    (tmp_path / "frequency_train_rX.log").write_text(
        "Epoch 1: CE Loss: 0.5 | Train Acc: 80.0 | Acc: 90.1000 - Best: 0.0000 | 100 img/s\n"
        " Saving...\n"
        # last epoch improves: the stale "Best:" print must NOT win
        "Epoch 2: CE Loss: 0.4 | Train Acc: 85.0 | Acc: 96.1000 - Best: 90.1000 | 100 img/s\n"
    )
    (tmp_path / "frequency_eval_refdet_rX.log").write_text(
        "Clean classified clean: 97.1000 | Triggered detected: 3.2000\n")
    (tmp_path / "frequency_eval_trained_rX.log").write_text(
        "Clean classified clean: 95.0000 | Triggered detected: 7.0000\n")
    lines = qr.frequency_section(logdir=str(tmp_path))
    text = "\n".join(lines)
    assert "**3.20**" in text and "**7.00**" in text
    assert "test acc 96.10" in text  # max per-epoch acc, not the stale Best


def test_multires_section_parses_final_lines(tmp_path, monkeypatch):
    qr = _load(tmp_path, monkeypatch)
    (tmp_path / "quality_celeba_rX.log").write_text(
        "clean classifier best acc: 61.20\n"
        "FINAL: Clean Acc 63.10 | Bd BA 1.20 | Bd ASR 98.70\n")
    lines = qr.multires_section(logdir=str(tmp_path))
    text = "\n".join(lines)
    assert "61.20" in text and "**98.70**" in text
    assert "imagenet10" not in text.split("|---")[-1]  # absent log -> no row


def test_sections_empty_when_logs_absent(tmp_path, monkeypatch):
    qr = _load(tmp_path, monkeypatch)
    assert qr.frequency_section(logdir=str(tmp_path)) == []
    assert qr.multires_section(logdir=str(tmp_path)) == []


def test_runlog_stage_reconstructs_trajectories(tmp_path, monkeypatch):
    """Raw run.log fallback: when a prefix's jsonl died with a container
    reset, the committed stdout must reconstruct stage trajectories."""
    qr = _load(tmp_path, monkeypatch)
    d = tmp_path / "rY"
    d.mkdir()
    (d / "run.log").write_text(
        "=== stage 2: alternated generator ===\n"
        "Epoch 1: Clean Acc: 19.9 | Bd Acc: 93.6 | F Acc: 74.3 | 706 img/s\n"
        "  Eval: Clean Acc: 25.4000 - Best: 0.0000 | Bd Acc: 99.3352 - Best: 0.0000 | F Acc: 65.7839\n"
        "  Eval: Clean Acc: 28.5800 - Best: 25.4000 | Bd Acc: 86.9917 - Best: 99.3352 | F Acc: 75.9889\n"
        "=== stage 3: victim ===\n"
        "Epoch 1: CE Loss: 0.0163 | Train Acc: 24.7 | Clean Acc: 23.6800 - Best: 0.0000 | Bd Acc: 99.6676 - Best: 0.0000 | 1203 img/s\n"
        "=== stage 4: final eval ===\n"
        "FINAL: Clean Acc 68.89 | Bd BA 0.72 | Bd ASR 99.20\n"
    )
    atk = qr.runlog_stage("rY", "atk", logdir=str(tmp_path))
    assert [r["Clean"] for r in atk] == [25.4, 28.58] and atk[1]["epoch"] == 1
    vic = qr.runlog_stage("rY", "victim", logdir=str(tmp_path))
    assert vic == [{"epoch": 0, "group": "test", "Clean": 23.68, "Bd": 99.6676}]
    ev = qr.runlog_stage("rY", "eval", logdir=str(tmp_path))
    assert ev[-1]["Bd ASR"] == 99.20
    # stage-2 "Epoch:" lines must not leak into the victim trajectory
    assert all(r["Clean"] != 19.9 for r in vic)


def test_runlog_stage_rerun_supersedes_earlier_pass(tmp_path, monkeypatch):
    """A Q_STAGES resume appends a second pass of a stage to the same log;
    the parser must keep only the rerun (correct epoch numbering, one FINAL
    record per stage-4 pass)."""
    qr = _load(tmp_path, monkeypatch)
    d = tmp_path / "rZ"
    d.mkdir()
    (d / "run.log").write_text(
        "=== stage 2: alternated generator ===\n"
        "  Eval: Clean Acc: 11.0000 - Best: 0.0000 | Bd Acc: 50.0000 - Best: 0.0000 | F Acc: 60.0000\n"
        "=== stage 4: final eval ===\n"
        "FINAL: Clean Acc 40.00 | Bd BA 9.99 | Bd ASR 55.55\n"
        "=== stage 2: alternated generator ===\n"  # resume rerun of stage 2
        "  Eval: Clean Acc: 22.0000 - Best: 0.0000 | Bd Acc: 77.0000 - Best: 0.0000 | F Acc: 61.0000\n"
        "  Eval: Clean Acc: 33.0000 - Best: 22.0000 | Bd Acc: 88.0000 - Best: 77.0000 | F Acc: 62.0000\n"
        "=== stage 4: final eval ===\n"
        "FINAL: Clean Acc 68.89 | Bd BA 0.72 | Bd ASR 99.20\n"
    )
    atk = qr.runlog_stage("rZ", "atk", logdir=str(tmp_path))
    assert [(r["epoch"], r["Clean"]) for r in atk] == [(0, 22.0), (1, 33.0)]
    ev = qr.runlog_stage("rZ", "eval", logdir=str(tmp_path))
    assert [r["Bd ASR"] for r in ev] == [99.20]
