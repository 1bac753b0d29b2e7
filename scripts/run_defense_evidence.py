"""Defense-evidence suite: victim vs benign side-by-side (internal tool).

Runs Neural Cleanse and STRIP against BOTH the attacked victim and the
benign clean classifier on the same data (VERDICT r2 weak #3: publish
calibrated benign baselines so "evaded" is relative to a detector that is
sane on clean models), plus fine-pruning on the victim and the reversed-
trigger collage.

Env: VICTIM_PREFIX (e.g. r11_victim — its checkpoint folder is
<prefix>_clean), CLEAN_PREFIX (clean-classifier run folder, e.g.
r11_clean_cls), NC_EPOCHS (default 50), OUT (default quality_logs/defenses).

The clean classifier saves under ``checkpoints/<prefix>/`` (no ``_clean``
suffix — reference ``train_clean_classifier.py:191-193``) while the defense
CLIs resolve ``<saving_prefix>_clean`` (they take attack-run prefixes,
reference ``defenses/*/config.py``); the benign baseline therefore gets a
``benign_clean``-named copy of the clean checkpoint.
"""

import contextlib
import io
import os
import shutil
import sys

sys.path.insert(0, ".")

VICTIM = os.environ.get("VICTIM_PREFIX", "r11_victim")
CLEAN = os.environ.get("CLEAN_PREFIX", "r11_clean_cls")
NC_EPOCHS = os.environ.get("NC_EPOCHS", "50")
OUT = os.environ.get("OUT", "./quality_logs/defenses")
# Defense CLIs are dataset-generic (STRIP/NC/fine-pruning run at any
# geometry; the models expose channel_mask/capture_features at both the
# PreActResNet cifar path and the ResNet celeba path) EXCEPT Grad-CAM,
# which is cifar10-only in the reference too (gradcam.py:276-281).
DATASET = os.environ.get("DATASET", "cifar10")
# extra flags appended to every defense CLI (e.g. "--synthetic_size 10000
# --scan_chunk 64" so the imagenet10 suite sees the same reduced split the
# victim trained on and stays under the tunnel's long-execution watchdog)
EXTRA = os.environ.get("EXTRA", "").split()
# fine-pruning per-dispatch mask-chunk override (see --fp_mask_chunk)
FP_CHUNK = os.environ.get("FP_CHUNK", "57")


def tee(name, fn, argv):
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, name)
    buf = io.StringIO()
    print(f"--- {name}: {argv}")
    try:
        with contextlib.redirect_stdout(buf):
            fn(argv)
    finally:
        # write even on a mid-run crash so partial progress is diagnosable
        text = buf.getvalue()
        with open(path, "w") as f:
            f.write(text)
    print(text[-1500:])
    return text


def main():
    # benign copy under the <prefix>_clean scheme the defense CLIs resolve
    src = os.path.join("./checkpoints", CLEAN, DATASET)
    dst = os.path.join("./checkpoints", "benign_clean", DATASET)
    # always refresh: a stale copy from an earlier run with a different
    # CLEAN_PREFIX would silently miscalibrate the benign baselines
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    shutil.copytree(src, dst)
    shutil.move(
        os.path.join(dst, f"{DATASET}_{CLEAN}.ckpt"),
        os.path.join(dst, f"{DATASET}_benign_clean.ckpt"),
    )

    from combat_tpu.defenses import combine_images, fine_pruning, neural_cleanse, strip

    common = ["--dataset", DATASET, "--synthetic_data", "--bs", "128", "--seed", "1"] + EXTRA
    # fast defenses first so an interrupted run still leaves complete
    # STRIP/fine-pruning evidence; the NC pair (10 labels x 2
    # models) dominates wall time
    strip_common = common + ["--n_sample", "64", "--n_test", "64", "--test_rounds", "2"]
    tee(f"strip_{VICTIM}.txt", strip.main,
        strip_common + ["--saving_prefix", VICTIM, "--strip_mode", "attack"])
    tee("strip_benign.txt", strip.main,
        strip_common + ["--saving_prefix", "benign", "--strip_mode", "clean"])
    tee(f"fine_pruning_{VICTIM}.txt", fine_pruning.main,
        common + ["--saving_prefix", VICTIM, "--fp_mask_chunk", FP_CHUNK,
                  "--outfile", os.path.join(OUT, f"fine_pruning_{VICTIM}_sweep.txt")])
    if DATASET == "cifar10":  # Grad-CAM is cifar10-only in the reference too
        from combat_tpu.defenses import gradcam

        tee(f"gradcam_{VICTIM}.txt", gradcam.main,
            common + ["--saving_prefix", VICTIM, "--load_checkpoint_clean", CLEAN])
    nc = ["--nc_epochs", NC_EPOCHS]
    tee(f"neural_cleanse_{VICTIM}.txt", neural_cleanse.main,
        common + nc + ["--saving_prefix", VICTIM])
    tee("neural_cleanse_benign.txt", neural_cleanse.main,
        common + nc + ["--saving_prefix", "benign"])
    # collage LAST: it renders the NC-reversed (mask, pattern) pairs from
    # ./results, so it depends on the NC victim run above
    combine_images.main(["--saving_prefix", VICTIM, "--dataset", DATASET])
    print("defense evidence complete")


if __name__ == "__main__":
    main()
