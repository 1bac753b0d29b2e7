"""Convert reference PyTorch ``.pth.tar`` checkpoints to this framework's
orbax layout.

Kinds (reference checkpoint schemas):
  * ``frequency`` — a trained frequency detector
    (``defenses/frequency_based/train.py:327-335`` saves
    ``{netC, optimizerC, best_acc, epoch_current}``); written to the path
    ``cli/_alternated.py`` loads:
    ``<F_checkpoints>/<dataset>/<F_model>/<dataset>_<F_model>_detector.ckpt``.
  * ``clean`` — a clean classifier run
    (``train_clean_classifier.py:153-159``: ``{netC, ..., best_clean_acc,
    epoch_current}``, netC = PreActResNet18).
  * ``attack`` — a generator run (``train_generator.py:441-456``:
    ``netC`` + ``netG`` + ``clean_model`` + best metrics).

Model weights and best metrics are converted; torch optimizer/scheduler
state is NOT (optax state is structurally different — a converted run
resumes with fresh optimizer state, documented divergence).

Usage:
  python scripts/import_torch_ckpt.py --kind frequency \\
      --src /root/reference/defenses/frequency_based/checkpoints/cifar10/cifar10_original_detector.pth.tar \\
      --dataset cifar10
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from combat_tpu.checkpoint import save_checkpoint  # noqa: E402
from combat_tpu.checkpoint.torch_import import (  # noqa: E402
    convert_frequency_detector,
    convert_preact_resnet,
    convert_timm_vit,
    convert_unet_generator,
    load_torch_file,
)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--kind", choices=["frequency", "clean", "attack", "vit"], required=True)
    ap.add_argument("--src", required=True, help=".pth.tar path")
    ap.add_argument("--dataset", default="cifar10")
    ap.add_argument("--F_model", default="original")
    ap.add_argument("--F_checkpoints", default="./defenses/frequency_based/checkpoints")
    ap.add_argument("--out", default=None, help="override output .ckpt path")
    ap.add_argument("--unsafe", action="store_true",
                    help="allow full (arbitrary-code) unpickling instead of weights_only")
    args = ap.parse_args(argv)

    raw = load_torch_file(args.src, unsafe=args.unsafe)
    if args.kind == "frequency":
        payload = {
            "netC": convert_frequency_detector(raw["netC"]),
            "best_acc": float(raw.get("best_acc", 0.0)),
            "epoch_current": int(raw.get("epoch_current", 0)),
        }
        out = args.out or os.path.join(
            args.F_checkpoints, args.dataset, args.F_model,
            f"{args.dataset}_{args.F_model}_detector.ckpt",
        )
    elif args.kind == "clean":
        payload = {
            "netC": convert_preact_resnet(raw["netC"]),
            "best_clean_acc": float(raw.get("best_clean_acc", 0.0)),
            "epoch_current": int(raw.get("epoch_current", 0)),
        }
        out = args.out or os.path.splitext(args.src)[0] + ".ckpt"
    elif args.kind == "vit":
        # A timm VisionTransformer checkpoint (reference eval.py:24-47 uses
        # timm's vit_small with pretrained weights): either the raw state
        # dict (timm's .pth files) or nested under "netC".  Written in the
        # eval-CLI layout so `cli/eval --model vitsmall
        # --load_checkpoint_clean <name>` loads it directly.
        sd = raw if "patch_embed.proj.weight" in raw else raw["netC"]
        payload = {"netC": convert_timm_vit(sd)}
        out = args.out or os.path.splitext(args.src)[0] + ".ckpt"
    else:  # attack
        payload = {
            "netC": convert_preact_resnet(raw["netC"]),
            "netG": convert_unet_generator(raw["netG"]),
            "epoch_current": int(raw.get("epoch_current", 0)),
        }
        if "clean_model" in raw:
            payload["clean_model"] = convert_preact_resnet(raw["clean_model"])
        for k, v in raw.items():
            if k.startswith("best_"):
                payload[k] = float(v)
        out = args.out or os.path.splitext(args.src)[0] + ".ckpt"

    save_checkpoint(out, payload)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
