"""Collage of the Neural-Cleanse reversed triggers.

Analog of reference ``defenses/neural_cleanse/combine_images.py:1-15``, which
concatenates trigger PNGs horizontally with 1-px white gaps via cv2.  Our
Neural Cleanse run (``combat_tpu/defenses/neural_cleanse.py``) saves one
``mask_<label>.npy`` + ``pattern_<label>.npy`` per label; this tool renders
each label as a column [mask | pattern | mask*pattern] and joins all labels
horizontally with white gaps into one PNG.

Run:
  python -m combat_tpu.defenses.combine_images --saving_prefix victim \
      --dataset cifar10            # reads ./results/victim_clean/cifar10
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..utils.png import write_png


def build_collage(result_dir: str, gap: int = 1) -> np.ndarray:
    """(H*3 + 2*gap, num_labels*(W+gap)-gap, 3) uint8 collage from the
    per-label mask/pattern .npy pairs in ``result_dir``."""
    labels = sorted(
        int(f[len("mask_"):-len(".npy")])
        for f in os.listdir(result_dir)
        if f.startswith("mask_") and f.endswith(".npy")
    )
    if not labels:
        raise FileNotFoundError(f"no mask_<label>.npy files in {result_dir!r}")
    cols = []
    for lab in labels:
        mask = np.load(os.path.join(result_dir, f"mask_{lab}.npy"))  # (H, W) in [0,1]
        pattern = np.load(os.path.join(result_dir, f"pattern_{lab}.npy"))  # (H, W, C) in [0,1]
        if pattern.ndim == 2:
            pattern = pattern[..., None]
        if pattern.shape[-1] == 1:
            pattern = np.repeat(pattern, 3, axis=-1)
        mask_rgb = np.repeat(mask[..., None], 3, axis=-1)
        applied = mask_rgb * pattern
        h, w, _ = pattern.shape
        vgap = np.full((gap, w, 3), 1.0, np.float32)
        col = np.concatenate([mask_rgb, vgap, pattern, vgap, applied], axis=0)
        hgap = np.full((col.shape[0], gap, 3), 1.0, np.float32)
        cols.extend([col, hgap])
    collage = np.concatenate(cols[:-1], axis=1)  # drop trailing gap
    return (np.clip(collage, 0.0, 1.0) * 255).astype(np.uint8)


def main(argv=None) -> str:
    p = argparse.ArgumentParser()
    p.add_argument("--saving_prefix", default=None)
    p.add_argument("--dataset", default="cifar10")
    p.add_argument("--result", default=None, help="explicit results dir (overrides prefix/dataset)")
    p.add_argument("--out", default=None, help="output PNG path (default <result>/triggers.png)")
    p.add_argument("--gap", type=int, default=1)
    ns = p.parse_args(argv)
    result_dir = ns.result or os.path.join("./results", f"{ns.saving_prefix}_clean", ns.dataset)
    out = ns.out or os.path.join(result_dir, "triggers.png")
    write_png(out, build_collage(result_dir, gap=ns.gap))
    print(f"wrote {out}")
    return out


if __name__ == "__main__":
    main()
