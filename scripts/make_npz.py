"""Convert on-disk datasets to the framework's npz spec.

The data layer (combat_tpu/data/datasets.py) consumes
``<data_root>/<name>_{train,test}.npz`` with:

  * ``images`` — (N, H, W, C) uint8 (or float32 already in [-1, 1]);
  * ``labels`` — (N,) integer class ids, or for CelebA optionally the raw
    (N, 40) binary attribute matrix (the loader derives the 8-class target
    from attributes [18, 31, 21] — reference ``utils/dataloader.py:63-80``).

This tool builds those files from the raw layouts the reference reads with
torchvision (not installed here):

  * ``folder``  — ImageFolder layout ``root/<class_name>/*.{png,jpg,ppm,...}``
    with classes sorted by name (torchvision semantics;
    reference ``utils/dataloader.py:83-95`` ImageNet-10 + Resize);
  * ``celeba``  — CelebA ``img_align_celeba/`` + ``list_attr_celeba.txt`` +
    ``list_eval_partition.txt`` (train=0, test=2; reference uses the
    torchvision ``CelebA_attr`` wrapper, ``utils/dataloader.py:63-80``);
  * ``gtsrb``   — GTSRB ``Final_Training/Images/<class>/*.ppm`` (train) or a
    ``GT-final_test.csv`` + ppm dir (test; reference
    ``defenses/frequency_based/dataloader.py:31-74``);
  * ``mnist``   — idx-ubyte files (``train-images-idx3-ubyte`` etc.;
    reference loads via torchvision MNIST).

Resize uses bilinear interpolation (torchvision ``transforms.Resize``
default).  Examples:

  python scripts/make_npz.py folder --src /data/imagenet10/train \\
      --out ./data/imagenet10_train.npz --size 224
  python scripts/make_npz.py celeba --src /data/celeba --split train \\
      --out ./data/celeba_train.npz --size 64
  python scripts/make_npz.py mnist --src /data/mnist --split test \\
      --out ./data/mnist_test.npz
"""

from __future__ import annotations

import argparse
import csv
import os
import struct
import sys

import numpy as np

IMG_EXTS = {".png", ".jpg", ".jpeg", ".ppm", ".bmp", ".gif", ".webp"}


def _load_image(path: str, size: int | None, channels: int = 3) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    img = img.convert("L" if channels == 1 else "RGB")
    if size is not None and img.size != (size, size):
        img = img.resize((size, size), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.uint8)
    if channels == 1:
        arr = arr[..., None]
    return arr


def convert_folder(src: str, size: int | None, channels: int = 3):
    """ImageFolder layout; classes are sorted directory names."""
    classes = sorted(d for d in os.listdir(src) if os.path.isdir(os.path.join(src, d)))
    if not classes:
        raise SystemExit(f"no class directories under {src}")
    images, labels = [], []
    for ci, cname in enumerate(classes):
        cdir = os.path.join(src, cname)
        for fn in sorted(os.listdir(cdir)):
            if os.path.splitext(fn)[1].lower() in IMG_EXTS:
                images.append(_load_image(os.path.join(cdir, fn), size, channels))
                labels.append(ci)
    print(f"{len(images)} images, {len(classes)} classes: {classes}")
    return np.stack(images), np.asarray(labels, np.int32)


def convert_celeba(src: str, split: str, size: int | None):
    """CelebA: stores the raw 40-attr matrix as labels; the data layer maps
    attrs [18, 31, 21] → 8 classes (reference ``utils/dataloader.py:63-80``)."""
    part_path = os.path.join(src, "list_eval_partition.txt")
    attr_path = os.path.join(src, "list_attr_celeba.txt")
    img_dir = os.path.join(src, "img_align_celeba")
    want = {"train": "0", "valid": "1", "test": "2"}[split]
    keep = set()
    with open(part_path) as f:
        for line in f:
            name, p = line.split()
            if p == want:
                keep.add(name)
    images, attrs = [], []
    with open(attr_path) as f:
        lines = f.read().splitlines()
    # header: count line + attribute-name line (torchvision skiprows=2)
    for line in lines[2:]:
        parts = line.split()
        name = parts[0]
        if name in keep:
            images.append(_load_image(os.path.join(img_dir, name), size))
            attrs.append([(1 if int(v) > 0 else 0) for v in parts[1:]])
    print(f"{len(images)} images ({split})")
    return np.stack(images), np.asarray(attrs, np.int32)


def convert_gtsrb(src: str, split: str, size: int | None):
    if split == "train":
        base = os.path.join(src, "Final_Training", "Images")
        images, labels = [], []
        for cdir in sorted(os.listdir(base)):
            full = os.path.join(base, cdir)
            if not os.path.isdir(full):
                continue
            ci = int(cdir)
            for fn in sorted(os.listdir(full)):
                if fn.lower().endswith(".ppm"):
                    images.append(_load_image(os.path.join(full, fn), size))
                    labels.append(ci)
        return np.stack(images), np.asarray(labels, np.int32)
    csv_path = os.path.join(src, "GT-final_test.csv")
    img_dir = os.path.join(src, "Final_Test", "Images")
    images, labels = [], []
    with open(csv_path) as f:
        for row in csv.DictReader(f, delimiter=";"):
            images.append(_load_image(os.path.join(img_dir, row["Filename"]), size))
            labels.append(int(row["ClassId"]))
    return np.stack(images), np.asarray(labels, np.int32)


def _read_idx(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        magic = struct.unpack(">HBB", f.read(4))
        ndim = magic[2]
        shape = struct.unpack(f">{ndim}I", f.read(4 * ndim))
        return np.frombuffer(f.read(), np.uint8).reshape(shape)


def convert_mnist(src: str, split: str, size: int | None):
    prefix = "train" if split == "train" else "t10k"
    images = _read_idx(os.path.join(src, f"{prefix}-images-idx3-ubyte"))[..., None]
    labels = _read_idx(os.path.join(src, f"{prefix}-labels-idx1-ubyte")).astype(np.int32)
    if size is not None and size != images.shape[1]:
        from PIL import Image

        images = np.stack(
            [
                np.asarray(Image.fromarray(im[..., 0]).resize((size, size), Image.BILINEAR))[..., None]
                for im in images
            ]
        )
    return images, labels


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("kind", choices=["folder", "celeba", "gtsrb", "mnist"])
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True, help="output .npz path (<data_root>/<name>_<split>.npz)")
    ap.add_argument("--size", type=int, default=None, help="resize to SxS (bilinear)")
    ap.add_argument("--split", choices=["train", "valid", "test"], default="train")
    ap.add_argument("--channels", type=int, default=3)
    args = ap.parse_args(argv)

    if args.kind == "folder":
        images, labels = convert_folder(args.src, args.size, args.channels)
    elif args.kind == "celeba":
        images, labels = convert_celeba(args.src, args.split, args.size)
    elif args.kind == "gtsrb":
        images, labels = convert_gtsrb(args.src, args.split, args.size)
    else:
        images, labels = convert_mnist(args.src, args.split, args.size)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez_compressed(args.out, images=images, labels=labels)
    print(f"wrote {args.out}: images {images.shape} {images.dtype}, labels {labels.shape}")


if __name__ == "__main__":
    main()
