"""Import reference PyTorch ``.pth.tar`` checkpoints into the Flax trees.

The reference ships trained frequency-detector checkpoints
(``defenses/frequency_based/checkpoints/{cifar10,celeba}/..._detector.pth.tar``,
loaded by reference ``train_generator.py:503-512``) and distributes paper
checkpoints (PreActResNet18 ``netC`` + UnetGenerator ``netG`` state dicts,
``README.md:101-103``).  This module converts those torch state dicts to the
rebuild's Flax parameter/batch-stats trees so generator training can run
against the *reference-trained* detector instead of retraining.

Layout conversions (torch → flax):
  * Conv2d  ``weight`` (O, I, kH, kW) → ``kernel`` (kH, kW, I, O)
  * Linear  ``weight`` (O, F) → ``kernel`` (F, O); when the features come
    from a flattened conv map, the feature axis is additionally permuted
    CHW → HWC (torch flattens NCHW, our models flatten NHWC).
  * BatchNorm ``weight/bias`` → params ``scale/bias``;
    ``running_mean/running_var`` → batch_stats ``mean/var``.
  * InstanceNorm2d (reference UNets) has no state (affine=False) — skipped.

Requires ``torch`` (CPU build is enough) only inside :func:`load_torch_file`;
the tree mappers are numpy-only.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

Tree = Dict[str, Any]


def load_torch_file(path: str, unsafe: bool = False) -> Dict[str, Any]:
    """``torch.load`` (CPU) → nested dict of numpy arrays / scalars.

    Loads with ``weights_only=True`` by default: the reference's checkpoints
    are plain tensor/state dicts (``train_generator.py:441-456``), and
    unrestricted unpickling of files from an untrusted public repo can
    execute arbitrary code.  ``unsafe=True`` (the ``--unsafe`` CLI flag)
    opts into full unpickling for checkpoints that genuinely embed
    non-tensor objects."""
    import torch

    if unsafe:
        raw = torch.load(path, map_location="cpu", weights_only=False)
    else:
        try:
            raw = torch.load(path, map_location="cpu", weights_only=True)
        except Exception as e:  # pickle.UnpicklingError subclass varies by torch version
            raise RuntimeError(
                f"{path} is not loadable with weights_only=True; if you trust "
                "this file, re-run with unsafe=True (CLI: --unsafe)"
            ) from e

    def to_np(v):
        if isinstance(v, torch.Tensor):
            return v.detach().cpu().numpy()
        if isinstance(v, dict):
            return {k: to_np(x) for k, x in v.items()}
        return v

    return to_np(raw)


def conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def linear_kernel(w: np.ndarray, conv_shape: Optional[Tuple[int, int, int]] = None) -> np.ndarray:
    """(O, F) → (F, O); ``conv_shape=(C, H, W)`` permutes a flattened-conv
    feature axis from torch's CHW order to our HWC order."""
    if conv_shape is not None:
        c, h, w_ = conv_shape
        w = w.reshape(w.shape[0], c, h, w_).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
    return np.ascontiguousarray(w.T)


def _split_bn(sd: Dict[str, np.ndarray], prefix: str) -> Tuple[Tree, Tree]:
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
    return params, stats


def _conv_entry(sd: Dict[str, np.ndarray], prefix: str, bias: bool = True) -> Tree:
    e = {"kernel": conv_kernel(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        e["bias"] = sd[f"{prefix}.bias"]
    return e


# ---------------------------------------------------------------------------
# Frequency detector (reference defenses/frequency_based/model.py:8-52:
# conv1..conv6 / bn1..bn6 / linear  →  flax conv0..conv5 / bn0..bn5 / linear)
# ---------------------------------------------------------------------------


def convert_frequency_detector(sd: Dict[str, np.ndarray]) -> Tree:
    """Torch FrequencyModel state dict → ``{"params", "batch_stats"}``."""
    params: Tree = {}
    stats: Tree = {}
    for i in range(6):
        params[f"conv{i}"] = _conv_entry(sd, f"conv{i + 1}")
        bn_p, bn_s = _split_bn(sd, f"bn{i + 1}")
        params[f"bn{i}"] = bn_p
        stats[f"bn{i}"] = bn_s
    # the shipped detectors name the head ``linear6`` (reference
    # defenses/frequency_based/model.py); accept ``linear`` too
    head = "linear6" if "linear6.weight" in sd else "linear"
    out_f, in_f = sd[f"{head}.weight"].shape
    side = int(round((in_f / 128) ** 0.5))  # 32px → 4, 64px → 8
    params["linear"] = {
        "kernel": linear_kernel(sd[f"{head}.weight"], conv_shape=(128, side, side)),
        "bias": sd[f"{head}.bias"],
    }
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# PreActResNet (reference classifier_models/preact_resnet.py:8-110:
# conv1 / layer{1..4}.{i}.{bn1,conv1,bn2,conv2,shortcut.0} / linear
#   →  flax conv1 / layer{1..4}_{i}/{bn1,conv1,bn2,conv2,shortcut} / linear)
# ---------------------------------------------------------------------------


def convert_preact_resnet(sd: Dict[str, np.ndarray]) -> Tree:
    params: Tree = {"conv1": _conv_entry(sd, "conv1", bias=False)}
    stats: Tree = {}
    for stage in range(1, 5):
        i = 0
        while f"layer{stage}.{i}.conv1.weight" in sd:
            name = f"layer{stage}_{i}"
            p: Tree = {}
            s: Tree = {}
            for bn in ("bn1", "bn2", "bn3"):
                if f"layer{stage}.{i}.{bn}.weight" in sd:
                    p[bn], s[bn] = _split_bn(sd, f"layer{stage}.{i}.{bn}")
            for cv in ("conv1", "conv2", "conv3"):
                if f"layer{stage}.{i}.{cv}.weight" in sd:
                    p[cv] = _conv_entry(sd, f"layer{stage}.{i}.{cv}", bias=False)
            if f"layer{stage}.{i}.shortcut.0.weight" in sd:
                p["shortcut"] = {"kernel": conv_kernel(sd[f"layer{stage}.{i}.shortcut.0.weight"])}
            params[name] = p
            stats[name] = s
            i += 1
    # final linear sees GAP features (C,) — no flatten permute needed
    params["linear"] = {"kernel": linear_kernel(sd["linear.weight"]), "bias": sd["linear.bias"]}
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# UNet generator (reference networks/models.py:268-341: conv{s}_{i} encoder +
# upconv{s}_{i} decoder, InstanceNorms stateless  →  flax enc/... + dec/...)
# ---------------------------------------------------------------------------


def convert_unet_generator(sd: Dict[str, np.ndarray]) -> Tree:
    enc: Tree = {}
    dec: Tree = {}
    for k in sd:
        if not k.endswith(".weight"):
            continue
        mod = k[: -len(".weight")]
        if mod.startswith("upconv"):
            dec[mod] = _conv_entry(sd, mod)
        elif mod.startswith("conv"):
            enc[mod] = _conv_entry(sd, mod)
    return {"params": {"enc": enc, "dec": dec}}


# ---------------------------------------------------------------------------
# timm VisionTransformer (the reference's ``vit_small`` factory,
# eval.py:24-40) → models/vit.py:VisionTransformer
# ---------------------------------------------------------------------------


def _ln(sd: Dict[str, np.ndarray], prefix: str) -> Tree:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _dense(sd: Dict[str, np.ndarray], prefix: str) -> Tree:
    e = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        e["bias"] = sd[f"{prefix}.bias"]
    return e


def convert_timm_vit(sd: Dict[str, np.ndarray]) -> Tree:
    """timm ``VisionTransformer`` state dict (patch_embed.proj / cls_token /
    pos_embed / blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2} /
    norm / head) → our ``VisionTransformer`` tree."""
    params: Tree = {
        "patch_embed": {
            "kernel": conv_kernel(sd["patch_embed.proj.weight"]),
            "bias": sd["patch_embed.proj.bias"],
        },
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "final_norm": _ln(sd, "norm"),
        "head": _dense(sd, "head"),
    }
    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        params[f"block{i}"] = {
            "norm1": _ln(sd, f"blocks.{i}.norm1"),
            "qkv": _dense(sd, f"blocks.{i}.attn.qkv"),
            "proj": _dense(sd, f"blocks.{i}.attn.proj"),
            "norm2": _ln(sd, f"blocks.{i}.norm2"),
            "fc1": _dense(sd, f"blocks.{i}.mlp.fc1"),
            "fc2": _dense(sd, f"blocks.{i}.mlp.fc2"),
        }
        i += 1
    return {"params": params}


CONVERTERS = {
    "frequency": convert_frequency_detector,
    "preact_resnet": convert_preact_resnet,
    "unet": convert_unet_generator,
    "timm_vit": convert_timm_vit,
}


def convert_state_dict(kind: str, sd: Dict[str, np.ndarray]) -> Tree:
    if kind not in CONVERTERS:
        raise ValueError(f"unknown kind {kind!r}; options: {sorted(CONVERTERS)}")
    return CONVERTERS[kind](sd)
