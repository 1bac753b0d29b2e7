"""Grad-CAM (and Guided Backprop) visualization of victim vs clean model on
triggered inputs.

Parity with reference ``defenses/gradcam/gradcam.py``: hook the layer3
activations (``:97-145``), weights = spatial mean of the target-logit
gradient, cam = ReLU(Σ w·act) normalized and resized to the input
(``GradCam:148-198``); Guided Backprop propagates only positive gradients
through positive ReLU activations (``GuidedBackpropReLU:201-271``); heatmaps
for clean/triggered inputs are written as PNGs (``:324-338,387-429``).

TPU-native: torch backward hooks become ``jax.grad`` w.r.t. a zero
``feature_perturb`` injected at the hooked stage (models/preact_resnet.py);
Guided Backprop is the same model built with the custom-VJP
``layers.guided_relu`` activation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import resize2d


def gradcam(C, varsC, x: jnp.ndarray, target_index=None, layer: str = "layer3") -> jnp.ndarray:
    """CAM heatmaps (N, H, W) in [0, 1] for a batch."""

    def logits_with_eps(eps, x):
        logits, feats = C.apply(varsC, x, train=False, capture_features=True, feature_perturb={layer: eps})
        return logits, feats

    # probe shapes without grad
    logits0, feats0 = C.apply(varsC, x, train=False, capture_features=True)
    if target_index is None:
        target_index = jnp.argmax(logits0, axis=-1)
    else:
        target_index = jnp.broadcast_to(jnp.asarray(target_index), (x.shape[0],))
    act = feats0[layer]  # (N, h, w, c)

    def target_sum(eps):
        logits, _ = logits_with_eps(eps, x)
        return jnp.take_along_axis(logits, target_index[:, None], axis=-1).sum()

    grads = jax.grad(target_sum)(jnp.zeros_like(act))  # d logit_t / d activation
    weights = grads.mean(axis=(1, 2))  # (N, c) spatial mean (gradcam:185)
    cam = jnp.maximum(jnp.einsum("nhwc,nc->nhw", act, weights), 0.0)
    cam = resize2d(cam[..., None], (x.shape[1], x.shape[2]), "bilinear", align_corners=False)[..., 0]
    cmin = cam.min(axis=(1, 2), keepdims=True)
    cmax = cam.max(axis=(1, 2), keepdims=True)
    return (cam - cmin) / jnp.maximum(cmax - cmin, 1e-12)


def guided_backprop(make_guided_model, varsC, x: jnp.ndarray, target_index=None) -> jnp.ndarray:
    """Input-space saliency with guided-ReLU backward (gradcam.py:201-271).
    ``make_guided_model`` builds the classifier with act=guided_relu."""
    Cg = make_guided_model()
    logits0 = Cg.apply(varsC, x, train=False)
    if target_index is None:
        target_index = jnp.argmax(logits0, axis=-1)
    else:
        target_index = jnp.broadcast_to(jnp.asarray(target_index), (x.shape[0],))

    def target_sum(x):
        logits = Cg.apply(varsC, x, train=False)
        return jnp.take_along_axis(logits, target_index[:, None], axis=-1).sum()

    return jax.grad(target_sum)(x)


def save_cam_pngs(img01: np.ndarray, cam: np.ndarray, out_dir: str, idx: int, prefix: str = "") -> None:
    """Write bd/cam/heatmap PNGs (reference show_cam_on_image:324-338) using a
    pure-numpy JET colormap (no cv2 dependency)."""
    import os

    from ..utils.png import write_png

    def jet(v):
        v = np.clip(v, 0, 1)
        r = np.clip(1.5 - np.abs(4 * v - 3), 0, 1)
        g = np.clip(1.5 - np.abs(4 * v - 2), 0, 1)
        b = np.clip(1.5 - np.abs(4 * v - 1), 0, 1)
        return np.stack([r, g, b], axis=-1)

    os.makedirs(out_dir, exist_ok=True)
    heat = jet(cam)
    overlay = heat + img01
    overlay = overlay / overlay.max()
    write_png(os.path.join(out_dir, f"{prefix}bd{idx}.png"), (img01 * 255).astype(np.uint8))
    write_png(os.path.join(out_dir, f"{prefix}cam{idx}.png"), (overlay * 255).astype(np.uint8))
    write_png(os.path.join(out_dir, f"{prefix}heatmap{idx}.png"), (heat * 255).astype(np.uint8))


def main(argv=None):
    """CLI parity with reference gradcam.py __main__: CAMs of victim and clean
    model on clean + triggered test images, PNGs under ./results."""
    import os
    from functools import partial

    from ..attack.triggers import additive_trigger
    from ..checkpoint import load_checkpoint
    from ..cli.common import build_mesh, ref_ckpt_path
    from ..config import from_args
    from ..data import get_dataset
    from ..models import get_classifier
    from ..models.layers import guided_relu
    from ..models.preact_resnet import preact_resnet18

    cfg = from_args(argv)
    if cfg.dataset != "cifar10":
        raise SystemExit("Invalid dataset")  # reference gradcam.py:276-281 is cifar10-only
    build_mesh(cfg)
    C = get_classifier(cfg)
    from ..models import get_generator

    G = get_generator(cfg, "unet")
    ckpt = ref_ckpt_path(cfg.checkpoints, f"{cfg.saving_prefix}_clean", cfg.dataset)
    payload = load_checkpoint(ckpt)
    varsC = {
        "params": jax.tree.map(jnp.asarray, payload["netC"]["params"]),
        "batch_stats": jax.tree.map(jnp.asarray, payload["netC"]["batch_stats"]),
    }
    paramsG = jax.tree.map(jnp.asarray, payload["netG"]["params"])

    clean_vars = None
    if cfg.load_checkpoint_clean:
        cp = ref_ckpt_path(cfg.checkpoints, cfg.load_checkpoint_clean, cfg.dataset)
        pl = load_checkpoint(cp)
        clean_vars = {
            "params": jax.tree.map(jnp.asarray, pl["netC"]["params"]),
            "batch_stats": jax.tree.map(jnp.asarray, pl["netC"]["batch_stats"]),
        }

    ds = get_dataset(cfg, train=False)
    x = jnp.asarray(ds.images[:16])
    key = jax.random.key(cfg.seed)
    x_bd = additive_trigger(
        key, x, G.apply({"params": paramsG}, x),
        image_size=cfg.input_height, ratio=cfg.ratio, noise_rate=cfg.noise_rate,
        kernel_size=cfg.kernel_size, sigma=cfg.sigma,
    )
    out_dir = os.path.join("./results", "gradcam", cfg.dataset)
    cams_bd = np.asarray(gradcam(C, varsC, x_bd, target_index=cfg.target_label))
    cams_clean = np.asarray(gradcam(C, varsC, x))
    img01 = (np.asarray(x_bd) + 1.0) / 2.0
    img01_clean = (np.asarray(x) + 1.0) / 2.0
    for i in range(x.shape[0]):
        save_cam_pngs(img01[i], cams_bd[i], out_dir, i, prefix="victim_")
        save_cam_pngs(img01_clean[i], cams_clean[i], out_dir, i, prefix="victim_clean_")
    if clean_vars is not None:
        cams_cm = np.asarray(gradcam(C, clean_vars, x_bd))
        for i in range(x.shape[0]):
            save_cam_pngs(img01[i], cams_cm[i], out_dir, i, prefix="cleanmodel_")
    # guided backprop sample
    gb = np.asarray(
        guided_backprop(partial(preact_resnet18, cfg.num_classes, act=guided_relu), varsC, x_bd[:4])
    )
    np.save(os.path.join(out_dir, "guided_backprop.npy"), gb)
    print(f"wrote Grad-CAM PNGs + guided_backprop.npy to {out_dir}")


if __name__ == "__main__":
    main()
