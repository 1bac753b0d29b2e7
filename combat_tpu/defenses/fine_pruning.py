"""Fine-pruning defense: rank layer4 channels by mean activation, prune
lowest-first, track clean/backdoor accuracy per pruning step.

Parity with reference ``defenses/fine_pruning/fine-pruning.py``: forward-hook
mean activation over the test set (``:147-163``), iterative pruning of the
lowest-activation channels (``:167-214``), per-step clean/bd eval
(``eval:53-85``), output lines ``idx clean bd`` to ``--outfile``.

TPU-native: instead of rebuilding ``conv2``/``linear`` modules per pruning
step (module surgery), the classifier takes a functional ``channel_mask``
over the layer4 output — mathematically identical to the reference's channel
removal (see models/preact_resnet.py docstring) — so the pruning sweep is the
SAME compiled program evaluated with 512 different masks, batched via
``lax.map``: one compile, the whole 512-step sweep on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..attack.triggers import additive_trigger, create_targets_bd
from ..config import Config


def channel_activations(C, varsC, images: jnp.ndarray, bs: int = 256) -> jnp.ndarray:
    """Mean layer4 activation per channel over a dataset (reference :160-163)."""
    n = images.shape[0]
    steps = max(1, n // bs)
    batches = images[: steps * bs].reshape(steps, bs, *images.shape[1:])

    def body(carry, x):
        _, feats = C.apply(varsC, x, train=False, capture_features=True)
        return carry + feats["layer4"].mean(axis=(0, 1, 2)), None

    total, _ = jax.lax.scan(body, jnp.zeros((512,), jnp.float32), batches)
    return total / steps


def chunked_mask_eval(eval_with_mask, masks: jnp.ndarray, chunk: int, *args) -> jnp.ndarray:
    """``lax.map`` of ``eval_with_mask`` over ``masks`` in dispatches of at
    most ``chunk`` rows.  Pads the mask count up to a multiple of ``chunk``
    by repeating the last mask (extra rows sliced off afterwards) so every
    dispatch shares ONE compiled executable.  ``args`` are jit ARGUMENTS,
    not closures: a closed-over array is baked into the program as a
    constant, and at 64px+ the embedded test split blows the remote-compile
    upload limit (observed: HTTP 413 on the celeba sweep;
    quality_logs/r3d_queue.log)."""
    n_masks = masks.shape[0]
    chunk = min(chunk, n_masks)
    pad = (-n_masks) % chunk
    padded = jnp.concatenate([masks, jnp.repeat(masks[-1:], pad, axis=0)], axis=0) if pad else masks
    eval_chunk = jax.jit(
        lambda ms, *a: jax.lax.map(lambda m: eval_with_mask(m, *a), ms)
    )
    outs = [eval_chunk(padded[i : i + chunk], *args) for i in range(0, padded.shape[0], chunk)]
    return jnp.concatenate(outs, axis=0)[:n_masks]


def pruning_sweep(
    cfg: Config,
    C,
    G,
    varsC,
    paramsG,
    images: jnp.ndarray,
    labels: jnp.ndarray,
    key: jax.Array,
    bs: int = 256,
    mask_chunk: int = 57,
):
    """Evaluate clean/bd accuracy for every pruning count 0..n_channels.
    Returns (n_channels+1, 2) array of [clean_acc, bd_acc] percentages."""
    act = channel_activations(C, varsC, images, bs)
    order = jnp.argsort(act)  # ascending: least-important first (:162)
    n_ch = act.shape[0]
    # masks[k] keeps all but the k lowest-activation channels
    ranks = jnp.zeros((n_ch,), jnp.int32).at[order].set(jnp.arange(n_ch))
    masks = (ranks[None, :] >= jnp.arange(n_ch + 1)[:, None]).astype(jnp.float32)  # (n_ch+1, n_ch)

    n = images.shape[0]
    steps = max(1, n // bs)
    xb = images[: steps * bs].reshape(steps, bs, *images.shape[1:])
    yb = labels[: steps * bs].reshape(steps, bs)

    def eval_with_mask(mask, vC, pG, xb, yb):
        def body(carry, batch):
            x, y, i = batch
            bd_targets = create_targets_bd(y, cfg.attack_mode, cfg.target_label, cfg.num_classes)
            preds_clean = C.apply(vC, x, train=False, channel_mask=mask)
            noise = G.apply({"params": pG}, x)
            x_bd = additive_trigger(
                jax.random.fold_in(key, i), x, noise,
                image_size=cfg.input_height, ratio=cfg.ratio, noise_rate=cfg.noise_rate,
                kernel_size=cfg.kernel_size, sigma=cfg.sigma,
            )
            preds_bd = C.apply(vC, x_bd, train=False, channel_mask=mask)
            cc = jnp.sum(jnp.argmax(preds_clean, -1) == y)
            bc = jnp.sum(jnp.argmax(preds_bd, -1) == bd_targets)
            return carry + jnp.array([cc, bc], jnp.float32), None

        totals, _ = jax.lax.scan(body, jnp.zeros((2,), jnp.float32), (xb, yb, jnp.arange(steps)))
        return totals * 100.0 / (steps * bs)

    # Chunked dispatch (chunked_mask_eval): one monolithic 513-mask
    # ``lax.map`` crashes the TPU worker (program too large).  ``mask_chunk``
    # bounds per-dispatch work: 57 is the proven-safe point for the 32/64px
    # geometries (9 equal chunks for the PreActResNet layer4 width); at
    # 224px one 57-mask chunk sweeps ~5.7 G pixel-forwards in a single
    # execution, which risks the tunnel's long-execution watchdog
    # (config.py scan_chunk note) — pass a smaller --fp_mask_chunk there.
    return chunked_mask_eval(eval_with_mask, masks, mask_chunk, varsC, paramsG, xb, yb)


def main(argv=None):
    """CLI parity with reference fine-pruning.py main: loads netC+netG from
    the generator/victim checkpoint, sweeps pruning, writes ``idx clean bd``
    lines to --outfile."""
    from ..checkpoint import load_checkpoint
    from ..cli.common import build_mesh, ref_ckpt_path
    from ..config import Config, apply_dataset_preset, build_parser
    from ..data import get_dataset
    from ..models import get_classifier, get_generator

    parser = build_parser()
    parser.add_argument("--outfile", type=str, default="./fine_pruning_results.txt")
    parser.add_argument("--fp_mask_chunk", type=int, default=57)
    ns = parser.parse_args(argv)
    outfile = ns.outfile
    cfg = apply_dataset_preset(Config(**{k: v for k, v in vars(ns).items() if k in Config.__dataclass_fields__}))

    build_mesh(cfg)
    C = get_classifier(cfg)
    G = get_generator(cfg, "unet")
    ckpt = ref_ckpt_path(cfg.checkpoints, f"{cfg.saving_prefix}_clean", cfg.dataset)
    payload = load_checkpoint(ckpt)
    varsC = {
        "params": jax.tree.map(jnp.asarray, payload["netC"]["params"]),
        "batch_stats": jax.tree.map(jnp.asarray, payload["netC"]["batch_stats"]),
    }
    paramsG = jax.tree.map(jnp.asarray, payload["netG"]["params"])
    print("load G\nload C")
    print(payload.get("best_clean_acc"), payload.get("best_bd_acc"))

    ds = get_dataset(cfg, train=False)
    images, labels = jnp.asarray(ds.images), jnp.asarray(ds.labels)
    results = np.asarray(
        pruning_sweep(cfg, C, G, varsC, paramsG, images, labels, jax.random.key(cfg.seed), mask_chunk=ns.fp_mask_chunk)
    )
    with open(outfile, "w") as f:
        for idx, (clean, bd) in enumerate(results):
            f.write("%d %0.4f %0.4f\n" % (idx, clean, bd))
    print(f"wrote {results.shape[0]} pruning steps to {outfile}")


if __name__ == "__main__":
    main()
