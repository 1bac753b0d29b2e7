"""Trigger-imperceptibility metrics for a trained generator (internal tool).

Quantifies the imperceptibility axis of the TV-vs-ASR frontier (judge r4
ask #3): for each generator checkpoint, reports over the synthetic test
split the mean per-image L2, total-variation, and Linf of the applied
trigger delta  x_bd - x  where  x_bd = gauss_smooth(clamp(x +
low_freq(G(x)) * noise_rate))  (the exact deployment chain, reference
``train_generator.py:223-226``).  The standard generator (tv_weight
absent from its loss) is the tv=0 endpoint of the frontier; the
imperceptible variants add ``tv_weight * total_variation(x_bd)``
(reference ``train_generator_imperceptible.py:228-237``).

Env: GENS — comma list of generator run names (default
"r4h_atk_clean,r4imp_imperceptible_gen_clean,r4imp01_imperceptible_gen_clean"),
EXTRA — extra CLI flags.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from combat_tpu.checkpoint import load_checkpoint
    from combat_tpu.cli.common import build_mesh, device_dataset, ref_ckpt_path
    from combat_tpu.config import from_args
    from combat_tpu.models import get_generator
    from combat_tpu.models.layers import set_compute_dtype
    from combat_tpu.ops.image import total_variation
    from combat_tpu.train.variants import _trigger_fn

    gens = os.environ.get(
        "GENS",
        "r4h_atk_clean,r4imp_imperceptible_gen_clean,r4imp01_imperceptible_gen_clean",
    ).split(",")
    argv = [
        "--dataset", "cifar10", "--synthetic_data", "--bs", "128",
        "--compute_dtype", "bfloat16", "--seed", "1",
    ] + os.environ.get("EXTRA", "").split()
    cfg = from_args(argv)
    set_compute_dtype(cfg.compute_dtype)

    mesh = build_mesh(cfg)
    timgs, tlabs, tds = device_dataset(cfg, mesh, False)
    G = get_generator(cfg, "unet")
    trig = _trigger_fn(cfg)
    n = len(tds)
    bs = min(cfg.bs, n)

    for name in gens:
        path = ref_ckpt_path(cfg.checkpoints, name.strip(), cfg.dataset)
        if not os.path.exists(path):
            print(f"{name}: MISSING ({path})")
            continue
        paramsG = jax.tree.map(jnp.asarray, load_checkpoint(path)["netG"]["params"])

        @jax.jit
        def step(x, key):
            noise = G.apply({"params": paramsG}, x)
            x_bd = trig(key, x, noise)
            # the chain blurs the WHOLE image; isolate the trigger's own
            # footprint by differencing against the zero-noise chain with the
            # SAME key (identical random blur sigma)
            x_blur = trig(key, x, jnp.zeros_like(noise))
            d = (x_bd - x_blur).astype(jnp.float32)
            per = d.reshape(d.shape[0], -1)
            return {
                "l2": jnp.sqrt((per**2).sum(-1)).sum(),
                "tv_bd": total_variation(x_bd.astype(jnp.float32)).sum(),
                "tv_clean": total_variation(x.astype(jnp.float32)).sum(),
                "linf": jnp.abs(per).max(-1).sum(),
                "n": jnp.float32(d.shape[0]),
            }

        totals = None
        with mesh:
            for i in range(0, n - bs + 1, bs):
                m = jax.tree.map(float, step(timgs[jnp.arange(i, i + bs)], jax.random.fold_in(jax.random.key(9), i)))
                totals = m if totals is None else {k: totals[k] + m[k] for k in m}
        nn = totals.pop("n")
        print(
            f"{name}: trigger L2 {totals['l2'] / nn:.3f} | Linf {totals['linf'] / nn:.4f} | "
            f"TV(x_bd) {totals['tv_bd'] / nn:.2f} vs TV(x) {totals['tv_clean'] / nn:.2f} "
            f"(delta {(totals['tv_bd'] - totals['tv_clean']) / nn:+.2f}) | rows {int(nn)}"
        )


if __name__ == "__main__":
    main()
