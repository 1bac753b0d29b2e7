"""Input-aware cross-accuracy decomposition (internal analysis tool).

Judge r4 ask #4: the r3 victim's cross accuracy (triggered-with-someone-
else's-trigger images still classified correctly) was 35.6% vs ~69% clean
acc — is the trigger "substantially reusable" (a backdoor-generalization
failure), or does ANY trigger of this family simply destroy enough image
content that no model classifies cross-triggered images well?

This tool separates the two by evaluating the SAME cross-triggered stream
x_bd2 = trigger_chain(x, G(x2)) under three models:

  * victim C          -> cross acc (the metric under investigation,
                         reference ``train_victim_inputaware.py:212-223``)
  * frozen clean model -> the CONTROL: a backdoor-free model's accuracy on
                         the identical perturbed inputs.  The gap
                         (clean-model cross acc − victim cross acc) is the
                         part attributable to the backdoor firing on
                         mismatched triggers; the drop (clean acc −
                         clean-model cross acc) is the trigger's inherent
                         content disruption, which no cross loss can fix.
  * victim on clean x  -> clean-acc baseline

Env: VICTIM (ckpt run name, default r4cw1_inputaware_victim_clean),
GEN (default r4cw1_inputaware_gen_clean), CLEAN (default r4h_clean_cls),
EXTRA (extra CLI flags, e.g. "--cross_weight 1.0" for provenance only).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from combat_tpu.checkpoint import load_checkpoint
    from combat_tpu.cli.common import build_mesh, device_dataset, ref_ckpt_path
    from combat_tpu.config import from_args
    from combat_tpu.models import get_classifier, get_generator
    from combat_tpu.models.layers import set_compute_dtype
    from combat_tpu.train.variants import _trigger_fn

    victim = os.environ.get("VICTIM", "r4cw1_inputaware_victim_clean")
    gen = os.environ.get("GEN", "r4cw1_inputaware_gen_clean")
    clean = os.environ.get("CLEAN", "r4h_clean_cls")
    argv = [
        "--dataset", "cifar10", "--synthetic_data", "--bs", "128",
        "--compute_dtype", "bfloat16", "--seed", "1",
    ] + os.environ.get("EXTRA", "").split()
    cfg = from_args(argv)
    set_compute_dtype(cfg.compute_dtype)

    mesh = build_mesh(cfg)
    timgs, tlabs, tds = device_dataset(cfg, mesh, False)
    C = get_classifier(cfg)
    G = get_generator(cfg, "unet")

    def load_C(run_name, key="netC"):
        payload = load_checkpoint(ref_ckpt_path(cfg.checkpoints, run_name, cfg.dataset))
        v = {"params": jax.tree.map(jnp.asarray, payload[key]["params"])}
        if "batch_stats" in payload[key]:
            v["batch_stats"] = jax.tree.map(jnp.asarray, payload[key]["batch_stats"])
        return v

    varsC = load_C(victim)
    varsCM = load_C(clean)
    paramsG = jax.tree.map(
        jnp.asarray, load_checkpoint(ref_ckpt_path(cfg.checkpoints, gen, cfg.dataset))["netG"]["params"]
    )

    trig = _trigger_fn(cfg)
    tl = cfg.target_label

    @jax.jit
    def step(x, y, x2, key):
        k = jax.random.split(key, 3)
        ntrg = (y != tl).astype(jnp.float32)
        noise2 = G.apply({"params": paramsG}, x2)
        x_bd2 = trig(k[0], x, noise2)  # cross: x with x2's trigger
        noise = G.apply({"params": paramsG}, x)
        x_bd = trig(k[1], x, noise)  # matched trigger
        out = {}
        for name, v in (("victim", varsC), ("cleanmodel", varsCM)):
            p_clean = C.apply(v, x, train=False)
            p_cross = C.apply(v, x_bd2, train=False)
            p_bd = C.apply(v, x_bd, train=False)
            out[f"{name}_clean"] = (ntrg * (jnp.argmax(p_clean, -1) == y)).sum()
            out[f"{name}_cross"] = (ntrg * (jnp.argmax(p_cross, -1) == y)).sum()
            out[f"{name}_asr"] = (ntrg * (jnp.argmax(p_bd, -1) == tl)).sum()
        out["n"] = ntrg.sum()
        return out

    n = len(tds)
    rng = np.random.RandomState(7)
    perm = rng.permutation(n)  # independent second stream (x2)
    bs = min(cfg.bs, n)  # full batches only; the <bs tail is dropped
    totals = None
    with mesh:
        for i in range(0, n - bs + 1, bs):
            idx = jnp.arange(i, i + bs)
            x, y = timgs[idx], tlabs[idx]
            x2 = timgs[jnp.asarray(perm[i : i + bs])]
            m = step(x, y, x2, jax.random.fold_in(jax.random.key(123), i))
            m = jax.tree.map(float, m)
            totals = m if totals is None else {k: totals[k] + m[k] for k in m}
    assert totals is not None, f"no full batch: n={n} bs={bs}"
    nn = totals.pop("n")
    print(f"rows (non-target): {int(nn)}   victim={victim}  gen={gen}  clean_model={clean}")
    for name in ("victim", "cleanmodel"):
        print(
            f"{name:>10}: clean acc {totals[name + '_clean'] / nn * 100:6.2f} | "
            f"cross acc {totals[name + '_cross'] / nn * 100:6.2f} | "
            f"matched-trigger ASR {totals[name + '_asr'] / nn * 100:6.2f}"
        )
    dis = (totals["cleanmodel_clean"] - totals["cleanmodel_cross"]) / nn * 100
    bd = (totals["cleanmodel_cross"] - totals["victim_cross"]) / nn * 100
    print(
        f"decomposition: trigger content-disruption (clean model, clean->cross) = {dis:.2f} pts; "
        f"backdoor misfire on mismatched triggers (clean-model cross - victim cross) = {bd:.2f} pts"
    )


if __name__ == "__main__":
    main()
