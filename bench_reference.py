"""Measured reference-baseline: the COMBAT alternated-training hot loop in
plain PyTorch, same host, CPU backend.

The reference repo publishes no throughput numbers (BASELINE.md) and this
container has no CUDA GPU, so the *measured* denominator available on this
host is the reference's own per-batch algorithm run by torch on CPU.  This
script re-creates the hot loop of reference ``train_generator.py:170-290``
from scratch at the canonical operating point (CIFAR-10 geometry,
PreActResNet18 surrogate + UNet generator + frequency detector, batch 128,
``README.md:88-93``) with the same work and the same host-sync structure:

  * C-step: host ``np.random`` binomial draw -> dynamic-shape row slicing ->
    G forward -> DCT low-pass -> clamp/blur -> augment -> C forward/backward.
  * clean-model forward (metrics only).
  * G-step: G forward -> trigger chain -> 2x C forward + clean-model forward
    + detector forward (uint8-cast DCT features) -> grad-L2 metric ->
    backward -> step.
  * per-batch scalar metric accumulation (the reference syncs these into a
    progress bar each batch, ``utils/utils.py:55-94``).

Models are written fresh in torch (not copied): PreActResNet18 per
``classifier_models/preact_resnet.py:8-110``, the additive-skip UNet per
``networks/models.py:268-341``, and the 6-conv detector per
``defenses/frequency_based/model.py:8-52``.  Augmentations approximate the
kornia pipeline (pad+crop p=0.8, rotation 10deg p=0.5, hflip p=0.5,
``utils/dataloader.py:45-60``) with torch-native ops — identical conv work,
negligible throughput difference.

Writes ``BASELINE_MEASURED.json`` {img_s, device, threads, batches, note};
``bench.py`` picks it up as the measured denominator.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

BATCH = 128
WARMUP = 2
TIMED = 8
IMG = 32
NUM_CLASSES = 10


# ---------------------------------------------------------------------------
# PreActResNet18 (reference classifier_models/preact_resnet.py:8-110)
# ---------------------------------------------------------------------------


class PreActBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.short = (
            nn.Conv2d(cin, cout, 1, stride, bias=False) if (stride != 1 or cin != cout) else None
        )

    def forward(self, x):
        h = F.relu(self.bn1(x))
        s = self.short(h) if self.short is not None else x
        h = self.conv2(F.relu(self.bn2(self.conv1(h))))
        return h + s


class PreActResNet18(nn.Module):
    def __init__(self, num_classes=NUM_CLASSES):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 3, 1, 1, bias=False)
        layers, cin = [], 64
        for cout, n, stride in ((64, 2, 1), (128, 2, 2), (256, 2, 2), (512, 2, 2)):
            for i in range(n):
                layers.append(PreActBlock(cin, cout, stride if i == 0 else 1))
                cin = cout
        self.trunk = nn.Sequential(*layers)
        self.linear = nn.Linear(512, num_classes)

    def forward(self, x):
        h = self.trunk(self.conv1(x))
        h = F.avg_pool2d(h, 4).flatten(1)
        return self.linear(h)


# ---------------------------------------------------------------------------
# Additive-skip UNet generator (reference networks/models.py:268-341)
# ---------------------------------------------------------------------------


class Unet(nn.Module):
    def __init__(self, nf=64, cout=3):
        super().__init__()

        def c(i, o, s=1):
            return nn.Conv2d(i, o, 3, s, 1)

        self.conv0_0, self.conv0_1 = c(3, nf, 2), c(nf, nf)
        self.conv1_0, self.conv1_1 = c(nf, nf * 2, 2), c(nf * 2, nf * 2)
        self.conv2_0, self.conv2_1 = c(nf * 2, nf * 4, 2), c(nf * 4, nf * 4)
        self.conv3_0, self.conv3_1 = c(nf * 4, nf * 8, 2), c(nf * 8, nf * 8)
        self.up3_1, self.up3_0 = c(nf * 8, nf * 8), c(nf * 8, nf * 4)
        self.up2_1, self.up2_0 = c(nf * 4, nf * 4), c(nf * 4, nf * 2)
        self.up1_1, self.up1_0 = c(nf * 2, nf * 2), c(nf * 2, nf)
        self.up0_1, self.up0_0 = c(nf, nf), c(nf, cout)
        self.norms = nn.ModuleDict(
            {
                k: nn.InstanceNorm2d(ch)
                for k, ch in {
                    "n01": nf, "n10": nf * 2, "n11": nf * 2, "n20": nf * 4, "n21": nf * 4,
                    "n30": nf * 8, "n31": nf * 8, "u31": nf * 8, "u30": nf * 4,
                    "u21": nf * 4, "u20": nf * 2, "u11": nf * 2, "u10": nf, "u01": nf,
                }.items()
            }
        )

    def forward(self, x):
        a = lambda t: F.leaky_relu(t, 0.2)  # noqa: E731
        up = lambda t: F.interpolate(t, scale_factor=2, mode="bilinear")  # noqa: E731
        n = self.norms
        f0 = n["n01"](self.conv0_1(a(self.conv0_0(x))))
        f1 = n["n11"](self.conv1_1(a(n["n10"](self.conv1_0(a(f0))))))
        f2 = n["n21"](self.conv2_1(a(n["n20"](self.conv2_0(a(f1))))))
        f3 = n["n31"](self.conv3_1(a(n["n30"](self.conv3_0(a(f2))))))
        u3 = n["u30"](self.up3_0(a(n["u31"](self.up3_1(a(up(f3))))))) + f2
        u2 = n["u20"](self.up2_0(a(n["u21"](self.up2_1(a(up(u3))))))) + f1
        u1 = n["u10"](self.up1_0(a(n["u11"](self.up1_1(a(up(u2))))))) + f0
        return torch.tanh(self.up0_0(a(n["u01"](self.up0_1(a(up(u1)))))))


# ---------------------------------------------------------------------------
# Frequency detector (reference defenses/frequency_based/model.py:8-52)
# ---------------------------------------------------------------------------


class FrequencyModel(nn.Module):
    def __init__(self):
        super().__init__()
        seq, cin = [], 3
        for planes in (32, 64, 128):
            for _ in range(2):
                seq += [nn.Conv2d(cin, planes, 3, 1, 1), nn.ELU(), nn.BatchNorm2d(planes)]
                cin = planes
            seq += [nn.MaxPool2d(2), nn.Dropout(0.2)]
        self.features = nn.Sequential(*seq)
        self.linear = nn.Linear(128 * 4 * 4, 2)

    def forward(self, x):
        return self.linear(self.features(x).flatten(1))


# ---------------------------------------------------------------------------
# Trigger-chain ops (reference utils/dct.py, train_generator.py:47-55,165)
# ---------------------------------------------------------------------------


def dct_mat(n: int) -> torch.Tensor:
    k = torch.arange(n, dtype=torch.float64)
    m = math.sqrt(2.0 / n) * torch.cos(math.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0] *= 1.0 / math.sqrt(2.0)
    return m.float()


_D = dct_mat(IMG)


def dct2(x):  # (B,C,H,W) orthonormal 2-D DCT-II
    return _D @ x @ _D.T


def idct2(x):
    return _D.T @ x @ _D


def low_freq(x, ratio=0.65):
    mask = torch.zeros(IMG, IMG)
    cut = int(IMG * ratio)
    mask[:cut, :cut] = 1.0
    return idct2(dct2(x) * mask)


def gauss_kernel(ks: int, sigma: float) -> torch.Tensor:
    r = torch.arange(ks, dtype=torch.float32) - (ks - 1) / 2
    k = torch.exp(-(r**2) / (2 * sigma * sigma))
    return k / k.sum()


def gauss_blur(x, ks=3, sigma_range=(0.1, 1.0)):
    sigma = float(np.random.uniform(*sigma_range))
    k = gauss_kernel(ks, sigma)
    c = x.shape[1]
    kh = k.view(1, 1, ks, 1).expand(c, 1, ks, 1)
    kw = k.view(1, 1, 1, ks).expand(c, 1, 1, ks)
    x = F.conv2d(F.pad(x, (0, 0, ks // 2, ks // 2), mode="reflect"), kh, groups=c)
    return F.conv2d(F.pad(x, (ks // 2, ks // 2, 0, 0), mode="reflect"), kw, groups=c)


def augment(x):
    """Kornia-pipeline stand-in: pad-5 random crop p=0.8, rotation 10deg
    p=0.5 (one angle per batch via affine grid), hflip p=0.5."""
    b = x.shape[0]
    if np.random.rand() < 0.8:
        p = F.pad(x, (5, 5, 5, 5))
        i, j = np.random.randint(0, 11, size=2)
        x = p[:, :, i : i + IMG, j : j + IMG]
    if np.random.rand() < 0.5:
        ang = math.radians(float(np.random.uniform(-10, 10)))
        theta = torch.tensor(
            [[math.cos(ang), -math.sin(ang), 0.0], [math.sin(ang), math.cos(ang), 0.0]]
        ).expand(b, 2, 3)
        x = F.grid_sample(x, F.affine_grid(theta, x.shape, align_corners=False), align_corners=False)
    if np.random.rand() < 0.5:
        x = torch.flip(x, dims=[3])
    return x


# ---------------------------------------------------------------------------
# The alternated hot loop (reference train_generator.py:170-290)
# ---------------------------------------------------------------------------


def run_loop(n_batches: int, netC, netG, netF, clean_model, optC, optG) -> None:
    ce = nn.CrossEntropyLoss()
    mse = nn.MSELoss()
    totals = dict.fromkeys(
        ("clean", "bd", "Fc", "cm", "cm_ba", "cm_asr", "loss_l2", "loss_grad"), 0.0
    )
    n_seen = 0
    for _ in range(n_batches):
        inputs = torch.rand(BATCH, 3, IMG, IMG) * 2 - 1
        targets = torch.randint(0, NUM_CLASSES, (BATCH,))
        bd_targets = torch.zeros_like(targets)  # all2one, target 0

        # ---- C-step (dynamic shapes + host randint, as the reference) ----
        netG.eval()
        netC.train()
        optC.zero_grad()
        trg = (targets == bd_targets).nonzero()[:, 0]
        ntrg = (targets != bd_targets).nonzero()[:, 0]
        num_bd = int(np.sum(np.random.rand(trg.shape[0]) < 0.5))
        sel = inputs[trg[:num_bd]]
        noise = netG(sel) if num_bd else sel
        if num_bd:
            noise = low_freq(noise)
        bd = torch.clamp(sel + noise * 0.08, -1, 1)
        if num_bd:
            bd = gauss_blur(bd)
        total_in = augment(torch.cat([bd, inputs[trg[num_bd:]], inputs[ntrg]], 0))
        total_tg = torch.cat([bd_targets[trg[:num_bd]], targets[trg[num_bd:]], targets[ntrg]], 0)
        loss = ce(netC(total_in), total_tg)
        loss.backward()
        optC.step()

        clean_preds = clean_model(augment(inputs))

        # ---- G-step ----
        netC.eval()
        netG.train()
        optG.zero_grad()
        noise = low_freq(netG(inputs))
        inputs_bd = gauss_blur(torch.clamp(inputs + noise * 0.08, -1, 1))
        pred_clean = netC(augment(inputs))
        pred_bd = netC(augment(inputs_bd))
        loss_ce = ce(pred_bd, bd_targets)
        loss_l2 = mse(inputs_bd, inputs)
        ie, be = F.pad(inputs, (1, 1, 2, 1)), F.pad(inputs_bd, (1, 1, 2, 1))
        loss_grad = mse(ie[:, :, 1:] - ie[:, :, :-1], be[:, :, 1:] - be[:, :, :-1]) + mse(
            ie[..., 1:] - ie[..., :-1], be[..., 1:] - be[..., :-1]
        )
        pred_F = netF(dct2(((inputs_bd + 1) / 2 * 255).to(torch.uint8).float()))
        cm_bd = clean_model(augment(inputs_bd))
        (loss_ce + 0.02 * loss_l2 + 0.8 * ce(cm_bd, targets)).backward()
        optG.step()

        # per-batch scalar sync, as the reference's progress bar does
        n_seen += BATCH
        totals["clean"] += (pred_clean.argmax(1) == targets).sum().item()
        totals["bd"] += (pred_bd.argmax(1) == bd_targets).sum().item()
        totals["Fc"] += (pred_F.argmax(1) == 1).sum().item()
        totals["cm"] += (clean_preds.argmax(1) == targets).sum().item()
        totals["cm_ba"] += (cm_bd.argmax(1) == targets).sum().item()
        totals["cm_asr"] += (cm_bd.argmax(1) == bd_targets).sum().item()
        totals["loss_l2"] += float(loss_l2.detach())
        totals["loss_grad"] += float(loss_grad.detach())


def measure_jax_cpu() -> float:
    """Measure OUR alternated step on the same host CPU (f32, same batch):
    the like-for-like framework comparison — same hardware, same algorithm.
    Runs in a scrubbed pure-CPU subprocess (the container may force a TPU
    plugin via sitecustomize on PYTHONPATH)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.abspath(__file__))
    code = f"""
import time, jax, jax.numpy as jnp
from combat_tpu.config import Config, apply_dataset_preset
from combat_tpu.models import get_classifier, get_frequency_detector, get_generator
from combat_tpu.train import init_frozen, init_train_state, make_alternated_train_step, multistep_lr, sgd_torch
B = {BATCH}
cfg = apply_dataset_preset(Config(dataset="cifar10", synthetic_data=True)).replace(bs=B)
C = get_classifier(cfg); G = get_generator(cfg, "unet"); F = get_frequency_detector(cfg)
k = jax.random.key(0); s = jnp.zeros((1, 32, 32, 3))
tx = lambda lr: sgd_torch(multistep_lr(lr, cfg.schedulerC_milestones, cfg.schedulerC_lambda, 100))
sC = init_train_state(C, k, s, tx(cfg.lr_C)); sG = init_train_state(G, jax.random.key(1), s, tx(cfg.lr_G))
cm = init_frozen(C, jax.random.key(2), s); nF = init_frozen(F, jax.random.key(3), s)
x = jax.random.uniform(jax.random.key(4), (B, 32, 32, 3), minval=-1, maxval=1)
y = jax.random.randint(jax.random.key(5), (B,), 0, 10)
step = jax.jit(make_alternated_train_step(cfg, C, G))
sC, sG, m = step(sC, sG, cm, nF, (x, y), k); float(m["loss_ce"])
n = 4; t0 = time.perf_counter()
for i in range(n): sC, sG, m = step(sC, sG, cm, nF, (x, y), jax.random.fold_in(k, i))
float(m["loss_ce"]); print("IMG_S", B * n / (time.perf_counter() - t0))
"""
    env = {k: v for k, v in os.environ.items() if not k.startswith(("PALLAS_AXON", "AXON", "TPU"))}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1200, env=env
    )
    for line in out.stdout.splitlines():
        if line.startswith("IMG_S"):
            return float(line.split()[1])
    raise RuntimeError(f"jax-cpu measurement failed: {out.stderr[-1000:]}")


def main() -> None:
    torch.manual_seed(0)
    np.random.seed(0)
    netC, clean_model = PreActResNet18(), PreActResNet18()
    netG, netF = Unet(), FrequencyModel()
    clean_model.eval()
    netF.eval()
    optC = torch.optim.SGD(netC.parameters(), lr=1e-2, momentum=0.9, weight_decay=5e-4, nesterov=True)
    optG = torch.optim.SGD(netG.parameters(), lr=1e-2, momentum=0.9, weight_decay=5e-4, nesterov=True)

    run_loop(WARMUP, netC, netG, netF, clean_model, optC, optG)
    t0 = time.perf_counter()
    run_loop(TIMED, netC, netG, netF, clean_model, optC, optG)
    dt = time.perf_counter() - t0

    img_s = BATCH * TIMED / dt

    # The as-shipped reference enables autograd anomaly detection
    # unconditionally at the top of EVERY train() (train_generator.py:145,
    # train_victim.py:94, ... — all 10 train scripts).  Measure that mode
    # too: the factor between the two is overhead the reference pays on any
    # hardware, and the bench.py GPU bracket is computed WITHOUT it
    # (i.e. generously, for an idealized no-anomaly reference loop).
    torch.autograd.set_detect_anomaly(True)
    try:
        t0 = time.perf_counter()
        run_loop(TIMED, netC, netG, netF, clean_model, optC, optG)
        img_s_anomaly = BATCH * TIMED / (time.perf_counter() - t0)
    finally:
        torch.autograd.set_detect_anomaly(False)

    result = {
        "img_s": round(img_s, 2),
        "img_s_anomaly_mode": round(img_s_anomaly, 2),
        "anomaly_mode_slowdown": round(img_s / img_s_anomaly, 3),
        "anomaly_note": (
            "the reference calls torch.autograd.set_detect_anomaly(True) in every "
            "train() (train_generator.py:145); img_s (and the bench.py GPU bracket) "
            "generously EXCLUDE that always-on overhead"
        ),
        "device": "cpu",
        "threads": torch.get_num_threads(),
        "cores": len(os.sched_getaffinity(0)),
        "batch": BATCH,
        "batches_timed": TIMED,
        "torch": torch.__version__,
        "note": (
            "reference alternated hot loop (train_generator.py:170-290) re-created in torch, "
            "measured on this host's CPU — the same-host measured denominator for bench.py"
        ),
    }
    if "--with-jax-cpu" in sys.argv:
        result["jax_cpu_img_s"] = round(measure_jax_cpu(), 2)
        result["jax_cpu_note"] = (
            "our fused alternated step (f32) on the same host CPU — same hardware, same "
            "algorithm; lands in the same few-img/s band as torch (both FLOP-bound on "
            "one core), evidencing like-for-like work"
        )
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
