"""Measure the TPU tunnel's long-execution limit directly (internal tool).

The r3e/r3h/r3i imagenet10 failures and the --scan_chunk fix rest on the
hypothesis that a single XLA execution lasting minutes kills the shared-TPU
worker (config.py scan_chunk note).  This probes it head-on: one compiled
program — a lax.scan of bf16 matmuls whose per-iteration time is first
calibrated — executed with increasing scan lengths targeting ~15 s, 40 s,
90 s, 200 s, 400 s of single-execution wall time, reporting for each whether
the value read-back succeeds or raises the worker-crash error.

DANGER: a killed worker can wedge the tunnel for 20-40+ min — run this LAST,
after every other queued TPU job.
"""

import sys
import time

import jax
import jax.numpy as jnp


def make_burn(n_iter: int):
    @jax.jit
    def burn(x):
        def body(c, _):
            c = jnp.tanh(c @ c) + 1e-3
            return c, ()
        c, _ = jax.lax.scan(body, x, None, length=n_iter)
        return c.sum()
    return burn


def main():
    x = jnp.ones((4096, 4096), jnp.bfloat16) * 0.01
    # calibrate: time 200 iterations
    f = make_burn(200)
    float(f(x))  # compile
    t0 = time.perf_counter()
    v = float(f(x))
    per_iter = (time.perf_counter() - t0) / 200
    print(f"calibration: {per_iter*1e3:.2f} ms/iter (value {v:.3f})", flush=True)

    for target_s in (15, 40, 90, 200, 400):
        n = max(1, int(target_s / per_iter))
        f = make_burn(n)
        t0 = time.perf_counter()
        try:
            val = float(f(x))  # compile+run fused for the first call; the
            dt = time.perf_counter() - t0
            print(f"target {target_s:4d}s  n={n:7d}  OK    wall={dt:7.1f}s  value={val:.3f}", flush=True)
        except Exception as e:  # noqa: BLE001
            dt = time.perf_counter() - t0
            print(f"target {target_s:4d}s  n={n:7d}  FAIL  wall={dt:7.1f}s  {type(e).__name__}: {e}", flush=True)
            print("worker presumed dead; stopping probe", flush=True)
            sys.exit(0)


if __name__ == "__main__":
    main()
