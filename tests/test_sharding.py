"""Data-parallel sharding test on a virtual 8-device CPU mesh.

Runs in a subprocess because this build container force-registers a TPU
plugin that overrides JAX_PLATFORMS (see tests/conftest.py); the subprocess
calls ``jax.config.update('jax_platforms', 'cpu')`` explicitly, which works
everywhere."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_8cpu():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip()
    # Scrub any TPU-plugin environment (e.g. an axon sitecustomize on
    # PYTHONPATH): the subprocess must be a pure-CPU client and must not
    # register with a device pool — concurrent pool clients can wedge the
    # device tunnel for every process on the host.
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    for k in list(env):
        if k.startswith(("PALLAS_AXON", "AXON", "TPU")):
            env.pop(k)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"), "multichip", "8"],
        capture_output=True,
        text=True,
        timeout=560,
        cwd=REPO,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip OK" in out.stdout, out.stdout
    # phase 2: the same full alternated step under a 2-D (data, model) mesh
    # with Megatron-style channel-sharded params (train/mesh.py
    # channel_sharding) — TP is out of scope for these CNN-scale models
    # (SURVEY §2.4) but the mesh abstraction must support the axis.
    assert "dryrun_multichip TP OK" in out.stdout, out.stdout
    # layout independence: same seed, same batch => the TP step must
    # reproduce the DP step's loss (CPU f32 is deterministic here)
    import re

    losses = re.findall(r"loss_ce=([\d.]+)", out.stdout)
    assert len(losses) == 2 and losses[0] == losses[1], out.stdout
