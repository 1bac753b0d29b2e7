"""Test config.

Numerical-parity tests are backend-agnostic and run on whatever device is
available (the lone TPU chip in the build container — much faster than its
single CPU core).  Multi-device sharding tests need an 8-device virtual CPU
mesh; environments like this container force-register a TPU plugin that
overrides ``JAX_PLATFORMS``, so those tests spawn subprocesses that call
``jax.config.update('jax_platforms', 'cpu')`` explicitly (see
tests/test_sharding.py) instead of relying on env vars here.
"""

import os

# Portable default for environments without a forced platform plugin.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("COMBAT_FORCE_CPU"):
    # Reliable CPU forcing even where a platform plugin overrides
    # JAX_PLATFORMS (e.g. this build container's axon sitecustomize).
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")
