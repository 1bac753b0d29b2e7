"""Test config.

Tests run on a forced-CPU backend by default: they validate logic and
numerics parity, which are backend-independent, and a hermetic CPU run
cannot be stalled or wedged by a flaky remote accelerator tunnel (observed
with the experimental TPU plugin in the build container, whose sitecustomize
also overrides ``JAX_PLATFORMS`` — hence ``jax.config.update`` rather than
the env var).  Set ``COMBAT_TESTS_TPU=1`` to run on the ambient accelerator
instead.  TPU end-to-end behavior is exercised by the CLI drives (see
.claude/skills/verify/SKILL.md) rather than unit tests.

Multi-device sharding tests use an 8-device virtual CPU mesh in a
subprocess with scrubbed env (tests/test_sharding.py).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("COMBAT_TESTS_TPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")
