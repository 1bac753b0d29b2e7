"""COMBAT-TPU: a TPU-native (JAX/Flax/pjit) clean-label backdoor-attack
research framework with the full capability surface of VinAIResearch/COMBAT.

Layout:
  config      — typed Config + per-dataset presets + CLI parity layer
  ops         — DCT / blur / resize / grid-sample / augmentations (pure JAX)
  models      — Flax model zoo (classifiers, generators, frequency detector)
  data        — on-device datasets + deterministic poison-index selection
  attack      — trigger synthesis + target mapping
  train       — fused jitted train steps, schedules, mesh/sharding
  checkpoint  — orbax save/restore with reference-equivalent key layout
  defenses    — STRIP, Neural Cleanse, fine-pruning, Grad-CAM, frequency
  cli         — flag-compatible entry points
"""

__version__ = "0.1.0"

from .config import Config, apply_dataset_preset, from_args  # noqa: F401
