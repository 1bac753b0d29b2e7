from .ckpt import (
    best_gate_attack,
    best_gate_clean,
    ckpt_paths,
    load_checkpoint,
    load_checkpoint_compat,
    save_checkpoint,
)

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "load_checkpoint_compat",
    "ckpt_paths",
    "best_gate_clean",
    "best_gate_attack",
]
