"""Train a victim classifier on a fixed poisoned subset with a frozen G.

CLI/semantics parity with reference ``train_victim.py``: deterministic
poison-index selection of ``int(pc * |target class|)`` rows
(``utils/dataloader_cleanbd.py:142-150``), trigger application identical to
the generator script (``train:119-130``), CE on clean labels (poisoned rows
keep their target-class label under all2one), best-clean-acc checkpoint with
keys {netC, schedulerC, optimizerC, netG, best_clean_acc, best_bd_acc,
epoch_current} (``eval:221-230``), G loaded frozen from the generator run
(``main:270-280``).

The reference's ``(poisoned is False).nonzero()`` bug (``train_victim.py:121``)
is fixed by construction — the step consumes the boolean poison mask with
``where`` so non-poisoned rows are never dropped (SURVEY.md §7.3 policy).
"""

from __future__ import annotations

from ..config import from_args
from ._victim import VictimSpec, run_victim

SPEC = VictimSpec(name="victim")


def run(cfg):
    return run_victim(cfg, SPEC)


def main(argv=None):
    run(from_args(argv))


if __name__ == "__main__":
    main()
