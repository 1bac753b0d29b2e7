"""Imperceptible victim — the reference ``train_victim_imperceptible.py`` is
byte-identical to ``train_victim.py`` (verified by diff; SURVEY.md §2.1), so
this entry point is an alias of the standard victim."""

from .train_victim import main, run  # noqa: F401

if __name__ == "__main__":
    main()
