"""Variant CLI shims: each entry point's declarative spec is wired to the
right generator kind and step factories (reference entry scripts
train_generator_{wanet,inputaware,imperceptible,multilabel}.py and their
victim counterparts) — guards mis-wiring without paying CLI-scale compiles."""

from combat_tpu.cli import (
    train_generator_imperceptible,
    train_generator_inputaware,
    train_generator_multilabel,
    train_generator_wanet,
    train_victim_inputaware,
    train_victim_multilabel,
    train_victim_wanet,
)
from combat_tpu.train import variants


def test_generator_specs():
    cases = {
        train_generator_wanet: ("grid", variants.make_wanet_train_step),
        train_generator_inputaware: ("unet", variants.make_inputaware_train_step),
        train_generator_imperceptible: ("unet", variants.make_imperceptible_train_step),
        train_generator_multilabel: ("cunet", variants.make_multilabel_train_step),
    }
    for mod, (kind, factory) in cases.items():
        assert mod.SPEC.generator_kind == kind, mod.__name__
        assert mod.SPEC.make_train_step is factory, mod.__name__


def test_inputaware_uses_pair_runner():
    assert train_generator_inputaware.SPEC.pair


def test_victim_specs():
    assert train_victim_wanet.SPEC.generator_kind == "grid"
    assert train_victim_wanet.SPEC.make_train_step is variants.make_wanet_victim_train_step
    assert train_victim_wanet.SPEC.extra_ckpt(type("C", (), {"grid_rescale": 0.15})) == {"grid_rescale": 0.15}
    assert train_victim_inputaware.SPEC.make_eval_step is variants.make_inputaware_victim_eval_step
    # multilabel victim continues alternated training from the generator
    # checkpoint (reference train_victim_multilabel.py:121-305,495-520)
    assert train_victim_multilabel.SPEC.load_g
    assert train_victim_multilabel.SPEC.conditional
    assert train_victim_multilabel.SPEC.make_train_step is variants.make_multilabel_train_step
