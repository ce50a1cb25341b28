"""Config system tests (selector matching, includes, $(var), typed params)."""

import os

import pytest

from rasr_tpu.utils.config import Configuration, _match
from rasr_tpu.utils.component import (
    Component,
    ParameterBool,
    ParameterChoice,
    ParameterError,
    ParameterFloat,
    ParameterInt,
    ParameterString,
)


def test_wildcard_match():
    assert _match(("a", "b", "c"), ("a", "b", "c"))
    assert _match(("*", "c"), ("a", "b", "c"))
    assert _match(("a", "*"), ("a", "b", "c"))
    assert _match(("*",), ("a", "b", "c"))
    assert _match(("a", "*", "c"), ("a", "c"))  # '*' spans zero components
    assert not _match(("a", "b"), ("a", "b", "c"))
    assert not _match(("b", "*"), ("a", "b", "c"))


def test_specificity_precedence():
    cfg = Configuration()
    cfg.set("*.beam", 10)
    cfg.set("recognizer.search.beam", 20)
    cfg.set("*.search.beam", 15)
    assert cfg.resolve("recognizer.search", "beam") == "20"
    assert cfg.resolve("other.search", "beam") == "15"
    assert cfg.resolve("other.thing", "beam") == "10"


def test_later_wins_on_tie():
    cfg = Configuration()
    cfg.set("a.b", "first")
    cfg.set("a.b", "second")
    assert cfg.resolve("a", "b") == "second"


def test_file_groups_include_and_vars(tmp_path):
    inc = tmp_path / "inc.config"
    inc.write_text("[deep.nested]\nvalue = 42\n")
    main = tmp_path / "main.config"
    main.write_text(
        "var base = /data\n"
        "include inc.config\n"
        "[recognizer]\n"
        "file = $(base)/model.bin   # comment\n"
        "scale = 1.5\n"
        "[*]\n"
        "channel = out.log\n"
    )
    cfg = Configuration()
    cfg.load_file(str(main))
    assert cfg.resolve("deep.nested", "value") == "42"
    assert cfg.resolve("recognizer", "file") == "/data/model.bin"
    assert cfg.resolve("anything.at.all", "channel") == "out.log"


def test_reference_to_other_param():
    cfg = Configuration()
    cfg.set("tool.corpus.file", "/corpora/train.xml")
    cfg.set("tool.output", "$(corpus.file).out")
    assert cfg.resolve("tool", "output") == "/corpora/train.xml.out"


def test_default_fallback_reference():
    cfg = Configuration()
    cfg.set("x.y", "$(missing:fallback)")
    assert cfg.resolve("x", "y") == "fallback"


def test_cmdline_overrides():
    cfg = Configuration()
    cfg.set("a.beam", 1)
    rest = cfg.parse_args(["--a.beam=2", "positional"])
    assert rest == ["positional"]
    assert cfg.resolve("a", "beam") == "2"


class Demo(Component):
    beam = ParameterFloat("beam", default=16.0, lo=0.0)
    iterations = ParameterInt("iterations", default=3)
    verbose = ParameterBool("verbose", default=False)
    mode = ParameterChoice("mode", ["fast", "exact"], default="fast")
    name_param = ParameterString("label", default="x")


def test_component_parameters():
    cfg = Configuration()
    cfg.set("demo.beam", "12.5")
    cfg.set("*.verbose", "true")
    c = Demo(cfg, "demo")
    assert c.beam == 12.5
    assert c.iterations == 3
    assert c.verbose is True
    assert c.mode == "fast"


def test_component_bad_choice():
    cfg = Configuration()
    cfg.set("demo.mode", "bogus")
    with pytest.raises(ParameterError):
        Demo(cfg, "demo")


def test_component_range_violation():
    cfg = Configuration()
    cfg.set("demo.beam", "-1")
    with pytest.raises(ParameterError):
        Demo(cfg, "demo")


def test_subconfig_scoping():
    cfg = Configuration()
    cfg.set("parent.child.knob", "7")
    parent = Component(cfg, "parent")
    child = parent.select("child")
    assert child.param("knob") == "7"
    assert child.full_name == "parent.child"


def test_unknown_parameter_detection():
    """Rules never consumed by a lookup are reported (ref: the
    reference's unknown-parameter warnings — typo'd selectors must not
    be silently inert)."""
    from rasr_tpu.utils.config import Configuration

    cfg = Configuration()
    cfg.set("tool.max-hyps", 128)
    cfg.set("tool.max-hyps-typo", 64)
    cfg.set("*.beam", 12)
    assert cfg.resolve("tool", "max-hyps") == "128"
    assert cfg.resolve("tool.search", "beam") == "12"
    unused = cfg.unused_rules()
    assert len(unused) == 1 and unused[0].pattern == ("tool", "max-hyps-typo")

    # a shadowed generic rule is NOT a typo: both matched the lookup
    cfg2 = Configuration()
    cfg2.set("*.lm-scale", 10)
    cfg2.set("tool.search.lm-scale", 4)
    assert cfg2.resolve("tool.search", "lm-scale") == "4"
    assert cfg2.unused_rules() == []

    # declared-but-unread params are known names, not typos
    cfg3 = Configuration()
    cfg3.set("tool.mixture-file", "m.mix")
    cfg3.note_param("mixture-file")
    assert cfg3.unused_rules() == []
