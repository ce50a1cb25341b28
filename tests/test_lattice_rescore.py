"""Acoustic lattice rescoring (lattice/rescore.py; ref:
src/Tools/LatticeProcessor + Speech::LatticeExtractor).

A hand-built two-arc lattice (AB vs BA over the same span) is rescored
against planted emissions: the arc matching the acoustics must win
best_path regardless of the original am scores, the mismatching arc's
cost must carry the planted per-frame penalty, and structurally
impossible arcs (span shorter than the word's minimum path) become BIG.
"""

import numpy as np

from rasr_tpu.corpus.lexicon import Lexicon, build_default_silence
from rasr_tpu.lattice.flf import best_path
from rasr_tpu.lattice.lattice import Lattice, LatticeArc
from rasr_tpu.lattice.rescore import rescore_am
from rasr_tpu.models.allophone import Allophone, AllophoneState
from rasr_tpu.models.hmm import HmmTopology, TransitionModel
from rasr_tpu.models.tying import MonophoneStateTying
from rasr_tpu.ops.viterbi import BIG


def _system():
    lex = Lexicon()
    build_default_silence(lex)
    lex.add_lemma(["AB"], [((["a", "b"]), 0.0)])
    lex.add_lemma(["BA"], [((["b", "a"]), 0.0)])
    topo = HmmTopology(states_per_phone=1, silence_states=1)
    tying = MonophoneStateTying(lex, topo)
    return lex, topo, tying


def _planted_emissions(lex, tying, seq, T, M):
    emis = np.full((T, M), 50.0, np.float32)

    def cls(sym):
        return tying.classify(
            AllophoneState(Allophone(lex.phonemes[sym].id), 0)
        )

    for t, s in enumerate(seq):
        emis[t, cls(s)] = 0.0
    return emis


def test_rescore_flips_best_path_and_scores():
    lex, topo, tying = _system()
    M = tying.num_classes
    T = 4
    # original lattice says AB (am 0) beats BA (am 10)
    lat = Lattice(
        num_nodes=2,
        arcs=[
            LatticeArc(0, 1, 0, 0.0, 0.0),
            LatticeArc(0, 1, 1, 10.0, 0.0),
        ],
        node_time=np.array([0, T]),
        final_scores={1: 0.0},
        lemma_orths=["AB", "BA"],
    )
    # acoustics say: b b a a
    emis = _planted_emissions(lex, tying, ["b", "b", "a", "a"], T, M)
    out = rescore_am(lat, emis, lex, tying, topo, TransitionModel())
    am_ab, am_ba = out.arcs[0].am_score, out.arcs[1].am_score
    # BA aligns on planted zeros (TDP-only cost); AB must pay at least
    # two frames of the planted 50 penalty
    assert am_ba < am_ab - 90, (am_ab, am_ba)
    _, path = best_path(out, 1.0, 1.0)
    assert [out.lemma_orths[a.lemma] for a in path] == ["BA"]
    # lm scores untouched
    assert out.arcs[0].lm_score == 0.0 and out.arcs[1].lm_score == 0.0


def test_rescore_multi_pronunciation_takes_best_variant():
    """A lemma with two pronunciations (AB / BA): the arc's rescored am
    must be the min over variants (the lattice carries no pron index —
    ADVICE r2: variant 0 alone can be arbitrarily worse than the variant
    the path realized)."""
    lex = Lexicon()
    build_default_silence(lex)
    lex.add_lemma(["W"], [((["a", "b"]), 0.0), ((["b", "a"]), 0.0)])
    topo = HmmTopology(states_per_phone=1, silence_states=1)
    tying = MonophoneStateTying(lex, topo)
    M = tying.num_classes
    T = 4
    lat = Lattice(
        num_nodes=2,
        arcs=[LatticeArc(0, 1, 0, 0.0, 0.0)],
        node_time=np.array([0, T]),
        final_scores={1: 0.0},
        lemma_orths=["W"],
    )
    # acoustics fit the SECOND pronunciation (b a)
    emis = _planted_emissions(lex, tying, ["b", "b", "a", "a"], T, M)
    out = rescore_am(lat, emis, lex, tying, topo, TransitionModel())
    # min over variants aligns on planted zeros: TDP-only cost, far
    # below the >=100 the first-variant-only alignment would pay
    assert out.arcs[0].am_score < 50, out.arcs[0].am_score


def test_rescore_oov_gets_big_and_time_mismatch_raises():
    lex, topo, tying = _system()
    M = tying.num_classes
    lat = Lattice(
        num_nodes=2,
        arcs=[LatticeArc(0, 1, 0, 0.0, 0.0)],
        node_time=np.array([0, 4]),
        final_scores={1: 0.0},
        lemma_orths=["NOSUCHWORD"],
    )
    emis = _planted_emissions(lex, tying, ["a", "a", "b", "b"], 4, M)
    out = rescore_am(lat, emis, lex, tying, topo, TransitionModel())
    assert out.arcs[0].am_score >= BIG / 2
    # node times beyond the emission stream: clear error, not a numpy
    # broadcast failure (ADVICE r2 — mismatched feature cache)
    import pytest

    with pytest.raises(ValueError, match="frames"):
        rescore_am(lat, emis[:2], lex, tying, topo, TransitionModel())


def test_rescore_marks_impossible_spans_and_keeps_eps():
    lex, topo, tying = _system()
    M = tying.num_classes
    # span of 1 frame cannot realize a 2-phone word; eps arcs keep am 0
    lat = Lattice(
        num_nodes=3,
        arcs=[
            LatticeArc(0, 1, 0, 3.0, 0.0),   # AB over 1 frame: impossible
            LatticeArc(1, 2, -1, 7.0, 0.0),  # epsilon
        ],
        node_time=np.array([0, 1, 4]),
        final_scores={2: 0.0},
        lemma_orths=["AB"],
    )
    emis = _planted_emissions(lex, tying, ["a", "a", "b", "b"], 4, M)
    out = rescore_am(lat, emis, lex, tying, topo, TransitionModel())
    assert out.arcs[0].am_score >= BIG / 2
    assert out.arcs[1].am_score == 0.0


def test_rescore_multiword_arc_variant_cross_product():
    """A multi-word arc whose true best combination is OFF-diagonal
    (lemma 1 needs variant 1, lemma 2 needs variant 0): the diagonal
    sweep (variant i of every lemma) misses it, the cross-product
    enumeration (ADVICE r3) must find it."""
    lex = Lexicon()
    build_default_silence(lex)
    lex.add_lemma(["X"], [((["a"]), 0.0), ((["b"]), 0.0)])
    lex.add_lemma(["Y"], [((["a"]), 0.0), ((["b"]), 0.0)])
    topo = HmmTopology(states_per_phone=1, silence_states=1)
    tying = MonophoneStateTying(lex, topo)
    M = tying.num_classes
    T = 2
    lat = Lattice(
        num_nodes=2,
        arcs=[LatticeArc(0, 1, 0, 0.0, 0.0)],
        node_time=np.array([0, T]),
        final_scores={1: 0.0},
        lemma_orths=["X Y"],
    )
    # acoustics: b then a -> X=variant 1 (b), Y=variant 0 (a)
    emis = _planted_emissions(lex, tying, ["b", "a"], T, M)
    out = rescore_am(lat, emis, lex, tying, topo, TransitionModel())
    # diagonal combos (a a / b b) each pay a planted 50; the true
    # combo aligns on zeros (TDP-only)
    assert out.arcs[0].am_score < 50, out.arcs[0].am_score
