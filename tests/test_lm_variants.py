"""FSA grammar LM + RNN LM tests."""

import numpy as np
import pytest

from rasr_tpu.models.lm.grammar import FsaGrammarLm
from rasr_tpu.models.lm.rnn import RnnLm


def test_grammar_lm_accepts_and_rejects():
    lm = FsaGrammarLm.from_sequences(
        [["call", "home"], ["call", "work"], ["hang", "up"]], costs=[0.0, 1.0, 0.5]
    )
    h = lm.start_history()
    call = lm.vocab["call"]
    home = lm.vocab["home"]
    up = lm.vocab["up"]
    assert lm.score(h, call) == 0.0
    h2 = lm.extended_history(h, call)
    assert lm.score(h2, home) == 0.0
    assert lm.score(h2, up) >= 1e8  # not allowed after "call"
    h3 = lm.extended_history(h2, home)
    assert lm.sentence_end_score(h3) == 0.0
    assert lm.sentence_end_score(h2) >= 1e8  # mid-grammar is not final


def test_grammar_lm_costs():
    lm = FsaGrammarLm.from_sequences([["a"], ["b"]], costs=[0.25, 2.0])
    h = lm.start_history()
    np.testing.assert_allclose(lm.score(h, lm.vocab["a"]), 0.25)
    np.testing.assert_allclose(lm.score(h, lm.vocab["b"]), 2.0)


def test_grammar_lm_sequence_api():
    lm = FsaGrammarLm.from_sequences([["x", "y"]])
    np.testing.assert_allclose(lm.sequence_score(["x", "y"]), 0.0)
    assert lm.sequence_score(["y", "x"]) >= 1e8


def test_rnn_lm_learns_pattern():
    """After 'a' always comes 'b' in training -> P(b|a) >> P(a|a)."""
    sents = [["a", "b", "a", "b"], ["a", "b"], ["b", "a", "b"]] * 4
    lm = RnnLm.train_from_text(sents, epochs=60, learning_rate=0.05)
    h = lm.extended_history(lm.start_history(), lm.vocab["a"])
    sb = lm.score(h, lm.vocab["b"])
    sa = lm.score(h, lm.vocab["a"])
    assert sb < sa  # b far more likely after a


def test_rnn_lm_state_cache_consistency():
    sents = [["a", "b"], ["b", "a"]] * 3
    lm = RnnLm.train_from_text(sents, epochs=10)
    h = lm.start_history()
    a = lm.vocab["a"]
    b = lm.vocab["b"]
    s1 = lm.score(h, a)
    s2 = lm.score(h, a)  # cached path
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
    h2 = lm.extended_history(h, a)
    s3 = lm.score(h2, b)
    lm._cache.clear()
    s4 = lm.score(h2, b)  # recomputed from scratch
    np.testing.assert_allclose(s3, s4, rtol=1e-5)


def test_rnn_lm_in_lattice_rescoring():
    """RnnLm plugs into the generic lattice rescoring seam."""
    from rasr_tpu.lattice.flf import best_path, rescore_lm
    from rasr_tpu.lattice.lattice import Lattice, LatticeArc

    sents = [["A", "C"], ["A", "C"], ["B", "C"]] * 4
    lm = RnnLm.train_from_text(sents, epochs=40)
    arcs = [
        LatticeArc(0, 1, 0, 1.0, 0.0),  # A
        LatticeArc(0, 1, 1, 1.0, 0.0),  # B (same acoustics)
        LatticeArc(1, 2, 2, 0.5, 0.0),  # C
    ]
    lat = Lattice(3, arcs, np.array([0, 5, 10], np.int32), {2: 0.0}, ["A", "B", "C"])
    res = rescore_lm(lat, lm, {0: lm.vocab["A"], 1: lm.vocab["B"], 2: lm.vocab["C"]})
    score, path = best_path(res)
    assert [res.lemma_orths[a.lemma] for a in path] == ["A", "C"]  # LM prefers A
