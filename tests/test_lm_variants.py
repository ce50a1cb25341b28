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


# ---------------------------------------------------------------- class LM


def _toy_class_lm():
    from rasr_tpu.models.lm.arpa import NgramLm
    from rasr_tpu.models.lm.classlm import ClassLm

    # classes: DIGIT={one,two}, VERB={call}; specials map to themselves
    cls_vocab = {"<s>": 0, "</s>": 1, "<unk>": 2, "DIGIT": 3, "VERB": 4}
    ngrams = {
        (0,): (99.0, 0.1),
        (1,): (1.0, 0.0),
        (2,): (5.0, 0.0),
        (3,): (0.7, 0.2),
        (4,): (1.2, 0.3),
        (4, 3): (0.3, 0.0),  # DIGIT after VERB is likely
    }
    class_lm = NgramLm(2, cls_vocab, ngrams)
    vocab = {"<s>": 0, "</s>": 1, "<unk>": 2, "one": 3, "two": 4, "call": 5}
    w2c = {"one": "DIGIT", "two": "DIGIT", "call": "VERB",
           "<s>": "<s>", "</s>": "</s>", "<unk>": "<unk>"}
    return ClassLm(class_lm, vocab, w2c)


def test_class_lm_scores():
    lm = _toy_class_lm()
    h = lm.start_history()
    one, call = lm.vocab["one"], lm.vocab["call"]
    # membership uniform over 2 digits: -log P = log 2; from the <s>
    # context no bigram is listed -> backoff 0.1 + unigram
    np.testing.assert_allclose(lm.score(h, one), 0.1 + 0.7 + np.log(2), rtol=1e-6)
    np.testing.assert_allclose(lm.score(h, call), 0.1 + 1.2, rtol=1e-6)
    h2 = lm.extended_history(h, call)
    # bigram (VERB, DIGIT) applies
    np.testing.assert_allclose(lm.score(h2, one), 0.3 + np.log(2), rtol=1e-6)
    # sequence_score == manual sum
    manual = lm.score(h, call) + lm.score(h2, one) + lm.sentence_end_score(
        lm.extended_history(h2, one))
    np.testing.assert_allclose(lm.sequence_score(["call", "one"]), manual, rtol=1e-6)


def test_class_lm_device_tables_match_host():
    from rasr_tpu.models.lm.ngram_tpu import score_batch

    lm = _toy_class_lm()
    tables = lm.compile_to_device()
    words = ["one", "two", "call"]
    h = lm.start_history()
    state = tables.start_state
    for tok in words:
        w = lm.vocab[tok]
        host = lm.score(h, w)
        cost, nxt = score_batch(tables, np.array([state], np.int32),
                                np.array([w], np.int32))
        np.testing.assert_allclose(float(cost[0]), host, rtol=1e-5)
        h = lm.extended_history(h, w)
        state = int(nxt[0])


def test_combine_lm_weighted_sum():
    from rasr_tpu.models.lm.classlm import CombineLm
    from rasr_tpu.models.lm.interface import Zerogram

    lm = _toy_class_lm()
    zg = Zerogram(dict(lm.vocab))
    comb = CombineLm([lm, zg], [0.7, 0.3])
    h = comb.start_history()
    one = comb.vocab["one"]
    expect = 0.7 * lm.score(lm.start_history(), one) + 0.3 * zg.score((), one)
    np.testing.assert_allclose(comb.score(h, one), expect, rtol=1e-6)
    h2 = comb.extended_history(h, comb.vocab["call"])
    expect2 = (0.7 * lm.score(lm.extended_history(lm.start_history(), comb.vocab["call"]), one)
               + 0.3 * zg.score((), one))
    np.testing.assert_allclose(comb.score(h2, one), expect2, rtol=1e-6)


def test_rnn_lm_save_load_roundtrip(tmp_path):
    """RnnLm image IO: loaded model scores bit-identically."""
    sents = [["A", "B"], ["B", "A"], ["A", "B"]]
    lm = RnnLm.train_from_text(sents, epochs=5)
    path = str(tmp_path / "rnn_lm")
    lm.save(path)
    lm2 = RnnLm.load(path)
    assert lm2.vocab == lm.vocab
    h = lm.start_history()
    for w in ("A", "B"):
        wid = lm.vocab[w]
        assert lm.score(h, wid) == lm2.score(h, wid)
        h2 = lm.extended_history(h, wid)
        assert lm.sentence_end_score(h2) == lm2.sentence_end_score(h2)
        h = h2


def test_rnn_lm_oov_safe():
    """OOV words must not crash perplexity/rescoring: fixed penalty,
    history unchanged (there is no trained <unk> embedding)."""
    lm = RnnLm.train_from_text([["A", "B"], ["B", "A"]], epochs=3)
    assert lm.word_id("ZZZ") == -1
    h = lm.start_history()
    assert lm.score(h, -1) == 99.0
    assert lm.extended_history(h, -1) == h
    ppl = lm.perplexity(["A", "ZZZ", "B"])
    assert np.isfinite(ppl)
