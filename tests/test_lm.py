"""LM tests: ARPA round-trip, backoff semantics, device tables vs host LM."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from rasr_tpu.models.lm.arpa import LN10, NgramLm
from rasr_tpu.models.lm.interface import (
    CombineLanguageModel,
    ScaledLanguageModel,
    Zerogram,
)
from rasr_tpu.models.lm.ngram_tpu import compile_ngram, score_batch

ARPA = """\
\\data\\
ngram 1=5
ngram 2=4
ngram 3=1

\\1-grams:
-1.0\t<s>\t-0.30103
-0.9\t</s>
-0.5\ta\t-0.30103
-0.7\tb\t-0.2
-1.2\t<unk>

\\2-grams:
-0.30103\t<s> a\t-0.30103
-0.4\ta b\t-0.1
-0.6\tb a
-0.8\tb </s>

\\3-grams:
-0.2\t<s> a b

\\end\\
"""


@pytest.fixture
def lm(tmp_path):
    p = tmp_path / "toy.arpa"
    p.write_text(ARPA)
    return NgramLm.read_arpa(str(p))


def test_arpa_parse(lm):
    assert lm.order == 3
    assert set(lm.vocab) == {"<s>", "</s>", "a", "b", "<unk>"}
    a, b = lm.vocab["a"], lm.vocab["b"]
    np.testing.assert_allclose(lm.ngrams[(a,)][0], 0.5 * LN10, rtol=1e-6)
    np.testing.assert_allclose(lm.ngrams[(a, b)][1], 0.1 * LN10, rtol=1e-6)


def test_explicit_ngram_score(lm):
    a, b = lm.vocab["a"], lm.vocab["b"]
    s = lm.vocab["<s>"]
    # trigram <s> a b listed
    np.testing.assert_allclose(lm.score((s, a), b), 0.2 * LN10, rtol=1e-6)
    # bigram a b listed
    np.testing.assert_allclose(lm.score((a,), b), 0.4 * LN10, rtol=1e-6)


def test_backoff_score(lm):
    a, b = lm.vocab["a"], lm.vocab["b"]
    # P(a | a): 'a a' unlisted -> backoff(a) * P(a) = 0.30103 + 0.5 (log10)
    np.testing.assert_allclose(lm.score((a,), a), (0.30103 + 0.5) * LN10, rtol=1e-5)
    # P(a | b a): 'b a a' unlisted; context 'b a' exists w/o backoff weight
    # -> backoff('b a')=1 -> score(a | a) path
    np.testing.assert_allclose(lm.score((b, a), a), (0.30103 + 0.5) * LN10, rtol=1e-5)


def test_unknown_word(lm):
    a = lm.vocab["a"]
    # OOV word id -> <unk> unigram with backoff chain
    oov = 999
    expected = lm.score((a,), lm.vocab["<unk>"])
    np.testing.assert_allclose(lm.score((a,), oov), expected, rtol=1e-6)


def test_sequence_and_history(lm):
    a, b = lm.vocab["a"], lm.vocab["b"]
    total = lm.sequence_score(["a", "b"])
    # <s> a (bigram) + <s> a b (trigram) + b </s> (bigram via ext history)
    expect = lm.score(lm.start_history(), a)
    h = lm.extended_history(lm.start_history(), a)
    expect += lm.score(h, b)
    h = lm.extended_history(h, b)
    expect += lm.score(h, lm.vocab["</s>"])
    np.testing.assert_allclose(total, expect, rtol=1e-6)
    assert lm.perplexity(["a", "b"]) > 1.0


def test_arpa_roundtrip(lm, tmp_path):
    out = str(tmp_path / "rt.arpa")
    lm.write_arpa(out)
    lm2 = NgramLm.read_arpa(out)
    a, b = lm2.vocab["a"], lm2.vocab["b"]
    for hist in [(), (a,), (b,), (lm2.vocab["<s>"], a)]:
        for w in [a, b, lm2.vocab["</s>"]]:
            np.testing.assert_allclose(
                lm2.score(hist, w),
                lm.score(tuple(lm.vocab[lm2.inv_vocab[x]] for x in hist), lm.vocab[lm2.inv_vocab[w]]),
                rtol=1e-5,
            )


def test_zerogram_and_wrappers(lm):
    z = Zerogram(lm.vocab)
    assert z.score((), 3) == z.score((), 4)
    s = ScaledLanguageModel(lm, 2.0)
    a = lm.vocab["a"]
    np.testing.assert_allclose(s.score((), a), 2 * lm.score((), a), rtol=1e-6)
    c = CombineLanguageModel([lm, z], [0.5, 0.5])
    h = c.start_history()
    got = c.score(h, a)
    np.testing.assert_allclose(
        got, 0.5 * lm.score(lm.start_history(), a) + 0.5 * z.score((), a), rtol=1e-6
    )


def test_device_tables_match_host(lm):
    """Compiled table lookup == host LM for every (state, word) pair,
    including backoff chains and history advancement."""
    tables = compile_ngram(lm)
    # enumerate all context states by rebuilding the mapping
    contexts = [()] + sorted(g for g in lm.ngrams if len(g) < lm.order)
    words = sorted(w for w in lm.vocab.values())
    states_arr, words_arr, expect = [], [], []
    expect_next = []
    sid = {g: i for i, g in enumerate(contexts)}
    for g in contexts:
        for w in words:
            states_arr.append(sid[g])
            words_arr.append(w)
            expect.append(lm.score(g, w))
            nh = lm.extended_history(g, w)
            expect_next.append(sid[nh])
    costs, nxt = score_batch(
        tables, jnp.asarray(states_arr, jnp.int32), jnp.asarray(words_arr, jnp.int32)
    )
    np.testing.assert_allclose(np.asarray(costs), expect, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(nxt), expect_next)


def test_device_tables_oov(lm):
    tables = compile_ngram(lm)
    costs, nxt = score_batch(
        tables, jnp.asarray([0], jnp.int32), jnp.asarray([12345], jnp.int32)
    )
    expected = lm.score((), 12345)
    np.testing.assert_allclose(np.asarray(costs)[0], expected, rtol=1e-5)


def test_train_from_text_scores_seen_higher():
    sents = [["the", "cat", "sat"], ["the", "cat", "ran"], ["the", "dog", "sat"]] * 3
    lm = NgramLm.train_from_text(sents, order=2)
    cat = lm.vocab["cat"]
    dog = lm.vocab["dog"]
    the = lm.vocab["the"]
    assert lm.score((the,), cat) < lm.score((the,), dog)
    # probabilities over observed successors are sane (<= 1 total mass)
    p = sum(
        math.exp(-lm.score((the,), w))
        for w in [cat, dog]
    )
    assert p <= 1.0 + 1e-6


def test_compiled_trained_lm_consistency():
    sents = [["a", "b", "a"], ["b", "a", "b"], ["a", "b", "b"]] * 2
    lm = NgramLm.train_from_text(sents, order=3)
    tables = compile_ngram(lm)
    contexts = [()] + sorted(g for g in lm.ngrams if len(g) < lm.order)
    sid = {g: i for i, g in enumerate(contexts)}
    rng = np.random.default_rng(0)
    for _ in range(50):
        g = contexts[rng.integers(len(contexts))]
        w = int(rng.choice(list(lm.vocab.values())))
        cost, nxt = score_batch(
            tables, jnp.asarray([sid[g]], jnp.int32), jnp.asarray([w], jnp.int32)
        )
        np.testing.assert_allclose(float(cost[0]), lm.score(g, w), rtol=1e-4, atol=1e-5)
