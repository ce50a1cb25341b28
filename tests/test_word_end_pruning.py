"""Word-end pruning refinements (ref: AdvancedTreeSearch word-end /
lm pruning — SURVEY §2.5 "early word end pruning", word-end beams).

* ``word_end_rank_lm``: the top-R word-end selection ranks by path
  score + a static unigram LM estimate (the reference applies LM before
  word-end pruning). Selection-only: surviving scores are exact (bias
  undone, exact LM applied), so with R covering all candidates the
  decode is IDENTICAL to the unbiased decoder.
* ``word_end_beam``: LM-scored word ends worse than the frame's best by
  more than the beam are dropped. With a huge beam: identical decode.
* at tight R on a confusable task, LM-aware ranking must not lose to
  the LM-blind rank (and the constructed case shows it winning).
"""

import numpy as np
import pytest

from rasr_tpu.corpus.lexicon import Lexicon, build_default_silence
from rasr_tpu.models.hmm import HmmTopology, TransitionModel
from rasr_tpu.models.lm.arpa import NgramLm
from rasr_tpu.models.lm.ngram_tpu import compile_ngram
from rasr_tpu.models.tying import MonophoneStateTying
from rasr_tpu.search.decoder import BeamConfig, TreeDecoder
from rasr_tpu.search.tree import build_prefix_tree


def _system(seed=7, n_words=8, homophones=True):
    rng = np.random.default_rng(seed)
    phones = ["p", "q", "r"]
    lex = Lexicon()
    build_default_silence(lex)
    orths = []
    for i in range(n_words):
        length = int(rng.integers(1, 3))
        pron = [phones[int(rng.integers(len(phones)))] for _ in range(length)]
        orth = f"W{i}_" + "".join(pron).upper()
        lex.add_lemma([orth], [(pron, 0.0)])
        orths.append(orth)
    if homophones:
        # same pronunciation, very different unigram frequency: the
        # LM-blind rank cannot tell these apart at the word end
        lex.add_lemma(["COMMON"], [((["p", "q"]), 0.0)])
        lex.add_lemma(["RARE"], [((["p", "q"]), 0.0)])
        orths += ["COMMON", "RARE"]
    topo = HmmTopology(states_per_phone=2, silence_states=1)
    tying = MonophoneStateTying(lex, topo)
    sents = [["COMMON"]] * 30 + [["RARE"]] + [
        [orths[int(rng.integers(n_words))]] for _ in range(10)
    ]
    lm = NgramLm.train_from_text(sents, order=2)
    tree = build_prefix_tree(
        lex, tying, topo, TransitionModel(), lm_vocab=lm.vocab
    )
    M = tying.num_classes
    T = 8
    emis = rng.uniform(0.0, 6.0, size=(3, T, M)).astype(np.float32)
    nf = np.array([T, T, T - 2], np.int32)
    return tree, compile_ngram(lm), emis, nf


@pytest.mark.parametrize("defer", [False, True])
def test_rank_lm_exact_when_r_covers_all(defer):
    tree, tables, emis, nf = _system()
    base = BeamConfig(
        max_hyps=256, word_end_limit=256, root_hyps=64, lm_scale=1.0,
        deferred_emission=defer,
    )
    plain = TreeDecoder(tree, tables, base)
    ranked = TreeDecoder(
        tree, tables, BeamConfig(**{**base.__dict__, "word_end_rank_lm": True})
    )
    for a, b in zip(plain.decode_scores(emis, nf),
                    ranked.decode_scores(emis, nf)):
        assert a.words == b.words
        np.testing.assert_allclose(a.score, b.score, rtol=1e-5, atol=1e-4)


def test_word_end_beam_wide_is_identity():
    tree, tables, emis, nf = _system()
    base = BeamConfig(max_hyps=64, word_end_limit=8, root_hyps=8, lm_scale=1.0)
    plain = TreeDecoder(tree, tables, base)
    beamed = TreeDecoder(
        tree, tables, BeamConfig(**{**base.__dict__, "word_end_beam": 1e7})
    )
    for a, b in zip(plain.decode_scores(emis, nf),
                    beamed.decode_scores(emis, nf)):
        assert a.words == b.words
        np.testing.assert_allclose(a.score, b.score, rtol=1e-5, atol=1e-4)


def test_word_end_beam_tight_decode_valid():
    tree, tables, emis, nf = _system()
    dec = TreeDecoder(
        tree, tables,
        BeamConfig(max_hyps=64, word_end_limit=8, root_hyps=8,
                   lm_scale=1.0, word_end_beam=2.0),
    )
    res = dec.decode_scores(emis, nf)
    assert all(r.score < 1e29 for r in res)


def test_rank_lm_keeps_frequent_homophone_at_tight_r():
    """R=1 homophone decision: COMMON and RARE share the pronunciation
    "p q", RARE has a slightly better pronunciation score, but COMMON is
    30x more frequent in the LM. The LM-blind top-1 commits to RARE (its
    pre-LM rank is better) and cannot recover; the LM-aware rank keeps
    COMMON — the globally better path. Acoustics are planted on the
    shared pronunciation so the word identity is purely a rank decision."""
    from rasr_tpu.models.allophone import Allophone, AllophoneState

    lex = Lexicon()
    build_default_silence(lex)
    lex.add_lemma(["COMMON"], [((["p", "q"]), 0.0)])
    lex.add_lemma(["RARE"], [((["p", "q"]), -0.5)])
    lex.add_lemma(["OTHER"], [((["r"]), 0.0)])
    topo = HmmTopology(states_per_phone=2, silence_states=1)
    tying = MonophoneStateTying(lex, topo)
    lm = NgramLm.train_from_text(
        [["COMMON"]] * 30 + [["RARE"]] + [["OTHER"]] * 5, order=2
    )
    tree = build_prefix_tree(
        lex, tying, topo, TransitionModel(), lm_vocab=lm.vocab
    )
    tables = compile_ngram(lm)
    M = tying.num_classes

    def cls(sym, st):
        return tying.classify(
            AllophoneState(Allophone(lex.phonemes[sym].id), st)
        )

    seq = [cls("p", 0), cls("p", 1), cls("q", 0), cls("q", 1)]
    emis = np.full((1, len(seq), M), 30.0, np.float32)
    for t, c in enumerate(seq):
        emis[0, t, c] = 0.0
    nf = np.array([len(seq)], np.int32)
    tight = dict(max_hyps=64, word_end_limit=1, root_hyps=8, lm_scale=3.0)
    plain = TreeDecoder(tree, tables, BeamConfig(**tight))
    ranked = TreeDecoder(
        tree, tables, BeamConfig(**tight, word_end_rank_lm=True)
    )
    (rp,) = plain.decode_scores(emis, nf)
    (rr,) = ranked.decode_scores(emis, nf)
    assert rr.words == ["COMMON"], (rr.words, rp.words)
    assert rp.words == ["RARE"], rp.words  # the blind rank's commitment
    assert rr.score < rp.score  # LM-aware selection found the better path
