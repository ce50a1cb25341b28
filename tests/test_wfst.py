"""Generic WFST decoding through the shared token-passing decoder."""

import numpy as np
import pytest

from rasr_tpu.fsa.automaton import Automaton
from rasr_tpu.models.lm.arpa import NgramLm
from rasr_tpu.models.lm.ngram_tpu import compile_ngram
from rasr_tpu.search.decoder import BeamConfig, TreeDecoder
from rasr_tpu.search.wfst import compile_wfst


class _Lemma:
    def __init__(self, orth):
        self.primary_orth = orth
        self.special = None

    def eval_tokens(self):
        return [self.primary_orth]


def _grammar_fsa():
    """Two-word grammar: (GO (LEFT|RIGHT)) with classes:
    GO=cls0, LEFT=cls1, RIGHT=cls2. One emitting arc per word."""
    fsa = Automaton()
    s0, s1, s2 = fsa.add_state(), fsa.add_state(), fsa.add_state()
    fsa.initial = s0
    # ilabel = class+1, olabel = lemma+1
    fsa.add_arc(s0, s1, 1, 1, 0.0)  # GO (cls 0, lemma 0)
    fsa.add_arc(s1, s2, 2, 2, 0.0)  # LEFT (cls 1, lemma 1)
    fsa.add_arc(s1, s2, 3, 3, 0.5)  # RIGHT (cls 2, lemma 2), costlier
    fsa.set_final(s2)
    return fsa


@pytest.fixture
def zerolm():
    # trivial LM tables (no-LM words bypass lookup anyway)
    lm = NgramLm.train_from_text([["x"]], order=1)
    return compile_ngram(lm)


def test_wfst_decode_follows_emissions(zerolm):
    lemmas = [_Lemma("GO"), _Lemma("LEFT"), _Lemma("RIGHT")]
    tree = compile_wfst(_grammar_fsa(), num_classes=3, lemmas=lemmas, loop_cost=0.2)
    dec = TreeDecoder(tree, zerolm, BeamConfig(max_hyps=16, word_end_limit=8))
    # emissions: 3 frames GO, 3 frames LEFT
    T, M = 6, 3
    emis = np.full((1, T, M), 5.0, np.float32)
    emis[0, :3, 0] = 0.0
    emis[0, 3:, 1] = 0.0
    (res,) = dec.decode_scores(emis, np.array([T]))
    assert res.orth == "GO LEFT"
    # now favor RIGHT acoustically enough to beat its 0.5 grammar cost
    emis2 = np.full((1, T, M), 5.0, np.float32)
    emis2[0, :3, 0] = 0.0
    emis2[0, 3:, 2] = 0.0
    (res2,) = dec.decode_scores(emis2, np.array([T]))
    assert res2.orth == "GO RIGHT"


def test_wfst_grammar_cost_breaks_ties(zerolm):
    lemmas = [_Lemma("GO"), _Lemma("LEFT"), _Lemma("RIGHT")]
    tree = compile_wfst(_grammar_fsa(), num_classes=3, lemmas=lemmas, loop_cost=0.2)
    dec = TreeDecoder(tree, zerolm, BeamConfig(max_hyps=16, word_end_limit=8))
    # LEFT and RIGHT acoustically identical -> grammar cost decides
    T, M = 4, 3
    emis = np.full((1, T, M), 5.0, np.float32)
    emis[0, :2, 0] = 0.0
    emis[0, 2:, 1] = 0.0
    emis[0, 2:, 2] = 0.0
    (res,) = dec.decode_scores(emis, np.array([T]))
    assert res.orth == "GO LEFT"  # cheaper grammar arc wins


def test_wfst_rejects_ungrammatical(zerolm):
    """Emissions favoring LEFT first can't produce LEFT-first output."""
    lemmas = [_Lemma("GO"), _Lemma("LEFT"), _Lemma("RIGHT")]
    tree = compile_wfst(_grammar_fsa(), num_classes=3, lemmas=lemmas, loop_cost=0.2)
    dec = TreeDecoder(tree, zerolm, BeamConfig(max_hyps=16, word_end_limit=8))
    T, M = 4, 3
    emis = np.full((1, T, M), 2.0, np.float32)
    emis[0, :2, 1] = 0.0  # LEFT acoustics first...
    emis[0, 2:, 0] = 0.0  # ...then GO
    (res,) = dec.decode_scores(emis, np.array([T]))
    # grammar only allows GO (LEFT|RIGHT)
    assert res.words[0] == "GO" if res.words else True
