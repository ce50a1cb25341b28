"""Alignment graph construction + forced alignment end-to-end on toy data."""

import numpy as np
import pytest

import jax.numpy as jnp

from rasr_tpu.align.aligner import Alignment, BatchAligner
from rasr_tpu.align.graph import OrthographyError, build_linear_graph, orth_to_lemmas
from rasr_tpu.corpus.lexicon import Lexicon, build_default_silence
from rasr_tpu.models.allophone import FLAG_FINAL, FLAG_INITIAL, AllophoneAlphabet
from rasr_tpu.models.gmm import MixtureSet
from rasr_tpu.models.hmm import HmmTopology, Tdp, TransitionModel
from rasr_tpu.models.scorer import GmmFeatureScorer, PrecomputedScorer
from rasr_tpu.models.tying import MonophoneStateTying
from rasr_tpu.ops.viterbi import BIG


@pytest.fixture
def lex():
    lex = Lexicon()
    build_default_silence(lex)
    lex.add_lemma(["AB"], [(["a", "b"], 0.0)])
    lex.add_lemma(["BA"], [(["b", "a"], 0.0)])
    return lex


@pytest.fixture
def topo():
    return HmmTopology(states_per_phone=2, silence_states=1)


@pytest.fixture
def tying(lex, topo):
    return MonophoneStateTying(lex, topo)


def test_monophone_tying(lex, topo, tying):
    # si (ci, 1 state) + a (2) + b (2) -> 5 classes
    assert tying.num_classes == 5
    alphabet = AllophoneAlphabet(lex, max_states=2)
    states = alphabet.phone_sequence_states([lex.phonemes["a"].id, lex.phonemes["b"].id], topo)
    assert len(states) == 4
    ids = [tying.classify(s) for s in states]
    assert len(set(ids)) == 4
    # boundary flags
    assert states[0].allophone.boundary & FLAG_INITIAL
    assert states[-1].allophone.boundary & FLAG_FINAL
    # triphone context recorded
    assert states[0].allophone.right == lex.phonemes["b"].id


def test_allophone_pack_unpack(lex):
    alphabet = AllophoneAlphabet(lex, max_states=3)
    from rasr_tpu.models.allophone import Allophone, AllophoneState

    st = AllophoneState(Allophone(2, 1, 3, FLAG_INITIAL), 1)
    idx = alphabet.index(st)
    assert alphabet.unpack(idx) == st


def test_orth_lookup(lex):
    lemmas = orth_to_lemmas("AB BA AB", lex)
    assert [l.primary_orth for l in lemmas] == ["AB", "BA", "AB"]
    with pytest.raises(OrthographyError):
        orth_to_lemmas("NOPE", lex)


def test_graph_structure(lex, topo, tying):
    g = build_linear_graph("AB", lex, tying, topo)
    # sil + a0 a1 b0 b1 + sil = 6 states
    assert g.num_states == 6
    assert g.lemma_of_state.tolist() == [-1, 0, 0, 0, 0, -1]
    # start at silence or first word state
    assert g.init[0] == 0.0 and g.init[1] == 0.0
    assert np.all(g.init[2:] >= BIG / 2)
    # end at final silence or last word state
    assert g.final[5] < BIG / 2 and g.final[4] < BIG / 2
    # skip over optional silence is enabled only into first word state after sil
    assert g.skip[1] >= BIG / 2  # nothing before initial silence


def test_forced_alignment_recovers_planted_path(lex, topo, tying, rng):
    """Features drawn at mixture means -> alignment must follow the script."""
    M = tying.num_classes
    D = 4
    means = rng.normal(size=(M, D)).astype(np.float32) * 3
    ms = MixtureSet.single_density(means, np.ones((M, D), np.float32) * 0.1)
    scorer = GmmFeatureScorer(ms)

    g = build_linear_graph("AB", lex, tying, topo)
    # planted: 2 frames silence, 3 frames a0, 2 a1, 2 b0, 3 b1, 2 sil = 14
    plan_states = [0] * 2 + [1] * 3 + [2] * 2 + [3] * 2 + [4] * 3 + [5] * 2
    T = len(plan_states)
    feats = np.stack([means[g.emission_ids[s]] for s in plan_states])[None]
    aligner = BatchAligner(scorer)
    (al,) = aligner.align(jnp.asarray(feats), [g], np.array([T]), ["seg1"])
    assert al.num_frames == T
    assert al.state_indices.tolist() == plan_states
    assert np.all(al.emission_ids == np.array([g.emission_ids[s] for s in plan_states]))


def test_alignment_skips_optional_silence(lex, topo, tying, rng):
    """Audio with no silence between words -> silence states skipped."""
    M = tying.num_classes
    D = 4
    means = rng.normal(size=(M, D)).astype(np.float32) * 3
    ms = MixtureSet.single_density(means, np.ones((M, D), np.float32) * 0.1)
    scorer = GmmFeatureScorer(ms)
    g = build_linear_graph("AB BA", lex, tying, topo)
    # no silence anywhere: a0 a1 b0 b1 | b0 b1 a0 a1, 2 frames each
    word_states = [1, 2, 3, 4, 6, 7, 8, 9]
    assert g.lemma_of_state.tolist() == [-1, 0, 0, 0, 0, -1, 1, 1, 1, 1, -1]
    plan = [s for s in word_states for _ in range(2)]
    feats = np.stack([means[g.emission_ids[s]] for s in plan])[None]
    aligner = BatchAligner(scorer)
    (al,) = aligner.align(jnp.asarray(feats), [g], np.array([len(plan)]))
    assert al.state_indices.tolist() == plan  # silence states never visited


def test_batch_alignment_ragged(lex, topo, tying, rng):
    M, D = tying.num_classes, 4
    means = rng.normal(size=(M, D)).astype(np.float32) * 3
    ms = MixtureSet.single_density(means, np.ones((M, D), np.float32) * 0.1)
    scorer = GmmFeatureScorer(ms)
    g1 = build_linear_graph("AB", lex, tying, topo)
    g2 = build_linear_graph("BA AB", lex, tying, topo)
    plan1 = [1, 1, 2, 3, 4]
    plan2 = [1, 2, 3, 4, 5, 6, 7, 8, 9]
    T = max(len(plan1), len(plan2))
    feats = np.zeros((2, T, D), np.float32)
    for t, s in enumerate(plan1):
        feats[0, t] = means[g1.emission_ids[s]]
    for t, s in enumerate(plan2):
        feats[1, t] = means[g2.emission_ids[s]]
    aligner = BatchAligner(scorer)
    als = aligner.align(jnp.asarray(feats), [g1, g2], np.array([len(plan1), len(plan2)]))
    assert als[0].state_indices.tolist() == plan1
    assert als[1].state_indices.tolist() == plan2


def test_baum_welch_mode(lex, topo, tying, rng):
    M, D = tying.num_classes, 4
    means = rng.normal(size=(M, D)).astype(np.float32) * 3
    ms = MixtureSet.single_density(means, np.ones((M, D), np.float32) * 0.1)
    scorer = GmmFeatureScorer(ms)
    g = build_linear_graph("AB", lex, tying, topo)
    plan = [0, 1, 1, 2, 3, 4, 5]
    feats = np.stack([means[g.emission_ids[s]] for s in plan])[None]
    aligner = BatchAligner(scorer, mode="baum-welch")
    (al,) = aligner.align(jnp.asarray(feats), [g], np.array([len(plan)]))
    # sharp emissions -> posteriors concentrate on the planted path
    assert al.state_indices.tolist() == plan
    assert np.all(al.weights > 0.9)


def test_alignment_pack_roundtrip(rng):
    al = Alignment(
        "seg", np.arange(5, dtype=np.int32), np.arange(5, dtype=np.int32) * 2,
        score=1.5, weights=np.ones(5, np.float32),
    )
    al2 = Alignment.unpack("seg", al.pack(), 1.5)
    np.testing.assert_array_equal(al.emission_ids, al2.emission_ids)
    np.testing.assert_array_equal(al.state_indices, al2.state_indices)
