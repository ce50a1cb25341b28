"""Decoder tests: tree compilation + beam search vs exhaustive oracle.

The key property (SURVEY §4/§7): with pruning off (huge beam, K larger
than the number of distinct (tree_state, lm_state) pairs), the decoder
must be EXACT — its best score equals a brute-force minimum over all word
sequences, each scored by forced alignment + LM.
"""

import dataclasses
import itertools
import math

import numpy as np
import pytest

import jax.numpy as jnp

from rasr_tpu.align.graph import build_linear_graph
from rasr_tpu.corpus.lexicon import Lexicon, build_default_silence
from rasr_tpu.models.hmm import HmmTopology, Tdp, TransitionModel
from rasr_tpu.models.lm.arpa import NgramLm
from rasr_tpu.models.lm.ngram_tpu import compile_ngram
from rasr_tpu.models.tying import MonophoneStateTying
from rasr_tpu.ops.viterbi import BIG, viterbi_align
from rasr_tpu.search.decoder import BeamConfig, TreeDecoder
from rasr_tpu.search.tree import WORD_SILENCE, build_prefix_tree


@pytest.fixture(scope="module")
def setup():
    lex = Lexicon()
    build_default_silence(lex)
    lex.add_lemma(["AB"], [(["a", "b"], 0.0)])
    lex.add_lemma(["BA"], [(["b", "a"], 0.0)])
    lex.add_lemma(["AA"], [(["a", "a"], 0.0)])
    topo = HmmTopology(states_per_phone=1, silence_states=1)
    tying = MonophoneStateTying(lex, topo)
    trans = TransitionModel(
        speech=Tdp(loop=1.0, forward=0.0, skip=math.inf, exit=0.5),
        silence=Tdp(loop=0.2, forward=0.5, skip=math.inf, exit=0.3),
    )
    lm = NgramLm.train_from_text(
        [["AB", "BA"], ["AB", "AA"], ["BA", "AB"], ["AB", "BA"]], order=2
    )
    tables = compile_ngram(lm)
    tree = build_prefix_tree(lex, tying, topo, trans, lm_vocab=lm.vocab)
    return lex, topo, tying, trans, lm, tables, tree


def test_tree_structure(setup):
    lex, topo, tying, trans, lm, tables, tree = setup
    st = tree.stats()
    # root + silence(1) + shared 'a'(1) + 'b' after a + 'a' after a +
    # 'b'(1) + 'a' after b = 7 states (AB,AA share first arc)
    assert st["states"] == 7
    assert st["word_end_states"] == 4  # sil, ab, aa, ba ends
    # root out-degree: silence + a-first + b-first = 3
    root_deg = tree.arc_ptr[1] - tree.arc_ptr[0]
    assert root_deg == 3
    # silence word end flagged as no-LM
    sil_states = [s for s in range(tree.num_states) if WORD_SILENCE in tree.we_word[s]]
    assert len(sil_states) == 1


def _plant_emissions(tree, seq_states, M, sharp=50.0):
    """Emission matrix making `seq_states` (tree states) nearly free."""
    T = len(seq_states)
    emis = np.full((T, M), sharp, np.float32)
    for t, s in enumerate(seq_states):
        emis[t, tree.emission_class[s]] = 0.0
    return emis


def test_decode_planted_sequence(setup):
    lex, topo, tying, trans, lm, tables, tree = setup
    # hand path: sil sil a a b b  -> [SILENCE] AB
    # find tree states: silence arc state, a-first, b-after-a
    # root arcs: inspect destinations
    root_arcs = tree.arc_dst[tree.arc_ptr[0]:tree.arc_ptr[1]]
    by_class = {tree.emission_class[s]: s for s in root_arcs}
    sil_cls = tying.classify_like = None
    # identify states by emission class via tying on known phones
    from rasr_tpu.models.allophone import Allophone, AllophoneState
    cls_si = tying.classify(AllophoneState(Allophone(lex.phonemes["si"].id), 0))
    s_sil = by_class[cls_si]
    # 'a' first states: class of a with right context b differs? monophone
    # tying ignores context -> class of 'a'
    cls_a = tying.classify(AllophoneState(Allophone(lex.phonemes["a"].id), 0))
    cls_b = tying.classify(AllophoneState(Allophone(lex.phonemes["b"].id), 0))
    s_a = by_class[cls_a]
    # b after a: follow arc from s_a
    succ = tree.arc_dst[tree.arc_ptr[s_a]:tree.arc_ptr[s_a + 1]]
    s_b = [s for s in succ if tree.emission_class[s] == cls_b][0]
    seq = [s_sil, s_sil, s_a, s_a, s_b, s_b]
    M = tying.num_classes
    emis = _plant_emissions(tree, seq, M)[None]
    dec = TreeDecoder(tree, tables, BeamConfig(max_hyps=64, word_end_limit=16, lm_scale=0.5))
    (res,) = dec.decode_scores(emis, np.array([len(seq)]))
    assert res.orth == "AB"
    assert [l.primary_orth for l in res.lemmas] == ["[SILENCE]", "AB"]
    assert res.word_ends == [1, 5]


def _oracle_best(lex, topo, tying, trans, lm, emissions, T, lm_scale, max_words=4):
    """Brute force: min over word sequences (with explicit optional
    silences) of forced-alignment cost + scaled LM cost + </s>."""
    words = ["AB", "BA", "AA"]
    eos = lm.vocab["</s>"]
    best = (np.inf, None)
    items = words + ["[SILENCE]"]

    def lm_cost_of(seq):
        h = lm.start_history()
        c = 0.0
        for w in seq:
            if w == "[SILENCE]":
                continue
            wid = lm.vocab[w]
            c += lm_scale * lm.score(h, wid)
            h = lm.extended_history(h, wid)
        return c + lm_scale * lm.score(h, eos)

    # sequences of up to max_words tokens (incl. silence tokens)
    for n in range(1, max_words + 1):
        for seq in itertools.product(items, repeat=n):
            # at least one real word; silence may appear anywhere
            g = build_linear_graph(
                " ".join(seq), lex, tying, topo, trans, optional_silence=False
            )
            if g.num_states > T:
                continue
            e = emissions[:, :, g.emission_ids]  # [1,T,S]
            cost, _ = viterbi_align(
                jnp.asarray(e), jnp.asarray(g.loop[None]), jnp.asarray(g.fwd[None]),
                jnp.asarray(g.skip[None]), jnp.asarray(g.init[None]),
                jnp.asarray(g.final[None]), jnp.asarray([T]),
            )
            total = float(np.asarray(cost)[0]) + lm_cost_of(seq)
            if total < best[0]:
                best = (total, seq)
    return best


def test_decoder_exact_vs_oracle(setup, rng):
    """Pruning off -> decoder score == exhaustive minimum. Random emissions
    make this a strong structural test."""
    lex, topo, tying, trans, lm, tables, tree = setup
    M = tying.num_classes
    T = 7
    lm_scale = 0.7
    for trial in range(3):
        emis = rng.uniform(0.0, 6.0, size=(1, T, M)).astype(np.float32)
        dec = TreeDecoder(
            tree, tables,
            BeamConfig(max_hyps=256, beam=1e9, word_end_limit=64,
                       root_hyps=256, lm_scale=lm_scale),
        )
        (res,) = dec.decode_scores(emis, np.array([T]))
        oracle_score, oracle_seq = _oracle_best(
            lex, topo, tying, trans, lm, emis, T, lm_scale
        )
        assert oracle_seq is not None
        np.testing.assert_allclose(res.score, oracle_score, rtol=1e-4, atol=1e-3), (
            trial, oracle_seq,
        )
        got = [l.primary_orth for l in res.lemmas]
        assert got == list(oracle_seq), (got, oracle_seq, trial)


def test_decoder_batched_ragged(setup, rng):
    lex, topo, tying, trans, lm, tables, tree = setup
    M = tying.num_classes
    T = 8
    emis = rng.uniform(0.0, 6.0, size=(3, T, M)).astype(np.float32)
    n = np.array([5, 8, 6])
    dec = TreeDecoder(tree, tables, BeamConfig(max_hyps=256, word_end_limit=64, lm_scale=0.7))
    batch = dec.decode_scores(emis, n)
    for b in range(3):
        (single,) = dec.decode_scores(emis[b : b + 1, : n[b]], n[b : b + 1])
        np.testing.assert_allclose(batch[b].score, single.score, rtol=1e-4)
        assert [l.primary_orth for l in batch[b].lemmas] == [
            l.primary_orth for l in single.lemmas
        ]


def test_split_device_api_matches_decode_scores(setup, rng):
    """decode_scores_device + results_from_device == decode_scores, with
    device-resident inputs and under the bench's depth-2 pipelined
    dispatch (the async-dispatch path that harvests the host gap)."""
    import jax

    lex, topo, tying, trans, lm, tables, tree = setup
    M = tying.num_classes
    T = 8
    emis = rng.uniform(0.0, 6.0, size=(3, T, M)).astype(np.float32)
    n = np.array([5, 8, 6])
    dec = TreeDecoder(tree, tables, BeamConfig(max_hyps=256, word_end_limit=64, lm_scale=0.7))
    ref = dec.decode_scores(emis, n)
    emis_d, n_d = jax.device_put(jnp.asarray(emis)), jax.device_put(jnp.asarray(n))
    prev, outs = None, []
    for _ in range(3):
        b = dec.decode_scores_device(emis_d, n_d)
        if prev is not None:
            outs.append(dec.results_from_device(prev))
        prev = b
    outs.append(dec.results_from_device(prev))
    for got in outs:
        assert [r.words for r in got] == [r.words for r in ref]
        for a, b in zip(got, ref):
            np.testing.assert_allclose(a.score, b.score, rtol=1e-5)


def test_lookahead_shaping_is_exact(setup, rng):
    """Unigram lookahead (potential shaping) must not change results when
    pruning is off — same best scores and words as without lookahead."""
    lex, topo, tying, trans, lm, tables, tree = setup
    unigrams = {
        wid: lm.score((), wid) for wid in lm.vocab.values()
    }
    from rasr_tpu.search.tree import build_prefix_tree

    tree_la = build_prefix_tree(
        lex, tying, topo, trans, lm_vocab=lm.vocab, lm_unigrams=unigrams
    )
    assert tree_la.lookahead is not None and np.any(tree_la.lookahead != 0)
    M = tying.num_classes
    cfg = BeamConfig(max_hyps=256, beam=1e9, word_end_limit=64,
                     root_hyps=256, lm_scale=0.7)
    dec_plain = TreeDecoder(tree, tables, cfg)
    dec_la = TreeDecoder(tree_la, tables, cfg)
    for _ in range(3):
        emis = rng.uniform(0.0, 6.0, size=(1, 7, M)).astype(np.float32)
        (a,) = dec_plain.decode_scores(emis, np.array([7]))
        (b,) = dec_la.decode_scores(emis, np.array([7]))
        np.testing.assert_allclose(a.score, b.score, rtol=1e-4, atol=1e-3)
        assert [l.primary_orth for l in a.lemmas] == [l.primary_orth for l in b.lemmas]


def test_beam_pruning_monotone(setup, rng):
    """Tighter pruning can only increase (or keep) the best cost."""
    lex, topo, tying, trans, lm, tables, tree = setup
    M = tying.num_classes
    emis = rng.uniform(0.0, 6.0, size=(1, 10, M)).astype(np.float32)
    scores = []
    for k in (4, 32, 256):
        dec = TreeDecoder(tree, tables, BeamConfig(max_hyps=k, word_end_limit=16, lm_scale=0.7))
        (res,) = dec.decode_scores(emis, np.array([10]))
        scores.append(res.score)
    assert scores[0] >= scores[1] >= scores[2]


def test_expansion_limit_matches_exact_when_generous(setup, rng):
    """With E larger than the number of finite candidates, the
    pre-emission expansion pruning path must reproduce the exact path
    bit-for-bit (same best sentence and score)."""
    lex, topo, tying, trans, lm, tables, tree = setup
    M = tying.num_classes
    T = 7
    for trial in range(2):
        emis = rng.uniform(0.0, 6.0, size=(1, T, M)).astype(np.float32)
        base = BeamConfig(max_hyps=64, beam=1e9, word_end_limit=64,
                          root_hyps=64, lm_scale=0.7)
        dec = TreeDecoder(tree, tables, base)
        (exact,) = dec.decode_scores(emis, np.array([T]))
        dec_e = TreeDecoder(
            tree, tables, dataclasses.replace(base, expansion_limit=128)
        )
        (approx,) = dec_e.decode_scores(emis, np.array([T]))
        assert approx.words == exact.words
        np.testing.assert_allclose(approx.score, exact.score, rtol=1e-6)


def test_partitioned_beam_matches_single_device(setup, rng):
    """Beam partitioned over the 'model' axis (per-frame all_gather
    merge) == single-device decode, exact settings."""
    from rasr_tpu.parallel.mesh import make_mesh

    lex, topo, tying, trans, lm, tables, tree = setup
    M = tying.num_classes
    B, T = 2, 12
    emis = rng.uniform(0.0, 8.0, size=(B, T, M)).astype(np.float32)
    n = np.array([T, T - 3], np.int32)
    # limits set to full coverage (root/branch caps >= K): the exactness
    # precondition for partitioned == single-device (see decode_scores)
    cfg = BeamConfig(
        max_hyps=64, word_end_limit=16, root_hyps=64, branch_hyps=64,
        lm_scale=0.7,
    )
    dec = TreeDecoder(tree, tables, cfg)
    ref = dec.decode_scores(emis, n)

    mesh = make_mesh(data=2, model=4)
    got = dec.decode_scores(emis, n, mesh=mesh, beam_axis="model")
    for r, g in zip(ref, got):
        assert r.words == g.words
        assert r.word_ends == g.word_ends
        np.testing.assert_allclose(r.score, g.score, rtol=1e-5)


def test_streaming_feed_matches_offline(setup, rng):
    """Block-feed online decode == offline whole-utterance decode."""
    from rasr_tpu.search.streaming import StreamingDecoder

    lex, topo, tying, trans, lm, tables, tree = setup
    M = tying.num_classes
    B, T = 2, 14
    emis = rng.uniform(0.0, 8.0, size=(B, T, M)).astype(np.float32)
    n = np.array([T, T - 4], np.int32)
    dec = TreeDecoder(
        tree, tables, BeamConfig(max_hyps=64, word_end_limit=16, lm_scale=0.7)
    )
    ref = dec.decode_scores(emis, n)

    sd = StreamingDecoder(dec).restart(B, n_frames=n)
    for lo, hi in ((0, 5), (5, 9), (9, 14)):
        sd.feed(emis[:, lo:hi])
    got = sd.finalize()
    for r, g in zip(ref, got):
        assert r.words == g.words
        assert r.word_ends == g.word_ends
        np.testing.assert_allclose(r.score, g.score, rtol=1e-6)


def test_streaming_current_best_progresses(setup, rng):
    """current_best() mid-stream returns partial hypotheses and does not
    disturb the final result."""
    from rasr_tpu.search.streaming import StreamingDecoder

    lex, topo, tying, trans, lm, tables, tree = setup
    M = tying.num_classes
    T = 12
    emis = rng.uniform(0.0, 8.0, size=(1, T, M)).astype(np.float32)
    dec = TreeDecoder(
        tree, tables, BeamConfig(max_hyps=64, word_end_limit=16, lm_scale=0.7)
    )
    sd = StreamingDecoder(dec).restart(1)  # length not declared up front
    sd.feed(emis[:, :6])
    mid = sd.current_best()
    assert np.isfinite(mid[0].score)
    sd.feed(emis[:, 6:])
    fin = sd.finalize()
    # undeclared length: finalized at the frontier == offline with n=T
    ref = dec.decode_scores(emis, np.array([T], np.int32))
    assert fin[0].words == ref[0].words
    np.testing.assert_allclose(fin[0].score, ref[0].score, rtol=1e-6)


def test_decoder_with_4gram_lm(setup, rng):
    """Config #4 shape: decode against a 4-gram backing-off LM — the
    compiled automaton handles higher orders with the same gather
    lookup; spot-check the decode score against a host-side rescore of
    the winning sequence."""
    lex, topo, tying, trans, lm, _, tree = setup
    # MUST reuse the tree's word-id assignment (tree word-end arcs carry
    # the fixture vocab's ids)
    vocab = dict(lm.vocab)
    bos, eos = vocab["<s>"], vocab["</s>"]
    ab, ba, aa = vocab["AB"], vocab["BA"], vocab["AA"]
    ngrams = {
        (bos,): (99.0, 0.2), (eos,): (1.2, 0.0),
        (ab,): (1.0, 0.3), (ba,): (1.3, 0.3), (aa,): (1.6, 0.3),
        (ab, ba): (0.6, 0.2), (ba, ab): (0.7, 0.2), (bos, ab): (0.5, 0.2),
        (ab, ba, ab): (0.4, 0.1), (bos, ab, ba): (0.3, 0.1),
        (ab, ba, ab, ba): (0.2, 0.0), (bos, ab, ba, ab): (0.15, 0.0),
    }
    if "<unk>" in vocab:
        ngrams[(vocab["<unk>"],)] = (9.0, 0.0)
    lm4 = NgramLm(4, vocab, ngrams)
    tables4 = compile_ngram(lm4)
    assert tables4.order == 4
    T = 7
    lm_scale = 0.8
    emis = rng.uniform(0.0, 6.0, size=(1, T, tying.num_classes)).astype(np.float32)
    dec = TreeDecoder(
        tree, tables4,
        BeamConfig(max_hyps=256, beam=1e9, word_end_limit=64,
                   root_hyps=256, lm_scale=lm_scale),
    )
    (res,) = dec.decode_scores(emis, np.array([T]))
    # pruning off -> exact minimum over word sequences under the 4-gram
    oracle_score, _ = _oracle_best(lex, topo, tying, trans, lm4, emis, T, lm_scale)
    np.testing.assert_allclose(res.score, oracle_score, rtol=1e-5)


def test_decoder_root_select_exact(setup, rng):
    """root_select (pre-emission word-start selection outside the main
    recombination sorts) stays exact vs the oracle when R3 covers the
    fan-out and pruning is off: root arrivals skip one frame of
    loop-recombination (bounded beam waste) but never lose the best
    path, and first-phone word ends still fire on the entry frame."""
    lex, topo, tying, trans, lm, tables, tree = setup
    M = tying.num_classes
    T = 7
    lm_scale = 0.7
    for trial in range(3):
        emis = rng.uniform(0.0, 6.0, size=(1, T, M)).astype(np.float32)
        dec = TreeDecoder(
            tree, tables,
            BeamConfig(max_hyps=256, beam=1e9, word_end_limit=64,
                       root_hyps=256, lm_scale=lm_scale, root_select=4096),
        )
        (res,) = dec.decode_scores(emis, np.array([T]))
        oracle_score, oracle_seq = _oracle_best(
            lex, topo, tying, trans, lm, emis, T, lm_scale
        )
        np.testing.assert_allclose(res.score, oracle_score, rtol=1e-4, atol=1e-3)
        got = [l.primary_orth for l in res.lemmas]
        assert got == list(oracle_seq), (got, oracle_seq, trial)


def test_decoder_root_select_matches_default(setup, rng):
    """A generous root_select reproduces the default decoder's results
    on batched ragged input (scores and word sequences)."""
    lex, topo, tying, trans, lm, tables, tree = setup
    M = tying.num_classes
    T = 8
    emis = rng.uniform(0.0, 6.0, size=(3, T, M)).astype(np.float32)
    n = np.array([5, 8, 6])
    base = TreeDecoder(
        tree, tables, BeamConfig(max_hyps=256, word_end_limit=64, lm_scale=0.7)
    )
    fast = TreeDecoder(
        tree, tables,
        BeamConfig(max_hyps=256, word_end_limit=64, lm_scale=0.7, root_select=64),
    )
    for a, b in zip(base.decode_scores(emis, n), fast.decode_scores(emis, n)):
        np.testing.assert_allclose(a.score, b.score, rtol=1e-4)
        assert [l.primary_orth for l in a.lemmas] == [
            l.primary_orth for l in b.lemmas
        ]


def test_decoder_deferred_emission_exact(setup, rng):
    """deferred_emission (+ root_select) stays exact vs the oracle when
    pruning is off: emission is a function of the recombination key, so
    adding it after dedup + top-K changes nothing once every candidate
    survives the histogram."""
    lex, topo, tying, trans, lm, tables, tree = setup
    M = tying.num_classes
    T = 7
    lm_scale = 0.7
    for rsel in (0, 4096):
        emis = rng.uniform(0.0, 6.0, size=(1, T, M)).astype(np.float32)
        dec = TreeDecoder(
            tree, tables,
            BeamConfig(max_hyps=256, beam=1e9, word_end_limit=64,
                       root_hyps=256, lm_scale=lm_scale,
                       root_select=rsel, deferred_emission=True),
        )
        (res,) = dec.decode_scores(emis, np.array([T]))
        oracle_score, oracle_seq = _oracle_best(
            lex, topo, tying, trans, lm, emis, T, lm_scale
        )
        np.testing.assert_allclose(res.score, oracle_score, rtol=1e-4, atol=1e-3)
        got = [l.primary_orth for l in res.lemmas]
        assert got == list(oracle_seq), (got, oracle_seq, rsel)


# --------------------------------------------------------- bigram lookahead
def _bigram_la_setup(granularity="first-phone"):
    """Lexicon + bigram LM where history matters: Z is globally rare but
    always follows A, so unigram lookahead under-ranks Z's subtree while
    the history-conditioned correction restores it."""
    from rasr_tpu.search.lookahead import build_bigram_lookahead

    lex = Lexicon()
    build_default_silence(lex)
    lex.add_lemma(["A"], [(["a", "b"], 0.0)])
    lex.add_lemma(["C"], [(["c", "d"], 0.0)])
    lex.add_lemma(["E"], [(["e", "f"], 0.0)])
    lex.add_lemma(["Z"], [(["g", "h"], 0.0)])
    topo = HmmTopology(states_per_phone=1, silence_states=1)
    tying = MonophoneStateTying(lex, topo)
    trans = TransitionModel(
        speech=Tdp(loop=1.0, forward=0.0, skip=math.inf, exit=0.5),
        silence=Tdp(loop=0.2, forward=0.5, skip=math.inf, exit=0.3),
    )
    text = [["A", "Z"]] + [["C", "E"], ["E", "C"]] * 8
    lm = NgramLm.train_from_text(text, order=2)
    tables = compile_ngram(lm)
    unigrams = {wid: lm.score((), wid) for wid in lm.vocab.values()}
    tree = build_prefix_tree(
        lex, tying, topo, trans, lm_vocab=lm.vocab, lm_unigrams=unigrams
    )
    bla = build_bigram_lookahead(
        tree, lm, num_classes=8, granularity=granularity
    )
    return lex, topo, tying, trans, lm, tables, tree, bla


def test_bigram_lookahead_tables():
    """Builder invariants: sentinel corr column is zero, anchors include
    <s>, the neutral class row is zero, and every state maps to a
    subtree (or the root sentinel)."""
    lex, topo, tying, trans, lm, tables, tree, bla = _bigram_la_setup()
    assert not bla.deep
    G = bla.num_subtrees
    root_deg = tree.arc_ptr[1] - tree.arc_ptr[0]
    assert G == root_deg
    np.testing.assert_array_equal(bla.corr[:, G], 0.0)
    np.testing.assert_array_equal(bla.corr[bla.num_classes - 1], 0.0)
    assert lm.vocab["<s>"] in bla.anchor_words
    assert bla.sub_state[0] == G  # root carries no correction
    assert np.all((bla.sub_state >= 0) & (bla.sub_state <= G))
    # every non-root state is inside a real subtree (within-word tree)
    assert np.all(bla.sub_state[1:] < G)


def test_bigram_lookahead_wordset_tables():
    """Word-set (condensed-network) granularity: nodes refine beyond
    first-phone subtrees, crossing arcs carry consistent deltas
    (dpair row == corr[dst] - corr[src] for every pair), and the
    neutral class stays zero."""
    lex, topo, tying, trans, lm, tables, tree, bla = _bigram_la_setup(
        granularity="word-set"
    )
    assert bla.deep
    N = bla.num_subtrees
    root_deg = int(tree.arc_ptr[1] - tree.arc_ptr[0])
    assert N >= root_deg  # refines at least to first-phone resolution
    np.testing.assert_array_equal(bla.corr[:, N], 0.0)
    np.testing.assert_array_equal(bla.corr[bla.num_classes - 1], 0.0)
    assert bla.sub_state[0] == N
    # delta consistency over every arc: the telescoped potential must
    # be exactly corr[node(dst)] - corr[node(src)]
    import numpy as _np

    deg = tree.arc_ptr[1:] - tree.arc_ptr[:-1]
    src = _np.repeat(_np.arange(tree.num_states), deg)
    for ai in range(tree.num_arcs):
        s, d = src[ai], tree.arc_dst[ai]
        if s == 0:
            assert bla.arc_pair[ai] == 0
            continue
        ns, nd = bla.sub_state[s], bla.sub_state[d]
        want = bla.corr[:, nd] - bla.corr[:, ns]
        got = bla.dpair[:, bla.arc_pair[ai]]
        _np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("granularity", ["first-phone", "word-set"])
def test_bigram_lookahead_shaping_is_exact(rng, granularity):
    """Bigram lookahead is exact potential shaping: with pruning off the
    decode results match the unshaped decoder bit-for-bit in words and
    to float tolerance in score — across the rsel/defer/unpacked
    decoder configurations (every packed-transport path), at both
    granularities (word-set adds the per-arc delta gathers)."""
    lex, topo, tying, trans, lm, tables, tree, bla = _bigram_la_setup(
        granularity
    )
    M = tying.num_classes
    base = BeamConfig(
        max_hyps=256, beam=1e9, word_end_limit=64, root_hyps=256,
        lm_scale=0.7,
    )
    variants = [
        base,
        dataclasses.replace(base, root_select=2048, deferred_emission=True),
        dataclasses.replace(base, deferred_emission=True),
        dataclasses.replace(base, force_unpacked_keys=True),
    ]
    dec_ref = TreeDecoder(tree, tables, base)
    for cfg in variants:
        dec = TreeDecoder(tree, tables, cfg, bigram_la=bla)
        emis = rng.uniform(0.0, 6.0, size=(2, 7, M)).astype(np.float32)
        ra = dec_ref.decode_scores(emis, np.array([7, 6]))
        rb = dec.decode_scores(emis, np.array([7, 6]))
        for a, b in zip(ra, rb):
            np.testing.assert_allclose(a.score, b.score, rtol=1e-4, atol=1e-3)
            assert [l.primary_orth for l in a.lemmas] == [
                l.primary_orth for l in b.lemmas
            ]


def test_bigram_lookahead_beats_unigram_at_tight_beam():
    """The point of history conditioning: at a tight beam the unigram-
    shaped decode prunes the (history-predicted, unigram-rare) word Z
    and errs; the bigram-shaped decode recovers the exact result."""
    from rasr_tpu.models.allophone import Allophone, AllophoneState

    lex, topo, tying, trans, lm, tables, tree, bla = _bigram_la_setup()
    M = tying.num_classes

    def cls(ph):
        return tying.classify(AllophoneState(Allophone(lex.phonemes[ph].id), 0))

    seq = ["a", "b", "g", "h"]  # "A Z"
    T = len(seq)
    emis = np.full((1, T, M), 3.0, np.float32)
    for t, ph in enumerate(seq):
        emis[0, t, cls(ph)] = 0.0
    for t in range(T):
        for ph in ("c", "e"):  # confusable competitors
            emis[0, t, cls(ph)] = 0.6

    exact_cfg = BeamConfig(
        max_hyps=512, beam=1e9, word_end_limit=64, root_hyps=512, lm_scale=1.0
    )
    (ex,) = TreeDecoder(tree, tables, exact_cfg).decode_scores(
        emis, np.array([T])
    )
    assert ex.orth == "A Z"

    tight = BeamConfig(
        max_hyps=6, beam=3.0, word_end_limit=8, root_hyps=6, lm_scale=1.0
    )
    (uni,) = TreeDecoder(tree, tables, tight).decode_scores(emis, np.array([T]))
    (bi,) = TreeDecoder(tree, tables, tight, bigram_la=bla).decode_scores(
        emis, np.array([T])
    )
    assert bi.orth == ex.orth and abs(bi.score - ex.score) < 1e-3
    assert uni.orth != ex.orth  # the unigram-shaped search erred here


def test_trigram_lookahead_exact_and_conditions_on_pairs():
    """Order-3 lookahead (r2 verdict item 8): pair anchors carry exact
    trigram rows; shaping still cancels exactly (pruning-off decode ==
    unshaped), and the class map actually distinguishes two-word
    histories that share a last word."""
    from rasr_tpu.models.lm.ngram_tpu import state_contexts
    from rasr_tpu.search.lookahead import build_bigram_lookahead

    lex, topo, tying, trans, _, _, _, _ = _bigram_la_setup()
    # order-3 LM over the same lexicon: trigram contexts exist, and
    # p(.|A,Z) != p(.|C,Z) so pair anchors genuinely discriminate
    rng = np.random.default_rng(2)
    words = ["A", "C", "E", "Z"]
    text3 = []
    for _i in range(80):
        s = [words[rng.integers(4)]]
        for _j in range(4):
            prev2 = tuple(s[-2:]) if len(s) >= 2 else None
            nxt = "E" if prev2 == ("A", "Z") else (
                "C" if prev2 == ("C", "Z") else words[rng.integers(4)]
            )
            s.append(nxt)
        text3.append(s)
    lm = NgramLm.train_from_text(text3, order=3)
    tables = compile_ngram(lm)
    unigrams = {wid: lm.score((), wid) for wid in lm.vocab.values()}
    tree = build_prefix_tree(
        lex, tying, topo, trans, lm_vocab=lm.vocab, lm_unigrams=unigrams
    )
    bla3 = build_bigram_lookahead(tree, lm, num_classes=32, order=3)
    assert bla3 is not None
    # some anchors must be pairs (two live columns in the padded array)
    assert bla3.anchor_words.shape[1] == 2
    assert (bla3.anchor_words[:, 0] >= 0).any()
    # pair-anchored states with the same LAST word but different
    # second-to-last words must (somewhere) take different classes
    ctxs = state_contexts(lm)
    by_last = {}
    for i, ctx in enumerate(ctxs):
        if len(ctx) >= 2:
            by_last.setdefault(ctx[-1], set()).add(int(bla3.state_class[i]))
    assert any(len(cs) > 1 for cs in by_last.values())

    rng = np.random.default_rng(5)
    M = tying.num_classes
    B, T = 2, 14
    emis = rng.uniform(0.0, 8.0, size=(B, T, M)).astype(np.float32)
    n = np.full(B, T, np.int32)
    cfg = BeamConfig(
        max_hyps=1024, beam=1e9, word_end_limit=128, root_hyps=64,
        lm_scale=2.0,
    )
    base = TreeDecoder(tree, tables, cfg).decode_scores(emis, n)
    shaped = TreeDecoder(tree, tables, cfg, bigram_la=bla3).decode_scores(emis, n)
    for r0, r1 in zip(base, shaped):
        assert abs(r0.score - r1.score) < 1e-3
        assert r0.words == r1.words


def test_wordset_lookahead_wfst_style_networks_use_general_path():
    """Networks the interval builder cannot prove interval-safe (word-end
    re-entries at NON-root states = WFST junctions; high->low arcs) now
    route through the general bitset builder (r3 verdict item 7) — the
    result must carry ``reentry=True`` (non-root re-entries need the
    decoder's entry-node correction add-back) and a consistent node map.
    tests/test_wfst.py pins decode exactness for the general path."""
    import copy

    from rasr_tpu.search.lookahead import build_bigram_lookahead

    lex, topo, tying, trans, lm, tables, tree, _ = _bigram_la_setup()
    # (a) re-entry at an emitting state = WFST-style junction
    t1 = copy.deepcopy(tree)
    t1.we_next = np.zeros_like(t1.we_word)
    ws = int(np.flatnonzero(t1.we_word[:, 0] != -1)[0])
    t1.we_next[ws, 0] = ws  # re-enter at itself (any non-root works)
    b1 = build_bigram_lookahead(t1, lm, num_classes=8)
    assert b1 is not None and b1.reentry and b1.deep
    assert b1.sub_state.shape[0] == t1.num_states
    assert b1.sub_state[0] == b1.num_subtrees  # root keeps the sentinel
    # (b) an arc running high -> low breaks the interval invariant; the
    # fixpoint path handles it (monotone union converges on cycles)
    t2 = copy.deepcopy(tree)
    t2.arc_dst = t2.arc_dst.copy()
    t2.arc_dst[-1] = 1  # last arc now points backwards
    b2 = build_bigram_lookahead(t2, lm, num_classes=8)
    assert b2 is not None and b2.reentry


def test_survivor_lookahead_update_bounded():
    """lookahead-update=survivor (the reference's LAZY lookahead
    activation): scores must remain VALID path scores bounded by the
    exact optimum from below (it cannot beat the true best) and by the
    correction range from above (the only deviation channel is a
    same-key recombination biased by at most the phi spread)."""
    import dataclasses as dc

    lex, topo, tying, trans, lm, tables, tree, _ = _bigram_la_setup("word-set")
    from rasr_tpu.search.lookahead import build_bigram_lookahead

    bla = build_bigram_lookahead(tree, lm, num_classes=8)
    rng = np.random.default_rng(3)
    M = tying.num_classes
    B, T = 3, 14
    emis = rng.uniform(0.0, 8.0, size=(B, T, M)).astype(np.float32)
    n = np.array([T, T - 2, T - 4], np.int32)
    cfg = BeamConfig(
        max_hyps=512, beam=1e9, word_end_limit=64, root_hyps=64,
        lm_scale=2.0,
    )
    exact = TreeDecoder(tree, tables, cfg, bigram_la=bla).decode_scores(emis, n)
    surv = TreeDecoder(
        tree, tables, dc.replace(cfg, lookahead_update="survivor"),
        bigram_la=bla,
    ).decode_scores(emis, n)
    spread = 2.0 * float(np.abs(bla.corr).max()) * cfg.lm_scale
    for a, b in zip(exact, surv):
        assert b.score >= a.score - 1e-3
        assert b.score <= a.score + spread + 1e-3


def test_bigram_lookahead_across_word_exact():
    """Word-set bigram lookahead on the ACROSS-WORD network (r2 verdict
    missing #1 — the production network shape): shaping must cancel
    exactly (decode scores/words == the unshaped across-word decode
    with pruning off; context roots carry the sentinel correction and
    root-leaving arcs apply corr via the crossing deltas). First-phone
    granularity remains within-word-only (returns None)."""
    from rasr_tpu.search.lookahead import build_bigram_lookahead

    lex, topo, tying, trans, lm, tables, tree, bla = _bigram_la_setup()
    aw = build_prefix_tree(
        lex, tying, topo, trans, lm_vocab=lm.vocab, across_word=True,
        lm_unigrams={wid: lm.score((), wid) for wid in lm.vocab.values()},
    )
    assert (
        build_bigram_lookahead(aw, lm, num_classes=8, granularity="first-phone")
        is None
    )
    bla_aw = build_bigram_lookahead(aw, lm, num_classes=8, granularity="word-set")
    assert bla_aw is not None and bla_aw.deep
    rng = np.random.default_rng(11)
    M = tying.num_classes
    B, T = 3, 18
    emis = rng.uniform(0.0, 8.0, size=(B, T, M)).astype(np.float32)
    n = np.array([T, T - 4, T - 7], np.int32)
    cfg = BeamConfig(
        max_hyps=1024, beam=1e9, word_end_limit=128, root_hyps=64,
        lm_scale=2.0,
    )
    base = TreeDecoder(aw, tables, cfg).decode_scores(emis, n)
    shaped = TreeDecoder(aw, tables, cfg, bigram_la=bla_aw).decode_scores(emis, n)
    for r0, r1 in zip(base, shaped):
        assert abs(r0.score - r1.score) < 1e-3, (r0.score, r1.score)
        assert r0.words == r1.words


def test_bigram_lookahead_partitioned_beam(rng):
    """Bigram shaping under beam partitioning (the non-ride gather
    path + collective merge) == the single-device unshaped decode at
    exact settings."""
    from rasr_tpu.parallel.mesh import make_mesh

    lex, topo, tying, trans, lm, tables, tree, bla = _bigram_la_setup()
    M = tying.num_classes
    B, T = 2, 10
    emis = rng.uniform(0.0, 8.0, size=(B, T, M)).astype(np.float32)
    n = np.array([T, T - 3], np.int32)
    cfg = BeamConfig(
        max_hyps=64, word_end_limit=16, root_hyps=64, branch_hyps=64,
        lm_scale=0.7,
    )
    ref = TreeDecoder(tree, tables, cfg).decode_scores(emis, n)
    dec = TreeDecoder(tree, tables, cfg, bigram_la=bla)
    mesh = make_mesh(data=2, model=4)
    got = dec.decode_scores(emis, n, mesh=mesh, beam_axis="model")
    for r, g in zip(ref, got):
        assert r.words == g.words
        np.testing.assert_allclose(r.score, g.score, rtol=1e-4, atol=1e-3)


def test_packed_row_big_table_layout_exact(setup, rng, monkeypatch):
    """The large-vocab packed-row combo layout (pack_f states per row +
    binary unpack selects) must be bit-equivalent to the plain layout.
    Forced on via the RASR_TPU_PACK_THRESHOLD test hook."""
    lex, topo, tying, trans, lm, tables, tree = setup
    M = tying.num_classes
    B, T = 2, 12
    emis = rng.uniform(0.0, 8.0, size=(B, T, M)).astype(np.float32)
    n = np.array([T, T - 3], np.int32)
    cfg = BeamConfig(max_hyps=64, word_end_limit=16, root_hyps=16,
                     lm_scale=0.7)
    ref = TreeDecoder(tree, tables, cfg).decode_scores(emis, n)
    monkeypatch.setenv("RASR_TPU_PACK_THRESHOLD", "1")
    got = TreeDecoder(tree, tables, cfg).decode_scores(emis, n)
    for r, g in zip(ref, got):
        assert r.words == g.words
        assert r.word_ends == g.word_ends
        np.testing.assert_allclose(r.score, g.score, rtol=0, atol=0)
