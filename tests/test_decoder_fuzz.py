"""Randomized exactness fuzz: decoder == brute force on random systems.

test_decoder.py proves the exactness contract on one fixed setup; this
fuzzes it across random lexica (word/phone inventories, pronunciation
lengths), topologies (1-2 states/phone), transition models (incl.
finite skips), bigram LMs from random text, and the decoder's
exactness-preserving config variants (deferred_emission,
force_unpacked_keys). With pruning off, the decoder's best score and
word sequence must equal an exhaustive minimum over word sequences —
computed as ONE batched banded-Viterbi call over all candidate
alignment graphs (padded to a common state count) plus host LM scoring.
"""

import itertools
import math

import jax.numpy as jnp
import numpy as np
import pytest

from rasr_tpu.align.graph import build_linear_graph
from rasr_tpu.corpus.lexicon import Lexicon, build_default_silence
from rasr_tpu.models.hmm import HmmTopology, Tdp, TransitionModel
from rasr_tpu.models.lm.arpa import NgramLm
from rasr_tpu.models.lm.ngram_tpu import compile_ngram
from rasr_tpu.models.tying import MonophoneStateTying
from rasr_tpu.ops.viterbi import BIG, viterbi_align
from rasr_tpu.search.decoder import BeamConfig, TreeDecoder
from rasr_tpu.search.tree import build_prefix_tree


def _min_frames(g) -> int:
    """Exact minimum frames to traverse a linear graph (forward pass over
    the banded DAG: loop adds frames, fwd/skip advance 1/2 states)."""
    S = g.num_states
    INF = 10**9
    d = [INF] * S
    for s in range(S):
        if g.init[s] < BIG / 2:
            d[s] = 1
    for s in range(S):
        if d[s] == INF:
            continue
        if s + 1 < S and g.fwd[s + 1] < BIG / 2:
            d[s + 1] = min(d[s + 1], d[s] + 1)
        if s + 2 < S and g.skip[s + 2] < BIG / 2:
            d[s + 2] = min(d[s + 2], d[s] + 1)
    return min((d[s] for s in range(S) if g.final[s] < BIG / 2), default=INF)


def _oracle(lex, topo, tying, trans, lm, emissions, T, lm_scale, max_tokens):
    """Exhaustive min over token sequences, batched into one DP call."""
    words = [l.primary_orth for l in lex.lemmata if l.special != "silence"]
    items = words + ["[SILENCE]"]
    eos = lm.vocab["</s>"]

    pron_score = {
        l.primary_orth: l.pronunciations[0].score for l in lex.lemmata
    }

    def lm_cost_of(seq):
        # scaled LM cost + pronunciation scores (the alignment graph
        # carries only TDPs; the decoder folds pron scores into its
        # word-end costs, so the oracle adds them here)
        h = lm.start_history()
        c = sum(pron_score[w] for w in seq)
        for w in seq:
            if w == "[SILENCE]":
                continue
            wid = lm.vocab.get(w)
            if wid is None:
                # lexicon word absent from the (tiny random) training
                # text and no <unk>: the network scores it as a no-LM
                # word — zero cost, history unchanged (tree.py
                # _lm_word_of -> WORD_SILENCE). Mirror that here.
                continue
            c += lm_scale * lm.score(h, wid)
            h = lm.extended_history(h, wid)
        return c + lm_scale * lm.score(h, eos)

    # minimum frames a token consumes (skips never cross word boundaries,
    # so a sequence's minimum is the sum of its tokens'); prunes the
    # enumeration exactly
    min_len = {
        it: _min_frames(
            build_linear_graph(it, lex, tying, topo, trans, optional_silence=False)
        )
        for it in items
    }

    seqs, graphs = [], []
    for n in range(1, max_tokens + 1):
        for seq in itertools.product(items, repeat=n):
            if sum(min_len[w] for w in seq) > T:
                continue
            g = build_linear_graph(
                " ".join(seq), lex, tying, topo, trans, optional_silence=False
            )
            seqs.append(seq)
            graphs.append(g)
    assert graphs, "oracle found no feasible sequence"
    S = max(g.num_states for g in graphs)
    N = len(graphs)
    emis = np.full((N, T, S), BIG, np.float32)
    loop = np.full((N, S), BIG, np.float32)
    fwd = np.full((N, S), BIG, np.float32)
    skip = np.full((N, S), BIG, np.float32)
    init = np.full((N, S), BIG, np.float32)
    final = np.full((N, S), BIG, np.float32)
    for i, g in enumerate(graphs):
        n = g.num_states
        emis[i, :, :n] = emissions[0][:, g.emission_ids]
        loop[i, :n] = g.loop
        fwd[i, :n] = g.fwd
        skip[i, :n] = g.skip
        init[i, :n] = g.init
        final[i, :n] = g.final
    cost, _ = viterbi_align(
        jnp.asarray(emis), jnp.asarray(loop), jnp.asarray(fwd),
        jnp.asarray(skip), jnp.asarray(init), jnp.asarray(final),
        jnp.asarray(np.full(N, T, np.int32)),
    )
    cost = np.asarray(cost)
    best = (np.inf, None)
    totals = {}
    for i, seq in enumerate(seqs):
        total = float(cost[i]) + lm_cost_of(seq)
        totals[tuple(seq)] = min(totals.get(tuple(seq), np.inf), total)
        if total < best[0]:
            best = (total, seq)
    # ties happen at random costs (e.g. one long silence vs two short
    # ones); callers accept ANY sequence whose cost equals the optimum
    return best + (totals,)


# 101: oracle OOV handling; 109: caught the rs_cls emission-class
# clobber corrupting the packed (bp, class) payload (round 3)
@pytest.mark.parametrize("seed", [11, 22, 33, 44, 55, 66, 77, 88, 101, 109])
def test_decoder_fuzz_exact(seed):
    rng = np.random.default_rng(seed)
    # ---- random system ----------------------------------------------
    phones = ["p", "q", "r"][: int(rng.integers(2, 4))]
    lex = Lexicon()
    build_default_silence(lex)
    n_words = int(rng.integers(2, 4))
    orths = []
    for i in range(n_words):
        length = int(rng.integers(1, 3))
        pron = [phones[int(rng.integers(len(phones)))] for _ in range(length)]
        orth = f"W{i}_" + "".join(pron).upper()
        lex.add_lemma([orth], [(pron, float(rng.uniform(0, 0.5)))])
        orths.append(orth)
    spp = int(rng.integers(1, 4))
    topo = HmmTopology(states_per_phone=spp, silence_states=1)
    tying = MonophoneStateTying(lex, topo)
    # finite skips half the time: the word-scope search network realizes
    # the same skip transitions as the alignment graphs (incl. crossing
    # phone boundaries and skipping 1-state phones), so scores must agree
    finite_skip = bool(rng.integers(2))
    trans = TransitionModel(
        speech=Tdp(
            loop=float(rng.uniform(0.1, 1.5)),
            forward=float(rng.uniform(0.0, 0.5)),
            skip=float(rng.uniform(0.5, 3.0)) if finite_skip else math.inf,
            exit=float(rng.uniform(0.0, 1.0)),
        ),
        silence=Tdp(
            loop=float(rng.uniform(0.1, 0.5)),
            forward=float(rng.uniform(0.0, 0.8)),
            skip=math.inf,
            exit=float(rng.uniform(0.0, 0.5)),
        ),
    )
    sents = [
        [orths[int(rng.integers(n_words))] for _ in range(int(rng.integers(1, 4)))]
        for _ in range(6)
    ]
    lm = NgramLm.train_from_text(sents, order=2)
    tables = compile_ngram(lm)
    tree = build_prefix_tree(lex, tying, topo, trans, lm_vocab=lm.vocab)

    # ---- pruning-off decode vs exhaustive minimum --------------------
    M = tying.num_classes
    T = int(rng.integers(5, 8))
    lm_scale = float(rng.uniform(0.3, 1.5))
    emis = rng.uniform(0.0, 6.0, size=(1, T, M)).astype(np.float32)
    variant = dict(
        deferred_emission=bool(rng.integers(2)),
        force_unpacked_keys=bool(rng.integers(2)),
        # compact branch expansion with a covering budget == dense fan
        branch_width=int(rng.integers(2)) * 2048,
        # LM-aware word-end rank: selection-only (exact at full R)
        word_end_rank_lm=bool(rng.integers(2)),
        # root-select with a covering budget: exact scores
        root_select=int(rng.integers(2)) * 4096,
        # correction scale: shaping must cancel at ANY value
        lookahead_corr_scale=float(rng.choice([1.0, 0.5])),
    )
    # bigram/trigram lookahead shaping (word-set): exercises the
    # carried class/phi payload + packed (bp, class) operand through
    # every other config variant — must cancel exactly
    bla = None
    if rng.integers(2):
        from rasr_tpu.search.lookahead import build_bigram_lookahead

        bla = build_bigram_lookahead(
            tree, lm, num_classes=int(rng.integers(2, 8)),
            order=int(rng.integers(2, 4)),
            smooth=float(rng.choice([0.0, 1.0])),
        )
    dec = TreeDecoder(
        tree, tables,
        BeamConfig(max_hyps=512, beam=1e9, word_end_limit=128,
                   root_hyps=512, lm_scale=lm_scale, **variant),
        bigram_la=bla,
    )
    (res,) = dec.decode_scores(emis, np.array([T]))
    # horizon T covers every decodable sequence: each token uses >=1 frame
    oracle_score, oracle_seq, oracle_totals = _oracle(
        lex, topo, tying, trans, lm, emis, T, lm_scale, max_tokens=T
    )
    got = [l.primary_orth for l in res.lemmas]
    np.testing.assert_allclose(res.score, oracle_score, rtol=1e-4, atol=1e-3)
    # the decoded sequence must BE an optimal one (ties allowed: the
    # decoder's argmin order is not the oracle's enumeration order)
    got_cost = oracle_totals.get(tuple(got), np.inf)
    assert (
        got == list(oracle_seq)
        or got_cost <= oracle_score + max(1e-3, 1e-4 * abs(oracle_score))
    ), (got, oracle_seq, got_cost, oracle_score, variant, seed)
