"""Lattice construction + FLF processing + WER evaluation tests."""

import math

import numpy as np
import pytest

from rasr_tpu.lattice.evaluator import CorpusEvaluator, align_tokens, lattice_oracle
from rasr_tpu.lattice.flf import (
    best_path,
    cn_decode,
    confusion_network,
    forward_backward,
    n_best,
    posterior_prune,
    rescore_lm,
)
from rasr_tpu.lattice.lattice import Lattice, LatticeArc, decoder_lattice


def _diamond() -> Lattice:
    """0 -> {A(1) | B(2)} -> 1 -> C(0.5) -> 2(final)."""
    arcs = [
        LatticeArc(0, 1, 0, 1.0, 0.0),  # A
        LatticeArc(0, 1, 1, 2.0, 0.0),  # B
        LatticeArc(1, 2, 2, 0.5, 0.0),  # C
    ]
    return Lattice(
        num_nodes=3,
        arcs=arcs,
        node_time=np.array([0, 5, 10], np.int32),
        final_scores={2: 0.0},
        lemma_orths=["A", "B", "C"],
    )


def test_best_path_and_nbest():
    lat = _diamond()
    score, path = best_path(lat)
    assert [lat.lemma_orths[a.lemma] for a in path] == ["A", "C"]
    np.testing.assert_allclose(score, 1.5)
    nb = n_best(lat, 5)
    assert len(nb) == 2
    np.testing.assert_allclose(nb[0][0], 1.5)
    np.testing.assert_allclose(nb[1][0], 2.5)
    assert [lat.lemma_orths[a.lemma] for a in nb[1][1]] == ["B", "C"]


def test_forward_backward_posteriors():
    lat = _diamond()
    total, post = forward_backward(lat)
    # two paths with costs 1.5 / 2.5 -> posteriors softmax(-costs)
    pa = math.exp(-1.5) / (math.exp(-1.5) + math.exp(-2.5))
    np.testing.assert_allclose(post[0], pa, rtol=1e-6)
    np.testing.assert_allclose(post[1], 1 - pa, rtol=1e-6)
    np.testing.assert_allclose(post[2], 1.0, rtol=1e-6)
    np.testing.assert_allclose(total, -math.log(math.exp(-1.5) + math.exp(-2.5)), rtol=1e-6)


def test_posterior_prune():
    lat = _diamond()
    pruned = posterior_prune(lat, threshold=0.5)  # keeps only p >= e^-0.5
    orths = sorted(lat.lemma_orths[a.lemma] for a in pruned.arcs)
    assert orths == ["A", "C"]  # B (p~0.27) pruned, best path kept
    # pruning everything still keeps best path
    p2 = posterior_prune(lat, threshold=0.0)
    assert len(p2.arcs) >= 2


def test_lattice_pack_roundtrip():
    lat = _diamond()
    lat2 = Lattice.unpack(lat.pack())
    assert lat2.num_nodes == 3
    assert len(lat2.arcs) == 3
    np.testing.assert_allclose(lat2.arcs[1].am_score, 2.0)
    assert lat2.final_scores == {2: 0.0}
    assert lat2.lemma_orths == ["A", "B", "C"]


def test_rescore_lm():
    from rasr_tpu.models.lm.arpa import NgramLm

    lm = NgramLm.train_from_text([["A", "C"], ["B", "C"], ["A", "C"]], order=2)
    lat = _diamond()
    synt = {0: lm.vocab["A"], 1: lm.vocab["B"], 2: lm.vocab["C"]}
    res = rescore_lm(lat, lm, synt)
    score, path = best_path(res)
    words = [res.lemma_orths[a.lemma] for a in path]
    assert words == ["A", "C"]
    # lattice lm dim now equals exact LM scores
    expect = lat.arcs[0].am_score + lm.score(lm.start_history(), lm.vocab["A"])
    a0 = [a for a in res.arcs if a.lemma == 0][0]
    np.testing.assert_allclose(a0.am_score + a0.lm_score, expect, rtol=1e-6)


def test_confusion_network_and_decode():
    lat = _diamond()
    slots = confusion_network(lat)
    assert len(slots) == 2
    # slot 0: A vs B with A dominant
    words = dict(slots[0].hypotheses)
    assert words["A"] > words["B"]
    np.testing.assert_allclose(sum(words.values()), 1.0, atol=1e-6)
    assert cn_decode(slots) == ["A", "C"]


def test_lattice_fsa_bridge_roundtrip():
    """lattice -> fsa best path == flf best path; union via fsa ops."""
    from rasr_tpu.fsa.algorithms import best as fsa_best, union
    from rasr_tpu.lattice.flf import best_path
    from rasr_tpu.lattice.lattice import fsa_to_lattice, lattice_to_fsa

    lat = _diamond()
    fsa = lattice_to_fsa(lat)
    cost, arcs = fsa_best(fsa)
    score, path = best_path(lat)
    words = [lat.lemma_orths[a.lemma] for a in path]
    assert math.isclose(cost, score, rel_tol=1e-9)
    labels = [fsa.input_symbols[a.ilabel] for a in arcs if a.ilabel != 0]
    assert labels == words

    # round-trip back to a lattice: best path survives
    lat2 = fsa_to_lattice(fsa)
    score2, path2 = best_path(lat2)
    words2 = [lat2.lemma_orths[a.lemma] for a in path2 if a.lemma >= 0]
    assert words2 == words and math.isclose(score2, score, rel_tol=1e-9)

    # union with a shifted copy still finds the cheaper side
    import dataclasses as dc

    worse = dc.replace(
        lat,
        arcs=[
            LatticeArc(a.from_node, a.to_node, a.lemma, a.am_score + 5.0, a.lm_score)
            for a in lat.arcs
        ],
    )
    u = union(lattice_to_fsa(lat), lattice_to_fsa(worse))
    cost_u, _ = fsa_best(u)
    assert math.isclose(cost_u, score, rel_tol=1e-9)


def test_align_tokens_and_wer():
    stats, ops = align_tokens("the cat sat".split(), "the bat sat down".split())
    assert stats.substitutions == 1
    assert stats.insertions == 1
    assert stats.deletions == 0
    np.testing.assert_allclose(stats.wer, 2 / 3)
    kinds = [o[0] for o in ops]
    assert kinds == ["match", "sub", "match", "ins"]


def test_corpus_evaluator():
    ev = CorpusEvaluator()
    ev.add("s1", "a b c", "a b c")
    ev.add("s2", "a b", "a x")
    rep = ev.report()
    assert rep["errors"] == 1
    np.testing.assert_allclose(rep["wer"], 1 / 5)


def test_lattice_oracle():
    lat = _diamond()
    errs, _ = lattice_oracle(lat, ["A", "C"])
    assert errs == 0
    errs2, _ = lattice_oracle(lat, ["B", "C"])
    assert errs2 == 0  # B path exists
    errs3, _ = lattice_oracle(lat, ["X", "C"])
    assert errs3 == 1
    errs4, _ = lattice_oracle(lat, ["A", "C", "D"])
    assert errs4 == 1


def test_decoder_lattice_end_to_end(rng):
    """Lattice from a real decode: best lattice path == decoder output."""
    from rasr_tpu.corpus.lexicon import Lexicon, build_default_silence
    from rasr_tpu.models.hmm import HmmTopology, TransitionModel
    from rasr_tpu.models.lm.arpa import NgramLm
    from rasr_tpu.models.lm.ngram_tpu import compile_ngram
    from rasr_tpu.models.tying import MonophoneStateTying
    from rasr_tpu.search.decoder import BeamConfig, TreeDecoder
    from rasr_tpu.search.tree import build_prefix_tree

    lex = Lexicon()
    build_default_silence(lex)
    lex.add_lemma(["AB"], [(["a", "b"], 0.0)])
    lex.add_lemma(["BA"], [(["b", "a"], 0.0)])
    topo = HmmTopology(states_per_phone=1, silence_states=1)
    tying = MonophoneStateTying(lex, topo)
    lm = NgramLm.train_from_text([["AB", "BA"], ["BA", "AB"]], order=2)
    tree = build_prefix_tree(lex, tying, topo, TransitionModel(), lm_vocab=lm.vocab)
    dec = TreeDecoder(
        tree, compile_ngram(lm),
        BeamConfig(max_hyps=64, word_end_limit=16, lm_scale=1.0),
    )
    M = tying.num_classes
    emis = rng.uniform(0, 6, size=(1, 10, M)).astype(np.float32)
    (res,) = dec.decode_scores(emis, np.array([10]))
    lat = decoder_lattice(dec, 0)
    assert lat.num_nodes > 1 and lat.arcs
    score, path = best_path(lat)
    words = []
    for a in path:
        if lat.lemma_orths[a.lemma] not in ("[SILENCE]",):
            words.append(lat.lemma_orths[a.lemma])
    assert words == res.words
    np.testing.assert_allclose(score, res.score, rtol=1e-4, atol=1e-3)
    # oracle WER of the decoded sequence is 0 by construction
    errs, _ = lattice_oracle(lat, [lat.lemma_orths[a.lemma] for a in path])
    assert errs == 0


def test_time_frame_cn_and_confidence():
    from rasr_tpu.lattice.flf import best_path, time_frame_cn, word_confidence

    lat = _diamond()
    frames = time_frame_cn(lat)
    assert len(frames) == int(lat.node_time.max())
    # posteriors are distributions per frame (eps mass completes to 1)
    for d in frames:
        assert abs(sum(d.values()) - 1.0) < 1e-6
        for v in d.values():
            assert -1e-9 <= v <= 1.0 + 1e-9
    conf = word_confidence(lat)
    _, best = best_path(lat)
    assert len(conf) == sum(1 for a in best if a.lemma >= 0)
    for w, c in conf:
        assert 0.0 <= c <= 1.0 + 1e-9


def test_config5_hybrid_sharded_decode_lattice_rescore(rng):
    """BASELINE.md graduated config 5 as one chain: hybrid NN scoring
    (length-masked Conformer) -> DP-mesh-sharded beam decode -> word
    lattice -> higher-order LM rescoring, each stage checked exactly:
    mesh decode == single-device decode, lattice best path == decoder
    output, and the rescored lattice's best path == exhaustive
    enumeration of lattice paths under the new LM."""
    import jax
    import jax.numpy as jnp

    from rasr_tpu.corpus.lexicon import Lexicon, build_default_silence
    from rasr_tpu.models.hmm import HmmTopology, TransitionModel
    from rasr_tpu.models.lm.arpa import NgramLm
    from rasr_tpu.models.lm.ngram_tpu import compile_ngram
    from rasr_tpu.models.nn import ConformerEncoderNet, NnHybridScorer, StatePriors
    from rasr_tpu.models.tying import MonophoneStateTying
    from rasr_tpu.parallel.mesh import make_mesh
    from rasr_tpu.search.decoder import BeamConfig, TreeDecoder
    from rasr_tpu.search.tree import build_prefix_tree

    lex = Lexicon()
    build_default_silence(lex)
    lex.add_lemma(["AB"], [(["a", "b"], 0.0)])
    lex.add_lemma(["BA"], [(["b", "a"], 0.0)])
    topo = HmmTopology(states_per_phone=1, silence_states=1)
    tying = MonophoneStateTying(lex, topo)
    M = tying.num_classes
    lm2 = NgramLm.train_from_text([["AB", "BA"], ["BA", "AB"]], order=2)
    tree = build_prefix_tree(lex, tying, topo, TransitionModel(), lm_vocab=lm2.vocab)

    # hybrid scoring: conformer encoder posteriors -> emission costs
    D = 6
    model = ConformerEncoderNet(
        num_classes=M, d_model=8, num_blocks=1, num_heads=2, conv_kernel=3
    )
    B, T = 4, 10
    feats = rng.normal(size=(B, T, D)).astype(np.float32) * 3.0
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(feats))["params"]
    priors = StatePriors(np.log(np.full(M, 1.0 / M, np.float32)))
    scorer = NnHybridScorer(model, params, priors, scale=1.0)
    n = np.array([10, 8, 10, 7])
    emis = np.asarray(scorer(feats, lengths=n))

    dec = TreeDecoder(
        tree, compile_ngram(lm2),
        BeamConfig(max_hyps=64, word_end_limit=16, lm_scale=1.0),
    )
    # DP-sharded decode over the test mesh == single-device decode
    import jax as _jax

    mesh = make_mesh(data=4, model=1, devices=_jax.devices()[:4])
    res_mesh = dec.decode_scores(emis, n, mesh=mesh)
    res_one = dec.decode_scores(emis, n)
    for a, b_ in zip(res_mesh, res_one):
        assert a.words == b_.words
        np.testing.assert_allclose(a.score, b_.score, rtol=1e-5)

    # lattice generation (word-pair records) + same-LM consistency
    lat = decoder_lattice(dec, 0)
    score, path = best_path(lat)
    np.testing.assert_allclose(score, res_one[0].score, rtol=1e-4, atol=1e-3)

    # LM rescoring with a higher-order (trigram) LM
    lm3 = NgramLm.train_from_text(
        [["AB", "BA", "AB"], ["BA", "AB", "AB"], ["AB", "AB", "BA"]], order=3
    )
    synt = {
        i: lm3.vocab.get(l.primary_orth)
        for i, l in enumerate(dec.tree.lemmas)
    }
    resc = rescore_lm(lat, lm3, synt)
    got_score, got_path = best_path(resc)

    # oracle: enumerate ALL lattice paths, score am + trigram exactly
    out = lat.out_arcs()
    best = [np.inf]

    def dfs(node, hist, am):
        if node in lat.final_scores:
            tot = am + lm3.sentence_end_score(hist)
            best[0] = min(best[0], tot)
        for ai in out[node]:
            a = lat.arcs[ai]
            wid = synt.get(a.lemma)
            if wid is None:
                dfs(a.to_node, hist, am + a.am_score)
            else:
                dfs(
                    a.to_node,
                    lm3.extended_history(hist, wid),
                    am + a.am_score + lm3.score(hist, wid),
                )

    dfs(0, lm3.start_history(), 0.0)
    np.testing.assert_allclose(got_score, best[0], rtol=1e-5, atol=1e-4)


def test_scale_map_union_ops(rng):
    """Structural FLF ops: semiring rescale, alphabet map, union."""
    from rasr_tpu.lattice.flf import best_path, map_lemmas, scale_scores, union
    from rasr_tpu.lattice.lattice import Lattice, LatticeArc

    def two_word_lattice(orths, am1, am2):
        arcs = [
            LatticeArc(0, 1, 0, am1, 1.0),
            LatticeArc(0, 1, 1, am2, 2.0),
        ]
        return Lattice(2, arcs, np.array([0, 10], np.int32), {1: 0.5}, list(orths))

    lat = two_word_lattice(["A", "B"], 3.0, 4.0)

    s = scale_scores(lat, 2.0, 10.0)
    assert s.arcs[0].am_score == 6.0 and s.arcs[0].lm_score == 10.0
    assert s.final_scores[1] == 0.5  # finals are total-dim: unscaled
    # scaled lattice at unit scales == original at (2, 10)
    c0, p0 = best_path(lat, 2.0, 10.0)
    c1, p1 = best_path(s, 1.0, 1.0)
    assert abs(c0 - c1) < 1e-6 and [a.lemma for a in p0] == [a.lemma for a in p1]

    m = map_lemmas(lat, {"B": "A"})
    assert m.lemma_orths == ["A"]
    assert all(a.lemma == 0 for a in m.arcs)

    u = union([lat, two_word_lattice(["B", "C"], 1.0, 9.0)])
    assert u.num_nodes == 5
    assert sorted(u.lemma_orths) == ["A", "B", "C"]
    cu, pu = best_path(u, 1.0, 1.0)
    # best path of the union == best over the inputs' best paths
    assert abs(cu - min(best_path(lat)[0], 1.0 + 1.0 + 0.5)) < 1e-6


def test_intersect():
    """Lattice intersection: language intersection with added scores."""
    from rasr_tpu.lattice.flf import forward_backward, intersect, union

    # diamond ∩ diamond: same language, every score doubled
    both = intersect(_diamond(), _diamond())
    score, path = best_path(both)
    assert [both.lemma_orths[a.lemma] for a in path] == ["A", "C"]
    np.testing.assert_allclose(score, 3.0)
    nb = n_best(both, 5)
    assert len(nb) == 2
    np.testing.assert_allclose(nb[1][0], 5.0)

    # ∩ with a "B C"-only lattice (different lemma alphabet: matches by orth)
    bc = Lattice(
        num_nodes=3,
        arcs=[LatticeArc(0, 1, 1, 0.0, 0.0), LatticeArc(1, 2, 0, 0.0, 0.0)],
        node_time=np.array([0, 5, 10], np.int32),
        final_scores={2: 0.0},
        lemma_orths=["C", "B"],
    )
    only_bc = intersect(_diamond(), bc)
    score, path = best_path(only_bc)
    assert [only_bc.lemma_orths[a.lemma] for a in path] == ["B", "C"]
    np.testing.assert_allclose(score, 2.5)
    assert len(n_best(only_bc, 5)) == 1

    # disjoint languages -> empty lattice
    nothing = intersect(
        _diamond(),
        Lattice(2, [LatticeArc(0, 1, 0, 0.0, 0.0)],
                np.array([0, 10], np.int32), {1: 0.0}, ["Z"]),
    )
    assert best_path(nothing)[1] == []


def test_intersect_epsilon_no_duplication():
    """Epsilon-sequencing filter: eps arcs on both sides must not
    duplicate paths (checked via total forward-backward mass)."""
    from rasr_tpu.lattice.flf import forward_backward, intersect, union

    def single(orth, cost):
        return Lattice(
            2, [LatticeArc(0, 1, 0, cost, 0.0)],
            np.array([0, 10], np.int32), {1: 0.0}, [orth],
        )

    # union introduces eps entry arcs on both sides
    a = union([single("A", 1.0), single("A", 1.0)])
    b = union([single("A", 1.0), single("A", 1.0)])
    got = intersect(a, b)
    total, _ = forward_backward(got)
    # exactly 2x2 = 4 combined paths of cost 2.0 each — duplicated eps
    # interleavings would double the mass
    np.testing.assert_allclose(total, 2.0 - math.log(4.0), rtol=1e-6)


# ------------------------------------------------- CN properties (arc-cluster)
def _random_lattice(rng, n_words=6, depth=6, branch=3):
    """Random acyclic multi-path lattice with monotone node times."""
    import itertools as _it

    nodes = [0]
    node_time = [0]
    arcs = []
    frontier = [0]
    nid = 0
    for d in range(depth):
        new_frontier = []
        for f in frontier:
            for _ in range(int(rng.integers(1, branch + 1))):
                if rng.uniform() < 0.4 and new_frontier:
                    to = rng.choice(new_frontier)
                else:
                    nid += 1
                    node_time.append((d + 1) * 4 + int(rng.integers(0, 3)))
                    new_frontier.append(nid)
                    to = nid
                arcs.append(
                    LatticeArc(
                        int(f), int(to), int(rng.integers(0, n_words)),
                        float(rng.uniform(0.2, 3.0)), 0.0,
                    )
                )
        frontier = new_frontier or frontier
    finals = {int(f): 0.0 for f in frontier}
    return Lattice(
        num_nodes=nid + 1,
        arcs=arcs,
        node_time=np.asarray(node_time, np.int32),
        final_scores=finals,
        lemma_orths=[f"w{i}" for i in range(n_words)],
    )


def test_cn_slot_order_is_path_consistent(rng):
    """THE arc-cluster CN invariant the naive pivot lacked: along every
    lattice path, assigned slot indices are strictly increasing (two
    arcs of one path never share or reorder slots)."""
    from rasr_tpu.lattice.flf import confusion_network

    for trial in range(8):
        lat = _random_lattice(rng)
        slots, assign = confusion_network(lat, return_assignment=True)
        out = lat.out_arcs()

        # DFS over all paths, checking monotonicity of slot indices
        stack = [(0, -1)]
        while stack:
            node, last_slot = stack.pop()
            for ai in out[node]:
                k = assign.get(ai)
                if k is None:  # zero-posterior arc
                    continue
                assert k > last_slot, (trial, ai, k, last_slot)
                stack.append((lat.arcs[ai].to_node, k))


def test_cn_slot_mass_and_assignment_complete(rng):
    """Every positive-posterior arc lands in exactly one slot and every
    slot's hypothesis mass (with epsilon) sums to 1."""
    from rasr_tpu.lattice.flf import confusion_network, forward_backward

    for trial in range(4):
        lat = _random_lattice(rng)
        _, post = forward_backward(lat)
        slots, assign = confusion_network(lat, return_assignment=True)
        assert set(assign) == {ai for ai in range(len(lat.arcs)) if post[ai] > 0}
        for slot in slots:
            np.testing.assert_allclose(
                sum(p for _, p in slot.hypotheses), 1.0, atol=1e-6
            )


def test_cn_decode_beats_map_on_consensus():
    """The CN exists to decode by posterior consensus: three ways to say
    'X then something' each cost a bit more than the lone 'Y' path, so
    MAP picks Y but the X-consensus dominates the posterior. CN decode
    must recover X; MAP (best_path) must not."""
    from rasr_tpu.lattice.flf import best_path, cn_decode, confusion_network

    arcs = [
        LatticeArc(0, 1, 0, 1.5, 0.0),  # X (variant a)
        LatticeArc(0, 1, 0, 1.6, 0.0),  # X (variant b — e.g. other pron)
        LatticeArc(0, 2, 1, 1.0, 0.0),  # Y  <- on the single cheapest path
        LatticeArc(1, 3, 2, 0.1, 0.0),  # Z after X
        LatticeArc(2, 3, 3, 0.4, 0.0),  # W after Y
    ]
    lat = Lattice(
        num_nodes=4,
        arcs=arcs,
        node_time=np.array([0, 5, 5, 10], np.int32),
        final_scores={3: 0.0},
        lemma_orths=["X", "Y", "Z", "W"],
    )
    _, mp = best_path(lat)
    assert [lat.lemma_orths[a.lemma] for a in mp] == ["Y", "W"]
    slots = confusion_network(lat)
    assert cn_decode(slots) == ["X", "Z"]


def test_fcn_decode_minimizes_expected_frame_error(rng):
    """min-fWER decoding: the fCN decode's frame labeling has expected
    frame-level error <= the MAP path's, measured against the exact
    path posterior (brute-force enumeration)."""
    import itertools as _it
    import math as _math

    from rasr_tpu.lattice.flf import (
        best_path,
        fcn_decode,
        time_frame_cn,
    )

    for trial in range(6):
        lat = _random_lattice(rng, n_words=4, depth=4, branch=2)
        # brute-force path posterior
        out = lat.out_arcs()
        paths = []  # (cost, [(arc)...])

        def walk(node, cost, acc):
            if node in lat.final_scores:
                paths.append((cost + lat.final_scores[node], list(acc)))
            for ai in out[node]:
                a = lat.arcs[ai]
                acc.append(a)
                walk(a.to_node, cost + a.am_score + a.lm_score, acc)
                acc.pop()

        walk(0, 0.0, [])
        Z = sum(_math.exp(-c) for c, _ in paths)
        T = int(lat.node_time.max())

        def labeling(path_arcs):
            lab = [""] * T
            for a in path_arcs:
                s = int(lat.node_time[a.from_node])
                e = int(lat.node_time[a.to_node])
                for t in range(s, min(e, T)):
                    lab[t] = lat.lemma_orths[a.lemma]
            return lab

        def expected_frame_err(lab):
            err = 0.0
            for c, pa in paths:
                p = _math.exp(-c) / Z
                plab = labeling(pa)
                err += p * sum(1 for t in range(T) if plab[t] != lab[t])
            return err

        frames = time_frame_cn(lat)
        # fCN frame labeling: per-frame argmax (what fcn_decode collapses)
        flab = []
        for d in frames:
            w, p = "", 0.0
            for orth, q in d.items():
                if q > p:
                    w, p = orth, q
            flab.append(w)
        _, mp = best_path(lat)
        assert expected_frame_err(flab) <= expected_frame_err(labeling(mp)) + 1e-9
        # and the word sequence is the collapsed labeling
        want = [w for i, w in enumerate(flab) if w and (i == 0 or flab[i - 1] != w)]
        assert fcn_decode(frames) == want
