"""Across-word triphone search: exactness vs brute force.

The across-word network (search/tree.py::_build_across_word_tree) models
word-boundary triphone contexts exactly — context-conditioned roots plus
word-end right-context fan-out — instead of the within-word tree's ``#``
approximation (ref: across-word model support in the reference's
word-conditioned/advanced tree searches).

Properties tested:
* pruning off -> decoder score over the across-word network equals an
  exhaustive minimum over word sequences, each scored by forced
  alignment with TRUE cross-word contexts (align/graph.py across_word)
  plus the LM;
* with a context-INsensitive tying the across-word network must decode
  identically to the within-word tree (the contexts collapse);
* unigram-lookahead potential shaping stays exact on the multi-root
  network (root potentials are pinned — see tree.py);
* lattices and streaming work against multi-root finality.
"""

import itertools
import math

import numpy as np
import pytest

import jax.numpy as jnp

from rasr_tpu.align.graph import build_linear_graph
from rasr_tpu.corpus.lexicon import Lexicon, build_default_silence
from rasr_tpu.models.allophone import AllophoneState
from rasr_tpu.models.hmm import HmmTopology, Tdp, TransitionModel
from rasr_tpu.models.lm.arpa import NgramLm
from rasr_tpu.models.lm.ngram_tpu import compile_ngram
from rasr_tpu.models.tying import MonophoneStateTying, StateTying
from rasr_tpu.ops.viterbi import BIG, viterbi_align
from rasr_tpu.search.decoder import BeamConfig, TreeDecoder
from rasr_tpu.search.tree import build_prefix_tree



pytestmark = pytest.mark.slow  # full tier: pytest -m "" tests/

class InterningTriphoneTying(StateTying):
    """Context-SENSITIVE identity tying: every distinct
    (center, left, right, boundary, hmm-state) gets its own class."""

    def __init__(self):
        self.table = {}

    def classify(self, state: AllophoneState) -> int:
        a = state.allophone
        key = (a.center, a.left, a.right, a.boundary, state.state)
        return self.table.setdefault(key, len(self.table))

    @property
    def num_classes(self) -> int:
        return len(self.table)


@pytest.fixture(scope="module")
def xw_setup():
    lex = Lexicon()
    build_default_silence(lex)
    lex.add_lemma(["AB"], [(["a", "b"], 0.0)])
    lex.add_lemma(["BA"], [(["b", "a"], 0.0)])
    lex.add_lemma(["A"], [(["a"], 0.0)])  # single-phone: both contexts vary
    topo = HmmTopology(states_per_phone=1, silence_states=1)
    trans = TransitionModel(
        speech=Tdp(loop=1.0, forward=0.0, skip=math.inf, exit=0.5),
        silence=Tdp(loop=0.2, forward=0.5, skip=math.inf, exit=0.3),
    )
    lm = NgramLm.train_from_text(
        [["AB", "BA"], ["AB", "A"], ["BA", "AB"], ["A", "BA"], ["AB", "BA"]],
        order=2,
    )
    tables = compile_ngram(lm)
    tying = InterningTriphoneTying()
    tree = build_prefix_tree(
        lex, tying, topo, trans, lm_vocab=lm.vocab, across_word=True
    )
    return lex, topo, tying, trans, lm, tables, tree


def _oracle_best(lex, topo, tying, trans, lm, emissions, T, lm_scale, max_words=4):
    """Brute force: min over word sequences (with explicit silences) of
    cross-word forced-alignment cost + scaled LM cost + </s>."""
    words = ["AB", "BA", "A"]
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

    for n in range(1, max_words + 1):
        for seq in itertools.product(items, repeat=n):
            g = build_linear_graph(
                " ".join(seq), lex, tying, topo, trans,
                optional_silence=False, across_word=True,
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


def test_structure(xw_setup):
    lex, topo, tying, trans, lm, tables, tree = xw_setup
    assert tree.num_final_states == 2
    assert tree.we_next is not None
    # word ends re-enter context roots beyond the two final roots
    assert int(tree.we_next.max()) > 1
    # roots: 2 boundary + |F={a,b}| x |R={a,b}| context roots, non-emitting
    assert np.all(tree.loop_cost[:6] >= BIG / 2)


def test_crossword_context_graph(xw_setup):
    """Alignment graphs carry true junction contexts in across mode."""
    lex, topo, tying, trans, lm, tables, tree = xw_setup
    g = build_linear_graph(
        "AB BA", lex, tying, topo, trans,
        optional_silence=False, across_word=True,
    )
    # AB's final b sees right context b (BA's first); BA's first b sees
    # left context b (AB's final)
    a_b = g.states[1].allophone  # b of AB
    b_b = g.states[2].allophone  # b of BA
    pid_b = lex.phonemes["b"].id
    assert a_b.right == pid_b
    assert b_b.left == pid_b
    # within-word mode keeps # at the junction
    g0 = build_linear_graph(
        "AB BA", lex, tying, topo, trans, optional_silence=False
    )
    assert g0.states[1].allophone.right == 0


def test_crossword_exact_vs_oracle(xw_setup, rng=np.random.default_rng(7)):
    lex, topo, tying, trans, lm, tables, tree = xw_setup
    M = tying.num_classes
    T = 6
    lm_scale = 0.7
    dec = TreeDecoder(
        tree, tables,
        BeamConfig(max_hyps=512, beam=1e9, word_end_limit=128,
                   root_hyps=512, lm_scale=lm_scale),
    )
    for trial in range(3):
        emis = rng.uniform(0.0, 6.0, size=(1, T, M)).astype(np.float32)
        (res,) = dec.decode_scores(emis, np.array([T]))
        oracle_score, oracle_seq = _oracle_best(
            lex, topo, tying, trans, lm, emis, T, lm_scale
        )
        assert oracle_seq is not None
        np.testing.assert_allclose(res.score, oracle_score, rtol=1e-4, atol=1e-3)
        got = [l.primary_orth for l in res.lemmas]
        assert got == list(oracle_seq), (got, oracle_seq, trial)


def test_monophone_collapse_equals_within_word(xw_setup):
    """With context-insensitive tying the across-word network must decode
    exactly like the within-word tree."""
    lex, topo, _, trans, lm, tables, _ = xw_setup
    mono = MonophoneStateTying(lex, topo)
    t_in = build_prefix_tree(lex, mono, topo, trans, lm_vocab=lm.vocab)
    t_xw = build_prefix_tree(
        lex, mono, topo, trans, lm_vocab=lm.vocab, across_word=True
    )
    cfg = BeamConfig(max_hyps=512, beam=1e9, word_end_limit=128,
                     root_hyps=512, lm_scale=0.7)
    d_in = TreeDecoder(t_in, tables, cfg)
    d_xw = TreeDecoder(t_xw, tables, cfg)
    rng = np.random.default_rng(3)
    for _ in range(3):
        emis = rng.uniform(0.0, 6.0, size=(1, 7, mono.num_classes)).astype(np.float32)
        (a,) = d_in.decode_scores(emis, np.array([7]))
        (b,) = d_xw.decode_scores(emis, np.array([7]))
        np.testing.assert_allclose(a.score, b.score, rtol=1e-4, atol=1e-3)
        assert [l.primary_orth for l in a.lemmas] == [
            l.primary_orth for l in b.lemmas
        ]


def test_two_key_recombination_identical(xw_setup):
    """The two-key (state, lm) sort path — what production 4-gram
    decodes take when the packed int32 key overflows — must produce
    identical results to the packed-key path."""
    lex, topo, tying, trans, lm, tables, tree = xw_setup
    M = tying.num_classes
    rng = np.random.default_rng(21)
    base = dict(max_hyps=512, beam=1e9, word_end_limit=128,
                root_hyps=512, lm_scale=0.7)
    d_packed = TreeDecoder(tree, tables, BeamConfig(**base))
    d_twokey = TreeDecoder(
        tree, tables, BeamConfig(**base, force_unpacked_keys=True)
    )
    for _ in range(2):
        emis = rng.uniform(0.0, 6.0, size=(2, 7, M)).astype(np.float32)
        ra = d_packed.decode_scores(emis, np.array([7, 6]))
        rb = d_twokey.decode_scores(emis, np.array([7, 6]))
        for a, b in zip(ra, rb):
            np.testing.assert_allclose(a.score, b.score, rtol=1e-5)
            assert [l.primary_orth for l in a.lemmas] == [
                l.primary_orth for l in b.lemmas
            ]


def test_crossword_lookahead_exact(xw_setup):
    lex, topo, tying, trans, lm, tables, tree = xw_setup
    unigrams = {wid: lm.score((), wid) for wid in lm.vocab.values()}
    tree_la = build_prefix_tree(
        lex, tying, topo, trans, lm_vocab=lm.vocab,
        lm_unigrams=unigrams, across_word=True,
    )
    assert tree_la.lookahead is not None and np.any(tree_la.lookahead != 0)
    # all root potentials pinned equal (multi-root telescoping)
    nroots = int((tree_la.loop_cost >= BIG / 2).nonzero()[0].max()) + 1
    assert np.all(tree_la.lookahead[:6] == tree_la.lookahead[0])
    cfg = BeamConfig(max_hyps=512, beam=1e9, word_end_limit=128,
                     root_hyps=512, lm_scale=0.7)
    d0 = TreeDecoder(tree, tables, cfg)
    d1 = TreeDecoder(tree_la, tables, cfg)
    rng = np.random.default_rng(11)
    M = tying.num_classes
    for _ in range(2):
        emis = rng.uniform(0.0, 6.0, size=(1, 6, M)).astype(np.float32)
        (a,) = d0.decode_scores(emis, np.array([6]))
        (b,) = d1.decode_scores(emis, np.array([6]))
        np.testing.assert_allclose(a.score, b.score, rtol=1e-4, atol=1e-3)
        assert [l.primary_orth for l in a.lemmas] == [l.primary_orth for l in b.lemmas]


def test_crossword_production_paths_exact(xw_setup):
    """root_select + deferred_emission + lookahead (the production
    pruning machinery) on the multi-root across-word network: with caps
    covering every candidate the result must equal the plain config."""
    lex, topo, tying, trans, lm, tables, tree = xw_setup
    unigrams = {wid: lm.score((), wid) for wid in lm.vocab.values()}
    tree_la = build_prefix_tree(
        lex, tying, topo, trans, lm_vocab=lm.vocab,
        lm_unigrams=unigrams, across_word=True,
    )
    base = dict(max_hyps=512, beam=1e9, word_end_limit=128, lm_scale=0.7)
    d_plain = TreeDecoder(tree, tables, BeamConfig(**base, root_hyps=512))
    G = int(tree_la.arc_ptr[1] - tree_la.arc_ptr[0])
    d_prod = TreeDecoder(
        tree_la, tables,
        BeamConfig(
            **base, root_hyps=16, root_arc_limit=G, root_select=G + 15 * G,
            deferred_emission=True,
        ),
    )
    rng = np.random.default_rng(31)
    M = tying.num_classes
    for _ in range(2):
        emis = rng.uniform(0.0, 6.0, size=(1, 6, M)).astype(np.float32)
        (a,) = d_plain.decode_scores(emis, np.array([6]))
        (b,) = d_prod.decode_scores(emis, np.array([6]))
        np.testing.assert_allclose(a.score, b.score, rtol=1e-4, atol=1e-3)
        assert [l.primary_orth for l in a.lemmas] == [
            l.primary_orth for l in b.lemmas
        ]


def test_crossword_lattice_and_streaming(xw_setup):
    from rasr_tpu.lattice.lattice import decoder_lattice
    from rasr_tpu.search.streaming import StreamingDecoder

    lex, topo, tying, trans, lm, tables, tree = xw_setup
    M = tying.num_classes
    rng = np.random.default_rng(5)
    emis = rng.uniform(0.0, 6.0, size=(1, 6, M)).astype(np.float32)
    cfg = BeamConfig(max_hyps=512, beam=1e9, word_end_limit=128,
                     root_hyps=512, lm_scale=0.7)
    dec = TreeDecoder(tree, tables, cfg)
    (off,) = dec.decode_scores(emis, np.array([6]))
    lat = decoder_lattice(dec, 0)
    # the decoded best path exists in the lattice with the same score
    assert lat.final_scores, "lattice must have final nodes"
    # streaming in two blocks == offline
    sd = StreamingDecoder(dec)
    sd.restart(batch_size=1, n_frames=np.array([6]))
    sd.feed(emis[:, :3])
    sd.feed(emis[:, 3:])
    (st,) = sd.finalize()
    np.testing.assert_allclose(st.score, off.score, rtol=1e-4)
    assert [l.primary_orth for l in st.lemmas] == [
        l.primary_orth for l in off.lemmas
    ]


def test_across_word_improves_wer_on_coarticulated_corpus():
    """The accuracy case for across-word modeling: on a corpus whose
    phone boundaries coarticulate with the NEIGHBORING WORD's phone,
    within-word ``#`` contexts lump all boundary realizations into one
    class and make word errors; exact across-word contexts separate
    them. Mirrors the reference's motivation for across-word models."""
    from rasr_tpu.lattice.evaluator import EditStats, align_tokens
    from rasr_tpu.models.gmm import MixtureSet
    from rasr_tpu.models.scorer import GmmFeatureScorer
    from rasr_tpu.train.em import GmmAccumulator, accumulate, estimate

    rng = np.random.default_rng(123)
    lex = Lexicon()
    for p in ("a", "b"):
        lex.phonemes.add(p)
    lex.add_lemma(["A"], [(["a"], 0.0)])
    lex.add_lemma(["B"], [(["b"], 0.0)])
    topo = HmmTopology(states_per_phone=2, silence_states=1)
    trans = TransitionModel(
        speech=Tdp(loop=0.7, forward=0.7, skip=math.inf, exit=0.0)
    )
    tying = InterningTriphoneTying()
    base = {"a": 1.0, "b": -1.0}
    FP, BLEND, NOISE, D = 4, 0.6, 0.35, 2

    def synth(words, across):
        """Frames + per-frame tied-class labels for one utterance.
        Acoustics ALWAYS coarticulate across words; `across` only
        selects which LABELS (context expansion) the model trains on."""
        alphabet = lex.phonemes
        phones = [("a" if w == "A" else "b") for w in words]
        feats, labels = [], []
        for i, ph in enumerate(phones):
            left = phones[i - 1] if i > 0 else None
            right = phones[i + 1] if i + 1 < len(phones) else None
            lab_l = left if across else None
            lab_r = right if across else None
            from rasr_tpu.models.allophone import Allophone, AllophoneState
            from rasr_tpu.models.allophone import FLAG_FINAL, FLAG_INITIAL

            allo = Allophone(
                alphabet[ph].id,
                alphabet[lab_l].id if lab_l else 0,
                alphabet[lab_r].id if lab_r else 0,
                FLAG_INITIAL | FLAG_FINAL,  # single-phone words
            )
            cls01 = [tying.classify(AllophoneState(allo, s)) for s in (0, 1)]
            for j in range(FP):
                v = base[ph]
                if j == 0 and left is not None:
                    v = (1 - BLEND) * v + BLEND * base[left]
                elif j == FP - 1 and right is not None:
                    v = (1 - BLEND) * v + BLEND * base[right]
                feats.append([v + NOISE * rng.standard_normal(), 0.0])
                labels.append(cls01[0] if j < FP // 2 else cls01[1])
        return np.asarray(feats, np.float32), np.asarray(labels, np.int32)

    utts = [
        [rng.choice(["A", "B"]) for _ in range(int(rng.integers(3, 6)))]
        for _ in range(40)
    ]
    data = {True: [], False: []}
    for words in utts:
        st = rng.bit_generator.state
        for across in (True, False):
            rng.bit_generator.state = st  # identical noise both ways
            data[across].append((words, *synth(words, across)))

    lm = NgramLm.train_from_text(
        [["A", "B"], ["B", "A"], ["A", "A"], ["B", "B"]], order=2
    )
    tables = compile_ngram(lm)
    # build BOTH networks before sizing the models: the tree compilers
    # intern context combinations the training data never produced
    # (e.g. utterance-edge contexts), and the scorer matrix must cover
    # every emission class the networks reference
    trees = {
        a: build_prefix_tree(
            lex, tying, topo, trans, lm_vocab=lm.vocab, across_word=a
        )
        for a in (False, True)
    }
    M = tying.num_classes

    def train_and_decode(across):
        unit = MixtureSet(
            means=np.zeros((M, 1, D), np.float32),
            variances=np.ones((M, 1, D), np.float32),
            weights=np.ones((M, 1), np.float32),
            num_densities=np.ones(M, np.int32),
        )
        acc = GmmAccumulator.zeros(M, 1, D)
        for _, f, l in data[across]:
            accumulate(acc, unit, f, l)
        model = estimate(acc, prev=unit)
        # lm_scale=1.0 is each condition's tuned optimum (verified over
        # {0.5, 1, 2, 4, 8}; the LM is near-uniform, so the scale acts
        # as the word-insertion penalty)
        dec = TreeDecoder(
            trees[across], tables,
            BeamConfig(max_hyps=256, word_end_limit=64, root_hyps=256,
                       lm_scale=1.0),
        )
        scorer = GmmFeatureScorer(model)
        stats = EditStats()
        for words, f, _ in data[across]:
            emis = np.asarray(scorer(f[None]))
            (res,) = dec.decode_scores(emis, np.array([f.shape[0]]))
            hyp = [l.primary_orth for l in res.lemmas]
            seg, _ = align_tokens(words, hyp)
            stats.add(seg)
        return stats.wer

    wer_within = train_and_decode(False)
    wer_across = train_and_decode(True)
    # the within-word # approximation makes real word errors here
    # (repeated single-phone words recombine — their only acoustic
    # discriminator IS the cross-word glide); the across-word network
    # roughly halves the WER (measured 0.196 vs 0.362 at this seed)
    assert wer_within > 0.25, f"corpus too easy (within WER {wer_within})"
    assert wer_across < wer_within * 0.65, (wer_across, wer_within)


def test_homophones_stack_word_ends_exactly():
    """Homophone lemmas (identical pronunciation) stack word-end slots
    on one state (wmax > 1) — exercising the decoder's two-stage
    word-end selection — and must decode exactly: every homophone's LM
    score is considered and the best-scoring one wins."""
    lex = Lexicon()
    build_default_silence(lex)
    lex.add_lemma(["AB"], [(["a", "b"], 0.0)])
    lex.add_lemma(["AB2"], [(["a", "b"], 0.0)])  # homophone of AB
    lex.add_lemma(["BA"], [(["b", "a"], 0.0)])
    topo = HmmTopology(states_per_phone=1, silence_states=1)
    trans = TransitionModel(
        speech=Tdp(loop=1.0, forward=0.0, skip=math.inf, exit=0.5),
        silence=Tdp(loop=0.2, forward=0.5, skip=math.inf, exit=0.3),
    )
    tying = MonophoneStateTying(lex, topo)
    # LM strongly prefers AB2 over AB
    lm = NgramLm.train_from_text(
        [["AB2", "BA"]] * 6 + [["AB", "BA"]], order=2
    )
    tables = compile_ngram(lm)
    tree = build_prefix_tree(lex, tying, topo, trans, lm_vocab=lm.vocab)
    assert tree.max_word_ends >= 2  # the homophones stack
    dec = TreeDecoder(
        tree, tables,
        BeamConfig(max_hyps=256, beam=1e9, word_end_limit=64,
                   root_hyps=256, lm_scale=2.0),
    )
    rng = np.random.default_rng(2)
    M = tying.num_classes
    # brute force over word sequences incl. BOTH homophones
    from rasr_tpu.align.graph import build_linear_graph as _blg

    def oracle(emis, T):
        best = (np.inf, None)
        words = ["AB", "AB2", "BA"]
        eos = lm.vocab["</s>"]
        for n in range(1, 4):
            for seq in itertools.product(words + ["[SILENCE]"], repeat=n):
                g = _blg(" ".join(seq), lex, tying, topo, trans,
                         optional_silence=False)
                if g.num_states > T:
                    continue
                e = emis[:, :, g.emission_ids]
                cost, _ = viterbi_align(
                    jnp.asarray(e), jnp.asarray(g.loop[None]),
                    jnp.asarray(g.fwd[None]), jnp.asarray(g.skip[None]),
                    jnp.asarray(g.init[None]), jnp.asarray(g.final[None]),
                    jnp.asarray([T]),
                )
                h = lm.start_history()
                c = 0.0
                for w in seq:
                    if w == "[SILENCE]":
                        continue
                    wid = lm.vocab[w]
                    c += 2.0 * lm.score(h, wid)
                    h = lm.extended_history(h, wid)
                c += 2.0 * lm.score(h, eos)
                total = float(np.asarray(cost)[0]) + c
                if total < best[0]:
                    best = (total, seq)
        return best

    for trial in range(3):
        emis = rng.uniform(0.0, 6.0, size=(1, 6, M)).astype(np.float32)
        (res,) = dec.decode_scores(emis, np.array([6]))
        oscore, oseq = oracle(emis, 6)
        np.testing.assert_allclose(res.score, oscore, rtol=1e-4, atol=1e-3)
        assert [l.primary_orth for l in res.lemmas] == list(oseq), trial


def test_tree_image_roundtrip_crossword(xw_setup, tmp_path):
    from rasr_tpu.search.tree import load_tree, save_tree

    lex, topo, tying, trans, lm, tables, tree = xw_setup
    p = str(tmp_path / "xw_tree.npz")
    save_tree(tree, p)
    t2 = load_tree(p, lex)
    assert t2.num_final_states == 2
    np.testing.assert_array_equal(t2.we_next, tree.we_next)
    np.testing.assert_array_equal(t2.emission_class, tree.emission_class)


class _RandomGroupTying(StateTying):
    """CART-like random context resolution: left/right contexts collapse
    into a random small number of groups per side (1 group == context-
    insensitive on that side), boundary flags kept. Exercises the
    across-word builder's right-context signature GROUPING (one word-end
    copy per group, grouped re-entry roots) at resolutions between the
    identity tying and monophone collapse."""

    def __init__(self, rng, num_phones: int):
        self.table = {}
        # phone id 0 is the no-context marker; group it alone
        self.lgroup = {0: 0}
        self.rgroup = {0: 0}
        nl = int(rng.integers(1, 3))
        nr = int(rng.integers(1, 3))
        for p in range(1, num_phones + 2):
            self.lgroup[p] = 1 + int(rng.integers(nl))
            self.rgroup[p] = 1 + int(rng.integers(nr))

    def classify(self, state: AllophoneState) -> int:
        a = state.allophone
        key = (a.center, self.lgroup.get(a.left, 0), self.rgroup.get(a.right, 0),
               a.boundary, state.state)
        return self.table.setdefault(key, len(self.table))

    @property
    def num_classes(self) -> int:
        return len(self.table)


@pytest.mark.parametrize("seed", [3, 14, 25, 36])
def test_crossword_fuzz_exact(seed):
    """Randomized across-word exactness: random lexicon/TDPs/LM and a
    random context-resolution tying; pruning-off decode over the
    across-word network == exhaustive minimum over token sequences with
    TRUE cross-word contexts (batched banded-Viterbi oracle)."""
    rng = np.random.default_rng(seed)
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
    spp = int(rng.integers(1, 3))
    topo = HmmTopology(states_per_phone=spp, silence_states=1)
    finite_skip = bool(rng.integers(2))
    trans = TransitionModel(
        speech=Tdp(loop=float(rng.uniform(0.1, 1.5)),
                   forward=float(rng.uniform(0.0, 0.5)),
                   skip=float(rng.uniform(0.5, 3.0)) if finite_skip else math.inf,
                   exit=float(rng.uniform(0.0, 1.0))),
        silence=Tdp(loop=float(rng.uniform(0.1, 0.5)),
                    forward=float(rng.uniform(0.0, 0.8)),
                    skip=math.inf, exit=float(rng.uniform(0.0, 0.5))),
    )
    sents = [
        [orths[int(rng.integers(n_words))] for _ in range(int(rng.integers(1, 4)))]
        for _ in range(6)
    ]
    lm = NgramLm.train_from_text(sents, order=2)
    tables = compile_ngram(lm)
    tying = (
        InterningTriphoneTying() if rng.uniform() < 0.5
        else _RandomGroupTying(rng, len(lex.phonemes))
    )
    tree = build_prefix_tree(
        lex, tying, topo, trans, lm_vocab=lm.vocab, across_word=True,
        lm_unigrams={wid: lm.score((), wid) for wid in lm.vocab.values()},
    )

    M = tying.num_classes
    T = int(rng.integers(5, 7))
    lm_scale = float(rng.uniform(0.3, 1.5))
    emis = rng.uniform(0.0, 6.0, size=(1, T, M)).astype(np.float32)
    cfg = BeamConfig(max_hyps=1024, beam=1e9, word_end_limit=256,
                     root_hyps=1024, lm_scale=lm_scale,
                     lookahead_scale=float(rng.uniform(0.2, 1.0)),
                     deferred_emission=bool(rng.integers(2)))
    dec = TreeDecoder(tree, tables, cfg)
    (res,) = dec.decode_scores(emis, np.array([T]))
    # word-set bigram shaping on the across-word network must cancel
    # exactly (random tying/TDPs/scales fuzz the crossing-delta and
    # carried-phi machinery)
    from rasr_tpu.search.lookahead import build_bigram_lookahead

    bla = build_bigram_lookahead(tree, lm, num_classes=int(rng.integers(2, 6)))
    assert bla is not None
    (res_bla,) = TreeDecoder(tree, tables, cfg, bigram_la=bla).decode_scores(
        emis, np.array([T])
    )
    np.testing.assert_allclose(res_bla.score, res.score, rtol=1e-4, atol=1e-3)
    assert [l.primary_orth for l in res_bla.lemmas] == [
        l.primary_orth for l in res.lemmas
    ]

    # ---- batched oracle over all sequences reachable in T frames
    items = orths + ["[SILENCE]"]
    eos = lm.vocab["</s>"]
    pron_score = {l.primary_orth: l.pronunciations[0].score for l in lex.lemmata}
    from tests.test_decoder_fuzz import _min_frames

    min_len = {
        it: _min_frames(
            build_linear_graph(it, lex, tying, topo, trans,
                               optional_silence=False)
        )
        for it in items
    }

    def lm_cost_of(seq):
        h = lm.start_history()
        c = sum(pron_score[w] for w in seq)
        for w in seq:
            if w == "[SILENCE]":
                continue
            wid = lm.vocab.get(w)
            if wid is None:
                # lexicon word absent from the tiny random training
                # text (no <unk>): the network scores it as a no-LM
                # word — zero cost, history unchanged (tree.py
                # _lm_word_of). Mirror that here.
                continue
            c += lm_scale * lm.score(h, wid)
            h = lm.extended_history(h, wid)
        return c + lm_scale * lm.score(h, eos)

    seqs, graphs = [], []
    for n in range(1, T + 1):
        for seq in itertools.product(items, repeat=n):
            if sum(min_len[w] for w in seq) > T:
                continue
            g = build_linear_graph(
                " ".join(seq), lex, tying, topo, trans,
                optional_silence=False, across_word=True,
            )
            seqs.append(seq)
            graphs.append(g)
    S = max(g.num_states for g in graphs)
    N = len(graphs)
    oemis = np.full((N, T, S), BIG, np.float32)
    arrs = {k: np.full((N, S), BIG, np.float32)
            for k in ("loop", "fwd", "skip", "init", "final")}
    for i, g in enumerate(graphs):
        n = g.num_states
        oemis[i, :, :n] = emis[0][:, g.emission_ids]
        for k in arrs:
            arrs[k][i, :n] = getattr(g, k)
    cost, _ = viterbi_align(
        jnp.asarray(oemis), jnp.asarray(arrs["loop"]), jnp.asarray(arrs["fwd"]),
        jnp.asarray(arrs["skip"]), jnp.asarray(arrs["init"]),
        jnp.asarray(arrs["final"]), jnp.asarray(np.full(N, T, np.int32)),
    )
    cost = np.asarray(cost)
    best = (np.inf, None)
    for i, seq in enumerate(seqs):
        total = float(cost[i]) + lm_cost_of(seq)
        if total < best[0]:
            best = (total, seq)
    got = [l.primary_orth for l in res.lemmas]
    np.testing.assert_allclose(res.score, best[0], rtol=1e-4, atol=1e-3)
    assert got == list(best[1]), (got, best[1], seed)
