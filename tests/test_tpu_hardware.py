"""ON-CHIP hardware validation (opt-in: RASR_TPU_TEST_TPU=1).

The regular suite forces CPU (tests/conftest.py), where every copy is
bit-exact. Real TPU hardware is NOT: fused f32 relayouts flush
denormals and canonicalize NaNs, which silently corrupted the decoder's
packed-row transport while 240+ CPU tests passed (docs/PERF.md
"Bit-pattern transport"). These tests re-run the core exactness
contracts ON THE DEVICE JAX ACTUALLY SELECTED — under the axon TPU
hook that is the real chip. Run:

    RASR_TPU_TEST_TPU=1 python -m pytest tests/test_tpu_hardware.py -v

(bench.py's planted-decode canary covers the decoder on every driver
round; this file is the wider on-demand sweep.)
"""

import math
import os

import numpy as np
import pytest

if os.environ.get("RASR_TPU_TEST_TPU") != "1":
    pytest.skip(
        "on-chip tests are opt-in (RASR_TPU_TEST_TPU=1; conftest.py then "
        "leaves the axon TPU platform active)",
        allow_module_level=True,
    )

import jax
import jax.numpy as jnp

from rasr_tpu.corpus.lexicon import Lexicon, build_default_silence
from rasr_tpu.models.hmm import HmmTopology, Tdp, TransitionModel
from rasr_tpu.models.lm.arpa import NgramLm
from rasr_tpu.models.lm.ngram_tpu import compile_ngram, lookup_prepared, prepare_lookup
from rasr_tpu.models.tying import MonophoneStateTying
from rasr_tpu.search.decoder import BeamConfig, TreeDecoder
from rasr_tpu.search.tree import build_prefix_tree


def test_device_is_accelerator():
    # under the axon hook the default platform is the TPU; this suite
    # is pointless if something silently fell back to CPU
    assert jax.devices()[0].platform != "cpu", jax.devices()


def test_bit_pattern_transport():
    """int32 carriers preserve bit patterns through fused stack/gather/
    select; this is the invariant the decoder's packed rows rely on."""
    vals = np.array([-1, -2, 0, 3, 511, 56432, 2143289344], np.int32)
    floats = np.array([0.0, 1e30, -1.5, 3.25e-39, 7.0, 1e-40], np.float32)

    @jax.jit
    def f(xi, xf, idx):
        fb = jax.lax.bitcast_convert_type(xf, jnp.int32)
        rows = jnp.stack([xi, fb], axis=-1)
        g = rows[idx]
        sel = jnp.where((idx % 2 == 0)[:, None], g, g)
        return sel[:, 0], sel[:, 1]

    idx = np.arange(len(vals), dtype=np.int32)
    a, b = f(vals, np.resize(floats, len(vals)), idx)
    np.testing.assert_array_equal(np.asarray(a), vals)
    np.testing.assert_array_equal(
        np.asarray(b), np.resize(floats, len(vals)).view(np.int32)
    )


def _decoder_setup():
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
    return lex, topo, tying, trans, lm


@pytest.mark.parametrize("across", [False, True])
def test_decode_matches_host_reference(across):
    """Full decode on the chip must equal a pure-numpy host Viterbi over
    the SAME compiled network (exhaustive token passing, no pruning)."""
    lex, topo, tying, trans, lm = _decoder_setup()
    tables = compile_ngram(lm)
    tree = build_prefix_tree(
        lex, tying, topo, trans, lm_vocab=lm.vocab, across_word=across
    )
    rng = np.random.default_rng(17)
    T, M = 7, tying.num_classes
    emis = rng.uniform(0.0, 6.0, size=(1, T, M)).astype(np.float32)
    lm_scale = 0.7

    # ---- host reference: dense DP over (tree_state, lm_state) ----------
    S = tree.num_states
    arc = [[] for _ in range(S)]  # (dst, cost) incl. root arcs
    for s in range(S):
        for ai in range(tree.arc_ptr[s], tree.arc_ptr[s + 1]):
            arc[s].append((int(tree.arc_dst[ai]), float(tree.arc_cost[ai])))

    import collections

    BIGF = 1e30
    start_lm = tables.start_state
    cur = {(0, start_lm): 0.0}
    lm_cache = {}
    prep = prepare_lookup(tables)

    def lm_score(state, word):
        key = (state, int(word))
        if key not in lm_cache:
            c, n = lookup_prepared(
                tables, prep,
                jnp.asarray([state], jnp.int32), jnp.asarray([int(word)], jnp.int32),
            )
            lm_cache[key] = (float(np.asarray(c)[0]), int(np.asarray(n)[0]))
        return lm_cache[key]

    wmax = tree.max_word_ends
    we_next = (
        tree.we_next if tree.we_next is not None else np.zeros_like(tree.we_word)
    )
    for t in range(T):
        # expand: loops + arcs, add emission of the destination
        nxt = collections.defaultdict(lambda: BIGF)
        for (s, h), sc in cur.items():
            cands = [(s, sc + float(tree.loop_cost[s]))]
            for dst, cost in arc[s]:
                cands.append((dst, sc + cost))
            for dst, base in cands:
                if base >= BIGF / 2:
                    continue
                tot = base + float(emis[0, t, tree.emission_class[dst]])
                if tot < nxt[(dst, h)]:
                    nxt[(dst, h)] = tot
        # word ends -> re-entry
        for (s, h), sc in list(nxt.items()):
            for k in range(wmax):
                w = int(tree.we_word[s, k])
                if w == -1:
                    continue
                pre = sc + float(tree.we_cost[s, k])
                if pre >= BIGF / 2:
                    continue
                if w >= 0:
                    c, h2 = lm_score(h, w)
                    pre, hn = pre + lm_scale * c, h2
                else:
                    hn = h
                key = (int(we_next[s, k]), hn)
                if pre < nxt[key]:
                    nxt[key] = pre
        cur = dict(nxt)
    eosw = max(tables.end_word, 0)
    best_host = min(
        (
            sc + lm_scale * lm_score(h, eosw)[0]
            for (s, h), sc in cur.items()
            if s < tree.num_final_states and sc < BIGF / 2
        ),
        default=BIGF,
    )

    # ---- on-chip decode (pruning off) ----------------------------------
    dec = TreeDecoder(
        tree, tables,
        BeamConfig(max_hyps=512, beam=1e9, word_end_limit=128,
                   root_hyps=512, lm_scale=lm_scale),
    )
    (res,) = dec.decode_scores(emis, np.array([T]))
    np.testing.assert_allclose(res.score, best_host, rtol=1e-4, atol=1e-3)


def test_gmm_scorer_matches_numpy():
    from rasr_tpu.models.gmm import MixtureSet
    from rasr_tpu.models.scorer import GmmFeatureScorer

    rng = np.random.default_rng(3)
    M, K, D, B, T = 50, 4, 13, 2, 9
    ms = MixtureSet(
        means=rng.normal(size=(M, K, D)).astype(np.float32),
        variances=(0.5 + rng.uniform(size=(M, K, D))).astype(np.float32),
        weights=np.full((M, K), 1.0 / K, np.float32),
        num_densities=np.full(M, K, np.int32),
    )
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    got = np.asarray(GmmFeatureScorer(ms, max_approx=False)(x))
    # numpy oracle: -log sum_k w_k N(x; mu_k, diag sigma_k)
    x4 = x[:, :, None, None, :]
    mu = ms.means[None, None]
    var = ms.variances[None, None]
    logn = -0.5 * (
        np.sum(np.log(2 * np.pi * var), -1)
        + np.sum((x4 - mu) ** 2 / var, -1)
    )
    ref = -(
        np.log(np.sum(ms.weights[None, None] * np.exp(logn), -1))
    )
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_lm_lookup_matches_host():
    """Device hash-table lookup chain == host NgramLm over random
    sentences (full backoff + unigram dense-level path, on the chip)."""
    sents = [["A", "B", "C"], ["B", "C", "A"], ["C", "A", "B"], ["A", "B", "A"]]
    lm = NgramLm.train_from_text(sents, order=3)
    tables = compile_ngram(lm)
    prep = prepare_lookup(tables)
    rng = np.random.default_rng(5)
    vocab_words = ["A", "B", "C"]
    for _ in range(10):
        seq = [str(rng.choice(vocab_words)) for _ in range(5)]
        # host: incremental history walk
        h = lm.start_history()
        host_total = 0.0
        st = tables.start_state
        dev_total = 0.0
        for w in seq:
            wid = lm.vocab[w]
            host_total += lm.score(h, wid)
            h = lm.extended_history(h, wid)
            c, n = lookup_prepared(
                tables, prep,
                jnp.asarray([st], jnp.int32), jnp.asarray([wid], jnp.int32),
            )
            dev_total += float(np.asarray(c)[0])
            st = int(np.asarray(n)[0])
        np.testing.assert_allclose(dev_total, host_total, rtol=1e-5, atol=1e-5)


def test_frontend_matches_cpu_jit():
    """Same frontend program on device vs scipy-backed expectations is
    covered on CPU; here just assert finite, shape-correct output and
    agreement with a float64 numpy DFT power spectrum on one frame."""
    from rasr_tpu.ops.frontend import FeatureFrontend, FrontendConfig

    rng = np.random.default_rng(11)
    sr = 16000
    x = (rng.normal(size=(1, sr)) * 0.1).astype(np.float32)
    fe = FeatureFrontend(FrontendConfig())
    feats, nf = fe(x, np.array([sr]))
    feats = np.asarray(feats)
    assert np.isfinite(feats[0, : int(nf[0])]).all()
    assert feats.shape[-1] == fe.output_dim


def test_streaming_matches_offline_on_chip():
    """Online block-feed decode == offline whole-utterance decode ON THE
    DEVICE (the CPU tier proves the math; this proves the persistent
    beam carry + record concat + bucketed finalize survive the chip's
    relayout semantics — the bit-transport class of bug). Also exercises
    a mid-stream current_best() (the getCurrentBestSentence path)."""
    from rasr_tpu.search.streaming import StreamingDecoder

    lex, topo, tying, trans, lm = _decoder_setup()
    tables = compile_ngram(lm)
    tree = build_prefix_tree(lex, tying, topo, trans, lm_vocab=lm.vocab)
    rng = np.random.default_rng(23)
    B, T, M = 2, 24, tying.num_classes
    emis = rng.uniform(0.0, 6.0, size=(B, T, M)).astype(np.float32)
    nf = np.array([T, T - 5], np.int32)
    dec = TreeDecoder(
        tree, tables, BeamConfig(max_hyps=64, word_end_limit=16, lm_scale=0.8)
    )
    offline = dec.decode_scores(emis, nf)

    sd = StreamingDecoder(dec).restart(batch_size=B, n_frames=nf)
    for t in range(0, T, 8):
        sd.feed(emis[:, t : t + 8])
        partial = sd.current_best()
        assert len(partial) == B and all(np.isfinite(p.score) for p in partial)
    final = sd.finalize()
    for f, o in zip(final, offline):
        assert f.words == o.words, (f.words, o.words)
        assert abs(f.score - o.score) < 1e-3 * max(1.0, abs(o.score))


def test_decode_hlo_has_no_batch_offset_shuttle():
    """Compile-only pin for the flat iota//W row-offset idiom
    (decoder._row_offsets): any [B]-shaped offset form gets
    strength-reduced by XLA into a shared [B] iota fusion
    ("iota_multiply" in the compiled text) that is shuttled
    VMEM->HBM->VMEM between its distant consumers (~34us/frame at the
    headline shape, docs/PERF.md "[B] row-offset shuttle"). The helper
    keeps the offsets inside each gather's own index fusion; if this
    pin fires, some gather site reintroduced a [B]-shaped offset (or
    an XLA update re-factored the flat form — re-profile either way)."""
    from rasr_tpu.search.decoder import _decode_scan

    lex, topo, tying, trans, lm = _decoder_setup()
    tables = compile_ngram(lm)
    tree = build_prefix_tree(lex, tying, topo, trans, lm_vocab=lm.vocab)
    cfg = BeamConfig(max_hyps=1024, beam=1e9, word_end_limit=64,
                     root_hyps=16, branch_hyps=146, lm_scale=0.7)
    dec = TreeDecoder(tree, tables, cfg)
    B, T, M = 64, 16, tying.num_classes
    emis = jnp.zeros((B, T, M), jnp.float32)
    nf = jnp.full((B,), T, jnp.int32)
    kbranch = cfg.branch_hyps or cfg.max_hyps
    low = _decode_scan.lower(
        dec.tables, dec.lm, dec.lm_prep, emis, nf, dec.bla, dec.rnn,
        dec.cfg, dec.tree.max_word_ends,
        min(cfg.root_hyps, cfg.max_hyps), min(kbranch, cfg.max_hyps),
        None, 1, dec.tree.num_final_states,
    )
    text = low.compile().as_text()
    # Two detectors (r4 advisor: a bare compiler-generated fusion name can
    # drift across XLA versions):
    # (a) the fusion name XLA gave the strength-reduced offset when the
    #     regression was live ("iota_multiply");
    # (b) structural: any s32[64]-shaped value built from an iota that is
    #     an operand of a copy-start (the VMEM->HBM->VMEM shuttle is a
    #     copy-start/done pair on the shared [B] offset array — nf and
    #     other [B] ints don't mention iota on their defining line, so
    #     this doesn't false-positive on legitimate [B] copies).
    import re

    iota64 = {
        m.group(1)
        for m in re.finditer(r"%([\w.\-]+) = s32\[64\][^\n]*", text)
        if "iota" in m.group(0)
    }
    shuttled = [
        ln
        for ln in text.splitlines()
        if "copy-start" in ln and any(f"%{n}" in ln for n in iota64)
    ]
    assert "iota_multiply" not in text and not shuttled, (
        "a [B]-shaped gather row-offset came back — see "
        f"decoder._row_offsets and docs/PERF.md (structural hits: {shuttled[:2]})"
    )
