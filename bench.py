"""Benchmark: full decode pipeline throughput on one chip.

Measures audio-seconds decoded per wall second per chip for the complete
pipeline — MFCC/LDA frontend -> dense GMM emission scoring -> prefix-tree
beam decode with bigram LM — on a realistic synthetic setup (5k-word
lexicon, 2k tied states with 8 densities each, 45-dim LDA features).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 50 (BASELINE.json north-star: >=50x real time per
chip on LibriSpeech test-clean; real-data parity pending corpus access —
the synthetic load matches the compute shape: same frame rate, feature
dims, inventory sizes, beam widths).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# persistent compilation cache: remote TPU compiles take minutes and vary
# wildly; cached executables make repeated bench runs start in seconds
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def build_setup(
    num_words=5000,
    num_phones=40,
    num_classes=2000,
    densities=8,
    feat_dim=45,
    seed=0,
):
    import jax

    from rasr_tpu.corpus.lexicon import Lexicon, build_default_silence
    from rasr_tpu.models.gmm import MixtureSet
    from rasr_tpu.models.hmm import HmmTopology, TransitionModel
    from rasr_tpu.models.lm.arpa import NgramLm
    from rasr_tpu.models.lm.ngram_tpu import compile_ngram
    from rasr_tpu.models.scorer import GmmFeatureScorer
    from rasr_tpu.models.tying import CartStateTying, StateTying
    from rasr_tpu.ops.frontend import FeatureFrontend, FrontendConfig
    from rasr_tpu.search.decoder import BeamConfig, TreeDecoder
    from rasr_tpu.search.tree import build_prefix_tree

    rng = np.random.default_rng(seed)
    lex = Lexicon()
    build_default_silence(lex)
    phones = [f"p{i}" for i in range(num_phones)]
    for p in phones:
        lex.phonemes.add(p)
    seen = set()
    for w in range(num_words):
        length = int(rng.integers(2, 8))
        pron = tuple(rng.choice(phones, size=length))
        if pron in seen:
            continue
        seen.add(pron)
        lex.add_lemma([f"w{w}"], [(list(pron), 0.0)])

    topology = HmmTopology(states_per_phone=3, silence_states=1)

    class HashTying(StateTying):
        """Pseudo-CART: deterministic hash of (allophone, state) to
        num_classes tied classes (same compute shape as CART tying).

        ``ctx_groups`` quantizes left/right context phones into that
        many groups before hashing — a realistic CART collapses most
        contexts this way. 0 = fully context-distinct (the worst case
        for the across-word network's size: BENCH_CTX_GROUPS knob)."""

        def __init__(self, n, ctx_groups=0):
            self.num_classes = n
            self.g = ctx_groups

        def _ctx(self, p):
            return (1 + p % self.g) if (self.g and p) else p

        def classify(self, state):
            al = state.allophone
            left, right = self._ctx(al.left), self._ctx(al.right)
            h = (al.center * 73856093) ^ (left * 19349663) ^ (right * 83492791) ^ (state.state * 2971215073)
            return 1 + (h % (self.num_classes - 1))

    tying = HashTying(
        num_classes, ctx_groups=int(os.environ.get("BENCH_CTX_GROUPS", "0"))
    )

    # n-gram LM over the word vocab (BENCH_LM_ORDER: 2 = classic bigram
    # decode; 4 = production 4-gram shape — the LM state space outgrows
    # the packed-int32 recombination key, so the decoder's two-key sort
    # path and the deeper backoff-probe chain are what's measured)
    order = int(os.environ.get("BENCH_LM_ORDER", "2"))
    vocab = {"<s>": 0, "</s>": 1, "<unk>": 2}
    for lemma in lex.lemmata:
        if lemma.special:
            continue
        vocab.setdefault(lemma.primary_orth, len(vocab))
    ngrams = {}
    for w, i in vocab.items():
        ngrams[(i,)] = (float(rng.uniform(5, 12)), float(rng.uniform(0.2, 2.0)))
    ids = np.asarray(list(vocab.values()))
    for _ in range(num_words * 12):
        a, b = rng.choice(ids), rng.choice(ids)
        ngrams[(int(a), int(b))] = (float(rng.uniform(2, 9)), 0.0)
    for k in range(3, order + 1):
        # higher orders: extend existing (k-1)-grams so prefix closure
        # holds; contexts get backoff weights (they become LM states)
        prev = [g for g in ngrams if len(g) == k - 1]
        picks = rng.integers(0, len(prev), size=num_words * 8)
        for pi in picks:
            g = prev[int(pi)]
            w = int(rng.choice(ids))
            ngrams[g + (w,)] = (float(rng.uniform(1, 7)), 0.0)
            if g in ngrams and ngrams[g][1] == 0.0:
                ngrams[g] = (ngrams[g][0], float(rng.uniform(0.2, 1.5)))
    lm = NgramLm(order, vocab, ngrams)
    tables = compile_ngram(lm)

    unigrams = {wid: ngrams[(wid,)][0] for wid in vocab.values()}
    # BENCH_NET_CACHE=<path.npz>: search-network image cache (the
    # across-word worst case compiles a 25.8M-state network host-side —
    # minutes; the image loads in seconds). The caller keys the path by
    # config; a lexicon mismatch raises at load.
    net_cache = os.environ.get("BENCH_NET_CACHE", "")
    tree = None
    if net_cache and os.path.exists(net_cache):
        from rasr_tpu.search.tree import load_tree

        tree = load_tree(net_cache, lex)
        sys.stderr.write(f"[bench] network image loaded: {net_cache}\n")
    if tree is None:
        tree = build_prefix_tree(
            lex, tying, topology, TransitionModel(), lm_vocab=vocab,
            lm_unigrams=unigrams,
            # BENCH_ACROSS=1: the across-word network (exact word-boundary
            # triphone contexts; context roots + word-end fan-out)
            across_word=bool(int(os.environ.get("BENCH_ACROSS", "0"))),
            # "phone" pins the historical benchmark network (skips within
            # phones only) so headline numbers stay comparable across rounds;
            # skip_scope="word" additionally realizes the default TDPs'
            # finite cross-phone skips (the faithful production topology —
            # junction fan-out grows, widening the branch sections; measured
            # numbers for both scopes are in docs/PERF.md)
            skip_scope=os.environ.get("BENCH_SKIP_SCOPE", "phone"),
        )
        if net_cache:
            from rasr_tpu.search.tree import save_tree

            save_tree(tree, net_cache)
            sys.stderr.write(f"[bench] network image saved: {net_cache}\n")

    # BENCH_LA_ORDER=2: word-set bigram lookahead shaping in the timed
    # decode (the VERDICT r1 done-criterion: enabled overhead < 5%);
    # BENCH_LA_CLASSES bounds the history-class table height
    bla = None
    if int(os.environ.get("BENCH_LA_ORDER", "1")) >= 2:
        from rasr_tpu.search.lookahead import build_bigram_lookahead

        t_la = time.time()
        bla = build_bigram_lookahead(
            tree, lm,
            num_classes=int(os.environ.get("BENCH_LA_CLASSES", "64")),
            # 3 = trigram (last-two-word pair) anchors — only
            # meaningful with BENCH_LM_ORDER >= 3
            order=min(int(os.environ.get("BENCH_LA_ORDER", "2")), 3),
            smooth=float(os.environ.get("BENCH_LA_SMOOTH", "0.0")),
        )
        assert bla is not None, "bigram lookahead unsupported for this network"
        sys.stderr.write(
            f"[bench] bigram lookahead build {time.time()-t_la:.1f}s "
            f"(nodes={bla.num_subtrees}, classes={bla.num_classes}, "
            f"corr_table={bla.corr.nbytes/1e6:.1f}MB)\n"
        )

    if os.environ.get("BENCH_SCORER", "gmm") == "conformer":
        # hybrid conformer acoustic model at production size (d=512,
        # 12 blocks, bf16 gemms) — the "config 5" modern pipeline
        import jax as _jax
        import jax.numpy as _jnp

        from rasr_tpu.models.nn import ConformerEncoderNet, NnHybridScorer, StatePriors

        net = ConformerEncoderNet(
            num_classes=num_classes, d_model=512, num_blocks=12, num_heads=8,
            compute_dtype=os.environ.get("BENCH_NN_DTYPE", "bfloat16"),
        )
        params = net.init(
            _jax.random.PRNGKey(0), _jnp.zeros((1, 8, feat_dim), _jnp.float32)
        )["params"]
        priors = StatePriors.from_counts(
            rng.uniform(1, 10, size=num_classes).astype(np.float32)
        )
        scorer = NnHybridScorer(net, params, priors, scale=10.0)
    else:
        ms = MixtureSet(
            means=rng.normal(size=(num_classes, densities, feat_dim)).astype(np.float32),
            variances=(0.5 + rng.uniform(size=(num_classes, densities, feat_dim))).astype(np.float32),
            weights=np.full((num_classes, densities), 1.0 / densities, np.float32),
            num_densities=np.full(num_classes, densities, np.int32),
        )
        scorer = GmmFeatureScorer(ms, scale=1.0)

    lda = (rng.normal(size=(16 * 9, feat_dim)) * 0.1).astype(np.float32)
    fe = FeatureFrontend(FrontendConfig(), splice_context=4, lda=lda)
    K_bench = int(os.environ.get("BENCH_MAX_HYPS", "1024"))
    kb_bench = int(os.environ.get("BENCH_BRANCH_HYPS", "146"))
    bw = int(os.environ.get("BENCH_BRANCH_WIDTH", "-1"))
    if bw < 0:  # auto: keep the main sorts at/under the 4096 pad
        _deg = tree.arc_ptr[1:] - tree.arc_ptr[:-1]
        db_est = int(max(int((_deg[1:] - 2).max()), 1)) if _deg.size > 1 else 1
        budget = max(4096 - 3 * K_bench, 256) - 2
        bw = 0 if kb_bench * db_est <= budget + 2 else budget
    dec = TreeDecoder(
        tree, tables,
        bigram_la=bla,
        cfg=BeamConfig(
            max_hyps=K_bench,
            beam=1e9,
            word_end_limit=int(os.environ.get("BENCH_WORD_END", "64")),
            root_hyps=int(os.environ.get("BENCH_ROOT_HYPS", "16")),
            # XLA's TPU sort pads the sorted dim to the next power of 2,
            # so candidate-section budgets are chosen to land every sort
            # at or under a pad boundary (HLO-profiled: a 4864-wide sort
            # costs the same as an 8192-wide one). Here: main sorts
            # 3*1024 + 146*7 = 4094 <= 4096; root-select sort
            # 1537 + 15*160 = 3937 <= 4096. 220 -> 316 audio-s/s.
            branch_hyps=kb_bench,
            # compact branch expansion: pack the selected hyps' overflow
            # arcs contiguously into a static slot budget instead of the
            # padded [branch_hyps, max_degree] fan. Essential on networks
            # with high max branch degree (word-scope skips: Db=16;
            # across-word grouped roots: Db=45+) where the dense fan
            # blows the 4096 sort-pad budget; on the headline network
            # (Db=7, mean degree 2) 1022 slots hold MORE arcs than the
            # dense fan's 146 hyps while keeping 3*1024 + 1022 = 4094.
            # AUTO (-1, the default): dense fan while it fits the 4096
            # sort-pad budget, else compact slots. Large vocabularies
            # grow the max branch degree (Db=37 at 100k words) and the
            # dense fan blew the recombination sorts to width 8474 ->
            # pad 16384 (866+776us/frame profiled, 2026-08-21) plus a
            # [B, Kb*Db] branch gather (463us + 236us relayout) — the
            # single biggest large-vocab cliff, and exactly what the
            # compact expansion was built for.
            branch_width=bw,
            root_arc_limit=int(os.environ.get("BENCH_ROOT_CAP", "160")),
            # exact expansion by default: with the row-form emission
            # gather (search/decoder.py fsel) the pre-emission top-E
            # stage no longer pays for itself (125.6 vs 126.0 audio-s/s
            # measured) — so keep the search exact
            expansion_limit=int(os.environ.get("BENCH_EXPANSION", "0")),
            # word-start survivors per frame: pre-emission top-R3 over
            # the root fan-out, keeping the full fan-out OUT of the main
            # recombination sorts (half their width at these settings)
            root_select=int(os.environ.get("BENCH_ROOT_SELECT", "512")),
            # survivors-only emission gather (pre-emission top-K)
            deferred_emission=bool(int(os.environ.get("BENCH_DEFER", "1"))),
            # frame-loop unroll (cross-frame fusion of dispatch/layout slop)
            scan_unroll=int(os.environ.get("BENCH_UNROLL", "1")),
            # "survivor" = the reference's lazy lookahead activation
            # (with BENCH_LA_ORDER=2; NOT exact — see BeamConfig)
            lookahead_update=os.environ.get("BENCH_LA_UPDATE", "arc"),
            lm_scale=10.0,
        ),
    )
    return fe, scorer, dec, tree


def correctness_canary():
    """Tiny planted decodes asserted ON THE REAL DEVICE before timing.

    The CPU test suite cannot catch TPU-only corruption (the hardware
    flushes denormal/NaN bit patterns in fused f32 relayouts — see
    docs/PERF.md "Bit-pattern transport"; exactly such a bug silently
    corrupted the decoder beam on-chip while 240+ CPU tests passed).
    The driver runs bench.py on real hardware every round, so this
    canary is the standing on-chip correctness gate.

    Two layers:
    1. planted decodes (absolute answers) for the timed bench's configs;
    2. CPU-vs-TPU cross-backend equality for every packed int32-carrier
       transport path the bench does NOT time: the across-word network
       (grouped roots + we_next re-entry), the 4-gram two-key
       recombination sort, word-set bigram lookahead (pair columns +
       quarter-row class/corr gathers), and RNN fusion (f32 state ring
       + fused word-end costs). The same decode must produce identical
       words and near-identical scores on both backends — any on-chip
       transport corruption breaks the equality.
    """
    import numpy as np

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
    tables = compile_ngram(lm)
    # plant: sil sil a a b b  -> [SILENCE] AB
    from rasr_tpu.models.allophone import Allophone, AllophoneState

    cls_of = lambda sym: tying.classify(
        AllophoneState(Allophone(lex.phonemes[sym].id), 0)
    )
    seq = [cls_of("si")] * 2 + [cls_of("a")] * 2 + [cls_of("b")] * 2
    emis = np.full((1, len(seq), tying.num_classes), 50.0, np.float32)
    for t, c in enumerate(seq):
        emis[0, t, c] = 0.0
    # plain config AND the production pruning paths the timed bench uses
    # (root_select + deferred_emission + branch/root caps) must both
    # produce the planted answer on-chip
    for cfg in (
        BeamConfig(max_hyps=64, word_end_limit=16, lm_scale=0.5),
        BeamConfig(max_hyps=64, word_end_limit=16, lm_scale=0.5,
                   root_hyps=4, root_select=8, root_arc_limit=2,
                   branch_hyps=16, deferred_emission=True),
    ):
        dec = TreeDecoder(tree, tables, cfg)
        (res,) = dec.decode_scores(emis, np.array([len(seq)]))
        got = [l.primary_orth for l in res.lemmas]
        assert got == ["[SILENCE]", "AB"], f"ON-DEVICE CANARY FAILED: {got}"
        assert res.word_ends == [1, 5], f"ON-DEVICE CANARY FAILED: {res.word_ends}"
    sys.stderr.write("canary ok: [SILENCE] AB @ [1, 5] (plain + rsel/defer)\n")
    _cross_backend_canary()


def _cross_backend_canary():
    """CPU-vs-TPU decode equality on the untimed transport paths (the
    axon image exposes a CPU backend next to the chip, so the CPU
    result is an in-process oracle). Skips silently when only one
    backend exists (pure-CPU dev runs)."""
    import jax
    import numpy as np

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return
    if jax.devices()[0].platform == "cpu":
        return  # no accelerator: nothing to cross-check

    from rasr_tpu.corpus.lexicon import Lexicon, build_default_silence
    from rasr_tpu.models.hmm import HmmTopology, TransitionModel
    from rasr_tpu.models.lm.arpa import NgramLm
    from rasr_tpu.models.lm.ngram_tpu import compile_ngram
    from rasr_tpu.models.lm.rnn import RnnLm
    from rasr_tpu.models.tying import MonophoneStateTying
    from rasr_tpu.search.decoder import BeamConfig, TreeDecoder
    from rasr_tpu.search.lookahead import build_bigram_lookahead
    from rasr_tpu.search.rnn_fusion import build_rnn_fusion
    from rasr_tpu.search.tree import build_prefix_tree

    rng = np.random.default_rng(42)
    lex = Lexicon()
    build_default_silence(lex)
    lex.add_lemma(["AB"], [(["a", "b"], 0.0)])
    lex.add_lemma(["BA"], [(["b", "a"], 0.0)])
    lex.add_lemma(["AA"], [(["a", "a"], 0.0)])
    lex.add_lemma(["BAB"], [(["b", "a", "b"], 0.0)])
    topo = HmmTopology(states_per_phone=1, silence_states=1)
    tying = MonophoneStateTying(lex, topo)
    trans = TransitionModel()
    texts = [["AB", "BA"], ["AB", "AA"], ["BA", "BAB"], ["BAB", "AB"]] * 2
    lm2 = NgramLm.train_from_text(texts, order=2)
    lm4 = NgramLm.train_from_text(texts, order=4)
    uni = {wid: lm2.score((), wid) for wid in lm2.vocab.values()}
    t_in = build_prefix_tree(
        lex, tying, topo, trans, lm_vocab=lm2.vocab, lm_unigrams=uni
    )
    t_ax = build_prefix_tree(
        lex, tying, topo, trans, lm_vocab=lm2.vocab, lm_unigrams=uni,
        across_word=True,
    )
    bla = build_bigram_lookahead(t_in, lm2, num_classes=8)
    bla_ax = build_bigram_lookahead(t_ax, lm2, num_classes=8)
    assert bla_ax is not None, "across-word bigram lookahead must build"
    rnn = RnnLm.train_from_text(texts, embed_dim=8, hidden_dim=12, epochs=20)

    M = tying.num_classes
    T = 6
    emis = rng.uniform(0.0, 6.0, size=(2, T, M)).astype(np.float32)
    nf = np.array([T, T - 2], np.int32)
    cfg = BeamConfig(max_hyps=64, word_end_limit=16, lm_scale=0.8)
    configs = [
        ("across-word", t_ax, compile_ngram(lm2), {}, cfg),
        ("4gram-two-key", t_in, compile_ngram(lm4), {},
         dataclasses_replace(cfg, force_unpacked_keys=True)),
        ("bigram-la", t_in, compile_ngram(lm2), {"bigram_la": bla}, cfg),
        ("rnn-fusion", t_in, compile_ngram(lm2),
         {"rnn_fusion": None}, cfg),  # built per-device below
        # compact branch expansion (hp rowsel int32 carrier) + LM-aware
        # word-end rank (we_pack bias column + slot re-sort) + word-end
        # beam: the newest packed transport paths, untimed by the bench
        ("branch-width+we-rank", t_ax, compile_ngram(lm2), {},
         dataclasses_replace(cfg, branch_hyps=8, branch_width=24,
                             word_end_rank_lm=True, word_end_beam=60.0)),
        # across-word bigram lookahead (r3): sentinel-root crossing
        # deltas + carried class/phi payload through the sorts
        ("across-word+bigram-la", t_ax, compile_ngram(lm2),
         {"bigram_la": bla_ax}, cfg),
        # r4 big-table layouts FORCED onto the tiny canary nets: the
        # packed-row combo layout (binary int32 unpack) + the 128-lane
        # packed LM bucket rows — the large-vocab transport paths must
        # stay bit-exact on chip (the bit-transport lesson: CPU tests
        # cannot catch TPU relayout flushes)
        ("packed-rows+lm128", t_ax, compile_ngram(lm2), {}, cfg),
    ]
    for name, tr, tb, kw, c in configs:
        results = {}
        forced_env = (
            {"RASR_TPU_PACK_THRESHOLD": "1", "RASR_TPU_LM_REP_THRESHOLD": "1"}
            if name == "packed-rows+lm128"
            else {}
        )
        saved_env = {k: os.environ.get(k) for k in forced_env}
        os.environ.update(forced_env)
        for devname, dev in (("cpu", cpu), ("tpu", None)):
            ctx = jax.default_device(dev) if dev is not None else _nullctx()
            with ctx:
                kw_dev = dict(kw)
                if name == "rnn-fusion":
                    kw_dev["rnn_fusion"] = build_rnn_fusion(
                        rnn, lm2.vocab, weight=0.7
                    )
                dec = TreeDecoder(tr, tb, c, **kw_dev)
                results[devname] = dec.decode_scores(emis, nf)
        for k, v in saved_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        for a, b in zip(results["cpu"], results["tpu"]):
            assert a.words == b.words, (
                f"CROSS-BACKEND CANARY FAILED ({name}): "
                f"{a.words} vs {b.words}"
            )
            assert abs(a.score - b.score) < 1e-2 * max(1.0, abs(a.score)), (
                f"CROSS-BACKEND CANARY FAILED ({name}): "
                f"{a.score} vs {b.score}"
            )
        sys.stderr.write(f"canary ok: cpu==tpu [{name}]\n")


def _nullctx():
    import contextlib

    return contextlib.nullcontext()


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


def train_bench():
    """BENCH_TRAIN=1: training-side performance (r4 verdict weak #3).

    Conformer hybrid AM train step at production size (d512 x 12
    blocks, bf16 gemms, f32 params/LN) — reports step time, frames/s,
    achieved TFLOP/s from the compiled executable's own cost analysis,
    and MFU vs the chip's bf16 peak (BENCH_TRAIN_PEAK_TFLOPS, default
    197 = v5e). Two step timings:

    * device-resident batch (pure compute: the steady state when the
      input pipeline overlaps, as FrameDataset staging does), and
    * per-step host upload of the same batch (the un-overlapped worst
      case) — the gap IS the input-pipeline overlap win.

    Opt-in (the default bench must stay compile-bounded for the
    driver); prints the same single-JSON-line contract.
    """
    import jax
    import jax.numpy as jnp

    from rasr_tpu.models.nn import ConformerEncoderNet
    from rasr_tpu.train.nn_trainer import SequenceTrainer, TrainConfig

    d_model = int(os.environ.get("BENCH_TRAIN_DMODEL", "512"))
    n_blocks = int(os.environ.get("BENCH_TRAIN_BLOCKS", "12"))
    num_classes = int(os.environ.get("BENCH_CLASSES", "2000"))
    B = int(os.environ.get("BENCH_TRAIN_BATCH", "16"))
    T = int(os.environ.get("BENCH_TRAIN_FRAMES", "400"))
    feat_dim = 45
    steps = int(os.environ.get("BENCH_TRAIN_STEPS", "20"))
    peak = float(os.environ.get("BENCH_TRAIN_PEAK_TFLOPS", "197")) * 1e12

    net = ConformerEncoderNet(
        num_classes=num_classes, d_model=d_model, num_blocks=n_blocks,
        num_heads=8,
        compute_dtype=os.environ.get("BENCH_NN_DTYPE", "bfloat16"),
    )
    trainer = SequenceTrainer(net, num_classes, TrainConfig())
    params = trainer.init_params(feat_dim)
    opt_state = trainer.opt.init(params)
    rng = np.random.default_rng(0)
    x_h = rng.normal(size=(B, T, feat_dim)).astype(np.float32)
    y_h = rng.integers(0, num_classes, size=(B, T)).astype(np.int32)
    w_h = np.ones((B, T), np.float32)
    x, y, w = (jax.device_put(a) for a in (x_h, y_h, w_h))

    t0 = time.time()
    params, opt_state, loss, acc = trainer._step(params, opt_state, x, y, w)
    jax.block_until_ready((params, loss))
    sys.stderr.write(f"train warmup/compile {time.time()-t0:.1f}s\n")
    try:
        ca = trainer._step.lower(params, opt_state, x, y, w).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_per_step = float(ca.get("flops", 0.0))
    except Exception as e:  # cost analysis is best-effort across backends
        sys.stderr.write(f"cost_analysis unavailable: {e}\n")
        flops_per_step = 0.0

    # Steady state, measured as a TWO-WINDOW SLOPE: time a window of
    # ``steps`` chained steps and one of 2*steps, each FORCED by reading
    # float(loss) of the last step (r5 hardware finding: through the
    # axon remote runtime, jax.block_until_ready on a chained-dispatch
    # result returns ~10x early — 20 profiled 29.2ms steps "completed"
    # in 60ms — while an actual value read forces the full dependency
    # chain; the per-op profile confirms 29.2ms/step self time, see
    # docs/PERF.md "Training-side performance"). The slope
    # (t2 - t1)/steps cancels the ~70ms read round-trip exactly.
    def window(n, upload=False):
        nonlocal params, opt_state
        t0 = time.time()
        for _ in range(n):
            if upload:
                xi, yi, wi = (jax.device_put(a) for a in (x_h, y_h, w_h))
            else:
                xi, yi, wi = x, y, w
            params, opt_state, loss, acc = trainer._step(
                params, opt_state, xi, yi, wi
            )
        float(loss)  # value read: the only trustworthy barrier here
        return time.time() - t0

    window(2)  # settle dispatch path
    step_s = float(np.median(
        [(window(2 * steps) - window(steps)) / steps for _ in range(3)]
    ))
    step_upload_s = float(np.median(
        [(window(2 * steps, True) - window(steps, True)) / steps
         for _ in range(3)]
    ))

    tflops = flops_per_step / step_s / 1e12 if flops_per_step else 0.0
    mfu = flops_per_step / step_s / peak if flops_per_step else 0.0
    sys.stderr.write(
        f"train step {step_s*1e3:.1f}ms ({B}x{T} frames, d{d_model}x"
        f"{n_blocks}) | {B*T/step_s:.0f} frames/s | "
        f"{tflops:.1f} TFLOP/s achieved | MFU {mfu*100:.1f}% | "
        f"with per-step upload {step_upload_s*1e3:.1f}ms "
        f"(pipeline overlap win {100*(step_upload_s-step_s)/step_upload_s:.0f}%)\n"
    )
    print(json.dumps({
        "metric": "train_mfu",
        "value": round(mfu * 100, 2),
        "unit": "percent_of_peak",
        "vs_baseline": round(mfu * 100 / 40.0, 4),  # 40% MFU = solid
        "step_ms": round(step_s * 1e3, 2),
        "frames_per_s": round(B * T / step_s, 1),
        "achieved_tflops": round(tflops, 2),
        "step_ms_with_upload": round(step_upload_s * 1e3, 2),
    }))


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("BENCH_TRAIN") == "1":
        return train_bench()

    correctness_canary()
    t_setup = time.time()
    fe, scorer, dec, tree = build_setup(
        num_words=int(os.environ.get("BENCH_WORDS", "5000")),
        num_classes=int(os.environ.get("BENCH_CLASSES", "2000")),
    )
    # B=64 measured best on v5e with the current scan (171 audio-s/s vs
    # 146 @16, 156 @32; the knee moved up as per-frame op costs fell)
    batch_size = int(os.environ.get("BENCH_BATCH", "64"))
    audio_seconds_each = float(os.environ.get("BENCH_AUDIO_S", "10"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    rng = np.random.default_rng(1)
    sr = 16000
    S = int(audio_seconds_each * sr)
    samples = rng.normal(size=(batch_size, S)).astype(np.float32) * 0.1
    lengths = np.full(batch_size, S, np.int64)
    # stage the audio on device once (data loading overlaps compute in
    # production; the axon tunnel's MB/s host->device path must not be
    # measured as frontend time)
    samples = jax.device_put(samples)
    lengths = jax.device_put(lengths)
    jax.block_until_ready(samples)
    sys.stderr.write(
        f"setup {time.time()-t_setup:.1f}s tree={tree.stats()} "
        f"device={jax.devices()[0].platform}\n"
    )

    def dispatch():
        feats, nf = fe(samples, lengths)
        emis = scorer(feats)  # stays on device; decode consumes it directly
        # nf stays ON DEVICE too: np.asarray(nf) here used to pay the
        # ~70ms fixed tunnel round-trip per batch — most of the r4
        # "host dispatch gap" between the 1.45s op self time and wall
        # time (VERDICT r4 weak #1)
        return dec.decode_scores_device(emis, nf)

    t0 = time.time()
    dec.results_from_device(dispatch())  # compile + warmup
    sys.stderr.write(f"warmup/compile {time.time()-t0:.1f}s\n")

    # Median of >=3 separately timed windows so the driver captures the
    # program, not dispatch jitter (r4: five solo draws at IDENTICAL
    # 1.451s op self time spread 401-412 au-s/s). Within a window the
    # next batch's device work is dispatched BEFORE the current batch's
    # result is pulled (depth-2 software pipeline — bounded memory, and
    # host dispatch overlaps the on-chip scan).
    windows = int(os.environ.get("BENCH_WINDOWS", "3"))
    audio_window = iters * batch_size * audio_seconds_each
    rates = []
    for w in range(windows):
        t0 = time.time()
        prev = None
        for _ in range(iters):
            b = dispatch()
            if prev is not None:
                res = dec.results_from_device(prev)
            prev = b
        res = dec.results_from_device(prev)
        rates.append(audio_window / (time.time() - t0))
        sys.stderr.write(f"window {w}: {rates[-1]:.1f} audio-s/s\n")
    value = float(np.median(rates))
    print(
        json.dumps(
            {
                "metric": "decode_throughput",
                "value": round(value, 3),
                "unit": "audio_seconds/s/chip",
                "vs_baseline": round(value / 50.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
