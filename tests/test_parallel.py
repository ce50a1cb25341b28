"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

(SURVEY §4: multi-host without a cluster — 8 virtual devices validate
the sharded compute paths; the driver's dryrun_multichip covers the
jit/collective compile path separately.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rasr_tpu.models.gmm import MixtureSet, make_scoring_tensors, mixture_scores
from rasr_tpu.models.scorer import GmmFeatureScorer
from rasr_tpu.parallel.mesh import data_sharding, make_mesh, shard_batch
from rasr_tpu.parallel.sharded import (
    ShardedGmmScorer,
    dp_accumulate,
    psum_counters,
)
from rasr_tpu.train.em import GmmAccumulator, accumulate

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _mixtures(rng, M=6, K=2, D=8):
    return MixtureSet(
        means=rng.normal(size=(M, K, D)).astype(np.float32),
        variances=(0.5 + rng.uniform(size=(M, K, D))).astype(np.float32),
        weights=np.full((M, K), 1.0 / K, np.float32),
        num_densities=np.full(M, K, np.int32),
    )


def test_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh2 = make_mesh(model=1)
    assert mesh2.shape["data"] == 8


def test_sharded_gmm_matches_single(rng):
    """TP-sharded scoring == single-device scoring (incl. density padding)."""
    mesh = make_mesh(data=4, model=2)
    ms = _mixtures(rng, M=6, K=2, D=8)  # M*K=12, pads to 16 over 2 shards
    sharded = ShardedGmmScorer(ms, mesh, scale=0.7)
    single = GmmFeatureScorer(ms, scale=0.7)
    feats = rng.normal(size=(8, 5, 8)).astype(np.float32)
    got = np.asarray(sharded(feats))
    want = np.asarray(single(feats))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sharded_gmm_logsumexp_mode(rng):
    mesh = make_mesh(data=2, model=4)
    ms = _mixtures(rng, M=8, K=3, D=4)
    sharded = ShardedGmmScorer(ms, mesh, max_approx=False)
    st = make_scoring_tensors(ms)
    feats = rng.normal(size=(4, 3, 4)).astype(np.float32)
    want = np.asarray(mixture_scores(jnp.asarray(feats), st, max_approx=False))
    np.testing.assert_allclose(np.asarray(sharded(feats)), want, rtol=1e-4, atol=1e-4)


def test_dp_accumulate_matches_local(rng):
    """psum-reduced DP statistics == single-process accumulation —
    the reference's combine-accumulators equivalence."""
    mesh = make_mesh(data=8, model=1)
    ms = _mixtures(rng, M=4, K=2, D=5)
    N = 160
    feats = rng.normal(size=(N, 5)).astype(np.float32)
    labels = rng.integers(0, 4, size=N).astype(np.int32)
    labels[150:] = -1  # padding frames
    count, s1, s2 = dp_accumulate(mesh, ms, feats, labels)
    acc = GmmAccumulator.zeros(4, 2, 5)
    accumulate(acc, ms, feats, labels)
    np.testing.assert_allclose(count, acc.count, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(s1, acc.sum, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(s2, acc.sumsq, rtol=1e-3, atol=1e-4)


def test_psum_counters():
    mesh = make_mesh(data=8, model=1)
    vals = np.arange(24, dtype=np.float64).reshape(8, 3)
    out = psum_counters(mesh, vals)
    np.testing.assert_allclose(out, vals.sum(0))


def test_shard_batch_placement(rng):
    mesh = make_mesh(data=8, model=1)
    x = rng.normal(size=(16, 4)).astype(np.float32)
    sharded = shard_batch(mesh, x)
    assert sharded.sharding.spec == data_sharding(mesh).spec
    np.testing.assert_allclose(np.asarray(sharded), x)


def test_sharded_decode_batch(rng):
    """Data-parallel decode: batch rows sharded over 'data' produce the
    same results as unsharded decode."""
    from rasr_tpu.corpus.lexicon import Lexicon, build_default_silence
    from rasr_tpu.models.hmm import HmmTopology, TransitionModel
    from rasr_tpu.models.lm.arpa import NgramLm
    from rasr_tpu.models.lm.ngram_tpu import compile_ngram
    from rasr_tpu.models.tying import MonophoneStateTying
    from rasr_tpu.search.decoder import BeamConfig, TreeDecoder

    lex = Lexicon()
    build_default_silence(lex)
    lex.add_lemma(["AB"], [(["a", "b"], 0.0)])
    lex.add_lemma(["BA"], [(["b", "a"], 0.0)])
    topo = HmmTopology(states_per_phone=1, silence_states=1)
    tying = MonophoneStateTying(lex, topo)
    lm = NgramLm.train_from_text([["AB", "BA"]], order=2)
    from rasr_tpu.search.tree import build_prefix_tree

    tree = build_prefix_tree(lex, tying, topo, TransitionModel(), lm_vocab=lm.vocab)
    dec = TreeDecoder(tree, compile_ngram(lm), BeamConfig(max_hyps=32, word_end_limit=8))
    M = tying.num_classes
    emis = rng.uniform(0, 6, size=(8, 6, M)).astype(np.float32)
    n = np.full(8, 6, np.int32)
    plain = dec.decode_scores(emis, n)
    mesh = make_mesh(data=8, model=1)
    from rasr_tpu.parallel.sharded import dp_decode

    sharded = dp_decode(dec, mesh, emis, n)
    for a, b in zip(plain, sharded):
        assert a.orth == b.orth
        np.testing.assert_allclose(a.score, b.score, rtol=1e-5)


def test_workqueue_partition_and_resume(tmp_path, rng):
    from rasr_tpu.corpus.audio import write_wav
    from rasr_tpu.corpus.bliss import CorpusDescription
    from rasr_tpu.parallel.workqueue import CorpusWorkQueue
    from rasr_tpu.utils.archive import FileArchive

    sr = 16000
    xml = ['<corpus name="t">']
    for i in range(10):
        wav = tmp_path / f"r{i}.wav"
        write_wav(str(wav), np.zeros(1600, np.float32), sr)
        xml.append(
            f'<recording name="r{i}" audio="{wav}">'
            f'<segment name="s" start="0" end="0.1"><orth>X</orth></segment></recording>'
        )
    xml.append("</corpus>")
    (tmp_path / "c.xml").write_text("".join(xml))
    corpus = CorpusDescription.load(str(tmp_path / "c.xml"))
    done = str(tmp_path / "done.cache")

    # two virtual processes cover the corpus disjointly
    q0 = CorpusWorkQueue(corpus, 0, 2, done)
    q1 = CorpusWorkQueue(corpus, 1, 2, done)
    names0 = {s.full_name for s in q0.segments()}
    names1 = {s.full_name for s in q1.segments()}
    assert not (names0 & names1)
    assert len(names0 | names1) == 10

    # process half of q0's slice, then resume
    def make_fn(limit):
        def fn(batch):
            finished = []
            with FileArchive(done, "a") as ar:
                for seg in batch[:limit]:
                    ar.write(seg.full_name, b"ok")
                    finished.append(seg.full_name)
            return finished
        return fn

    rep1 = q0.run(make_fn(1), batch_size=2)  # finishes 1 per batch of 2
    assert rep1.processed >= 1
    rep2 = q0.run(make_fn(10), batch_size=10)
    assert rep2.skipped == rep1.processed
    assert not q0.pending()  # everything done now


def test_conformer_tp_matches_replicated(rng):
    """Tensor-parallel conformer forward == replicated forward.

    Heads/FF/conv channels split over the 'model' axis (Megatron-style
    col-in/row-out specs from conformer_param_specs); GSPMD inserts the
    allreduces, so the math must match the single-device apply up to
    float reduction order.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rasr_tpu.models.nn import ConformerEncoderNet
    from rasr_tpu.parallel.sharded import (
        conformer_param_specs,
        shard_conformer_params,
    )

    mesh = make_mesh(data=2, model=4)
    net = ConformerEncoderNet(
        num_classes=11, d_model=16, num_blocks=2, num_heads=4, conv_kernel=7
    )
    x = rng.normal(size=(4, 10, 6)).astype(np.float32)
    lengths = jnp.asarray(np.array([10, 7, 5, 9], np.int32))
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x), lengths=lengths)[
        "params"
    ]
    want = np.asarray(net.apply({"params": params}, x, lengths=lengths))

    specs = conformer_param_specs(params)
    # spot-check: the hot matmuls actually split over 'model'
    assert specs["block0"]["ff1_in"]["kernel"] == P(None, "model")
    assert specs["block0"]["ff1_out"]["kernel"] == P("model", None)
    assert specs["block0"]["mhsa"]["query"]["kernel"] == P(None, "model", None)
    assert specs["block0"]["mhsa"]["out"]["kernel"] == P("model", None, None)
    assert specs["block0"]["conv_dw"]["kernel"] == P(None, None, "model")
    assert specs["block0"]["ff1_ln"]["scale"] == P()

    sp = shard_conformer_params(params, mesh)
    q = sp["block0"]["mhsa"]["query"]["kernel"]
    assert q.sharding.spec == P(None, "model", None)

    dp = NamedSharding(mesh, P("data"))
    fwd = jax.jit(
        lambda p, xx, ll: net.apply({"params": p}, xx, lengths=ll),
        out_shardings=dp,
    )
    with mesh:
        got = np.asarray(
            fwd(sp, jax.device_put(jnp.asarray(x), dp), lengths)
        )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_dp_fmllr_stats_matches_local(rng):
    """Adaptation statistics reduce over the data mesh exactly like the
    single-device path (collective == accumulator-file merge)."""
    from rasr_tpu.parallel.sharded import dp_fmllr_stats
    from rasr_tpu.train.fmllr import fmllr_stats

    ms = _mixtures(rng)
    N = 333  # deliberately not divisible by the mesh
    feats = rng.normal(size=(N, ms.dim)).astype(np.float32)
    mix = rng.integers(0, ms.num_mixtures, N)
    mesh = make_mesh(data=8)
    G, k, beta = dp_fmllr_stats(mesh, ms, feats, mix)
    G0, k0, b0 = fmllr_stats(feats, mix, ms)
    assert beta == b0 == N
    np.testing.assert_allclose(G, G0, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(k, k0, rtol=1e-4, atol=1e-3)
