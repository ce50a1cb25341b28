"""NN model / trainer / hybrid scorer tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rasr_tpu.models.nn import (
    ConvFrontendNet,
    FeedForwardNet,
    NnHybridScorer,
    StatePriors,
)
from rasr_tpu.models.scorer import create_scorer
from rasr_tpu.train.nn_trainer import FrameDataset, NnTrainer, TrainConfig


def _toy_data(rng, n=600, D=8, M=4):
    """Linearly separable classes around distinct means."""
    means = rng.normal(size=(M, D)).astype(np.float32) * 3
    labels = rng.integers(0, M, size=n).astype(np.int32)
    feats = means[labels] + rng.normal(size=(n, D)).astype(np.float32) * 0.3
    return feats, labels, means


def test_ffnn_shapes(rng):
    model = FeedForwardNet(num_classes=5, hidden=(16,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)))["params"]
    out = model.apply({"params": params}, jnp.zeros((3, 7, 8)))
    assert out.shape == (3, 7, 5)


def test_conv_net_shapes(rng):
    model = ConvFrontendNet(num_classes=5, channels=(8,), hidden=(16,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 10, 8)))["params"]
    out = model.apply({"params": params}, jnp.zeros((2, 10, 8)))
    assert out.shape == (2, 10, 5)


def test_training_learns(rng):
    feats, labels, _ = _toy_data(rng)
    ds = FrameDataset(feats, labels)
    model = FeedForwardNet(num_classes=4, hidden=(32,))
    trainer = NnTrainer(model, 4, TrainConfig(batch_size=64, epochs=8, learning_rate=0.05))
    params, stats = trainer.train(ds)
    assert stats[-1]["frame_accuracy"] > 0.95
    assert stats[-1]["loss"] < stats[0]["loss"]


def test_blstm_sequence_training_learns(rng):
    """BLSTM hybrid encoder + sequence trainer: context-dependent toy
    task (label = class of PREVIOUS frame) that a frame-FFNN cannot
    solve but a recurrent encoder must."""
    from rasr_tpu.models.nn import BlstmEncoderNet
    from rasr_tpu.train.nn_trainer import SequenceTrainer

    N, T, D, M = 48, 20, 6, 3
    means = rng.normal(size=(M, D)).astype(np.float32) * 3
    cls = rng.integers(0, M, size=(N, T)).astype(np.int32)
    feats = means[cls] + rng.normal(size=(N, T, D)).astype(np.float32) * 0.2
    labels = np.full((N, T), -1, np.int32)
    labels[:, 1:] = cls[:, :-1]  # needs memory of the previous frame

    model = BlstmEncoderNet(num_classes=M, hidden=(16,))
    tr = SequenceTrainer(
        model, M, TrainConfig(epochs=30, learning_rate=0.01, optimizer="adam")
    )
    params, stats = tr.train_sequences(feats, labels, batch_size=16)
    assert stats[-1]["frame_accuracy"] > 0.9


def test_blstm_scorer_integration(rng):
    """BLSTM plugs into the hybrid FeatureScorer seam unchanged."""
    from rasr_tpu.models.nn import BlstmEncoderNet

    M = 4
    model = BlstmEncoderNet(num_classes=M, hidden=(8,))
    x = jnp.zeros((2, 7, 5))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    priors = StatePriors(np.log(np.full(M, 1.0 / M)))
    scorer = NnHybridScorer(model, params, priors, scale=1.0)
    out = scorer.score(np.random.default_rng(0).normal(size=(2, 7, 5)).astype(np.float32))
    assert out.shape == (2, 7, M)
    assert np.isfinite(np.asarray(out)).all()


def test_mid_epoch_checkpoint_resume_exact(tmp_path, rng):
    """An interrupted-and-resumed run reproduces the uninterrupted
    parameters bitwise (seeded permutation + full opt-state restore)."""
    from rasr_tpu.train.checkpoint import CheckpointManager

    feats, labels, _ = _toy_data(rng, n=400)
    ds = FrameDataset(feats, labels)
    model = FeedForwardNet(num_classes=4, hidden=(16,))
    cfg = TrainConfig(batch_size=64, epochs=3, learning_rate=0.05, momentum=0.9)

    straight, _ = NnTrainer(model, 4, cfg).train(ds)

    # checkpoint every 2 steps; 400//64 = 6 steps/epoch, 18 total
    ck1 = CheckpointManager(str(tmp_path / "ck"), max_to_keep=100)
    NnTrainer(model, 4, cfg).train(ds, ckpt=ck1, ckpt_every=2)
    # pretend the job died after step 7 (mid-epoch 1): drop later ckpts
    for s in ck1.all_steps():
        if s > 7:
            for suffix in (".msgpack", ".json"):
                (tmp_path / "ck" / f"ckpt_{s:08d}{suffix}").unlink()
    assert ck1.latest_step() == 6  # every-2 grid: 6 is the last <= 7

    resumed, _ = NnTrainer(model, 4, cfg).train(ds, ckpt=ck1, resume=True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        straight, resumed,
    )


def test_dataset_padding_and_counts(rng):
    feats = rng.normal(size=(2, 10, 4)).astype(np.float32)
    labels = np.full((2, 10), -1, np.int32)
    labels[0, :5] = [0, 1, 1, 2, 2]
    ds = FrameDataset(feats, labels)
    assert len(ds) == 5
    np.testing.assert_array_equal(ds.label_counts(4), [1, 2, 2, 0])


def test_priors(rng):
    p = StatePriors.from_counts(np.array([10, 30, 60]), smoothing=0.0)
    np.testing.assert_allclose(np.exp(p.log_priors), [0.1, 0.3, 0.6], rtol=1e-6)


def test_priors_io(tmp_path):
    p = StatePriors.from_counts(np.array([1, 2, 3]))
    p.save(str(tmp_path / "priors"))
    p2 = StatePriors.load(str(tmp_path / "priors"))
    np.testing.assert_allclose(p.log_priors, p2.log_priors)


def test_hybrid_scorer_math(rng):
    M, D = 4, 8
    model = FeedForwardNet(num_classes=M, hidden=(16,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, D)))["params"]
    priors = StatePriors.from_counts(np.array([1, 2, 3, 4]))
    scorer = NnHybridScorer(model, params, priors, scale=2.0, prior_scale=0.5)
    feats = rng.normal(size=(1, 3, D)).astype(np.float32)
    got = np.asarray(scorer(feats))
    logits = model.apply({"params": params}, jnp.asarray(feats))
    logp = np.asarray(jax.nn.log_softmax(logits, -1))
    expect = 2.0 * (-(logp - 0.5 * priors.log_priors))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)
    assert scorer.num_classes == M


def test_scorer_registry_nn(rng):
    M, D = 3, 4
    model = FeedForwardNet(num_classes=M, hidden=(8,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, D)))["params"]
    priors = StatePriors.from_counts(np.ones(M))
    scorer = create_scorer("nn-precomputed-hybrid", model, params, priors)
    assert isinstance(scorer, NnHybridScorer)


def test_params_io(tmp_path, rng):
    model = FeedForwardNet(num_classes=3, hidden=(8,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 4)))["params"]
    path = str(tmp_path / "params.msgpack")
    NnTrainer.save_params(params, path)
    params2 = NnTrainer.load_params(params, path)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(params2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_hybrid_end_to_end_alignment_decode(rng):
    """NN trained on GMM-style data plugs into the same decode seam."""
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
    M, D = tying.num_classes, 6

    feats, labels, means = _toy_data(rng, n=900, D=D, M=M)
    ds = FrameDataset(feats, labels)
    model = FeedForwardNet(num_classes=M, hidden=(32,))
    trainer = NnTrainer(model, M, TrainConfig(batch_size=64, epochs=6, learning_rate=0.05))
    params, _ = trainer.train(ds)
    priors = trainer.estimate_priors(ds)
    scorer = NnHybridScorer(model, params, priors)

    from rasr_tpu.models.hmm import Tdp

    lm = NgramLm.train_from_text([["AB", "BA"], ["BA", "AB"]], order=2)
    trans = TransitionModel(
        speech=Tdp(loop=0.2, forward=0.0, skip=np.inf, exit=0.2),
        silence=Tdp(loop=0.2, forward=0.2, skip=np.inf, exit=0.2),
    )
    tree = build_prefix_tree(lex, tying, topo, trans, lm_vocab=lm.vocab)
    dec = TreeDecoder(tree, compile_ngram(lm), BeamConfig(max_hyps=64, word_end_limit=16))

    # synthesize a frame sequence: sil aaa bbb sil bbb aaa -> "AB BA"
    from rasr_tpu.models.allophone import Allophone, AllophoneState

    def cls(sym):
        return tying.classify(AllophoneState(Allophone(lex.phonemes[sym].id), 0))

    seq = ([cls("si")] * 2 + [cls("a")] * 3 + [cls("b")] * 3
           + [cls("si")] * 2 + [cls("b")] * 3 + [cls("a")] * 3)
    frames = means[np.array(seq)] + rng.normal(size=(len(seq), D)).astype(np.float32) * 0.1
    emis = np.asarray(scorer(frames[None]))
    (res,) = dec.decode_scores(emis, np.array([len(seq)]))
    assert res.orth == "AB BA"


def test_conformer_shapes_and_padding_invariance(rng):
    """Conformer hybrid encoder: [B,T,D]->[B,T,M], and with lengths
    given, batched ragged scoring equals scoring the valid prefix alone
    (attention AND conv modules masked — ref reaches encoder acoustic
    models only via src/Tensorflow/; here native flax)."""
    from rasr_tpu.models.nn import ConformerEncoderNet

    D, M = 6, 5
    model = ConformerEncoderNet(
        num_classes=M, d_model=16, num_blocks=2, num_heads=2, conv_kernel=5
    )
    T1, T2 = 9, 16
    x1 = rng.normal(size=(1, T1, D)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x1))["params"]
    out1 = model.apply({"params": params}, jnp.asarray(x1))
    assert out1.shape == (1, T1, M)
    # same utterance padded out to T2 with garbage, lengths given
    x2 = np.concatenate(
        [x1, 7.7 * np.ones((1, T2 - T1, D), np.float32)], axis=1
    )
    out2 = model.apply(
        {"params": params}, jnp.asarray(x2), lengths=jnp.array([T1])
    )
    np.testing.assert_allclose(
        np.asarray(out2[:, :T1]), np.asarray(out1), rtol=2e-4, atol=2e-4
    )


def test_conformer_sequence_training_learns(rng):
    """Conformer + sequence trainer on the context task (label = class
    of the PREVIOUS frame): needs temporal mixing, impossible framewise."""
    from rasr_tpu.models.nn import ConformerEncoderNet
    from rasr_tpu.train.nn_trainer import SequenceTrainer

    N, T, D, M = 48, 20, 6, 3
    means = rng.normal(size=(M, D)).astype(np.float32) * 3
    cls = rng.integers(0, M, size=(N, T)).astype(np.int32)
    feats = means[cls] + rng.normal(size=(N, T, D)).astype(np.float32) * 0.2
    labels = np.full((N, T), -1, np.int32)
    labels[:, 1:] = cls[:, :-1]

    model = ConformerEncoderNet(
        num_classes=M, d_model=16, num_blocks=1, num_heads=2, conv_kernel=5
    )
    tr = SequenceTrainer(
        model, M, TrainConfig(epochs=40, learning_rate=0.003, optimizer="adam")
    )
    params, stats = tr.train_sequences(feats, labels, batch_size=16)
    assert stats[-1]["frame_accuracy"] > 0.85


def test_conformer_scorer_lengths(rng):
    """NnHybridScorer threads lengths to length-aware encoders."""
    from rasr_tpu.models.nn import ConformerEncoderNet

    D, M = 5, 4
    model = ConformerEncoderNet(
        num_classes=M, d_model=8, num_blocks=1, num_heads=2, conv_kernel=3
    )
    x = rng.normal(size=(2, 7, D)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    priors = StatePriors(np.log(np.full(M, 1.0 / M)))
    scorer = NnHybridScorer(model, params, priors)
    out = scorer(x, lengths=np.array([7, 4]))
    assert out.shape == (2, 7, M)
    assert np.isfinite(np.asarray(out)).all()
    # GMM-style scorers ignore the kwarg through the seam
    full = scorer(x)
    assert full.shape == (2, 7, M)


def test_newbob_schedule_decays_on_plateau(rng):
    """lr_schedule='newbob' halves the injected learning rate when the
    epoch loss stops improving; training still converges."""
    feats, labels, _ = _toy_data(rng)
    ds = FrameDataset(feats, labels)
    cfg = TrainConfig(
        batch_size=64, learning_rate=0.5, optimizer="sgd", epochs=6,
        lr_schedule="newbob", newbob_decay=0.5, newbob_threshold=0.9,
    )
    # threshold 0.9 (90% relative improvement required) forces decay at
    # every epoch boundary after the first
    tr = NnTrainer(FeedForwardNet(num_classes=4, hidden=(16,)), 4, cfg)
    params, stats = tr.train(ds)
    lrs = [s["learning_rate"] for s in stats if "learning_rate" in s]
    assert len(lrs) >= 3 and lrs[0] == 0.25 and lrs[1] == 0.125
    assert stats[-1]["frame_accuracy"] > 0.8

    # constant schedule records no lr changes and reaches accuracy too
    tr2 = NnTrainer(
        FeedForwardNet(num_classes=4, hidden=(16,)), 4,
        TrainConfig(batch_size=64, learning_rate=0.1, epochs=3),
    )
    _, stats2 = tr2.train(ds)
    assert all("learning_rate" not in s for s in stats2)
    assert stats2[-1]["frame_accuracy"] > 0.8


def test_newbob_dev_control_set(rng):
    """With a dev dataset, newbob keys off dev_loss and the epoch record
    carries dev metrics."""
    feats, labels, _ = _toy_data(rng, n=400)
    dev_f, dev_l, _ = _toy_data(rng, n=120)
    cfg = TrainConfig(
        batch_size=64, learning_rate=0.2, epochs=3, lr_schedule="newbob",
        newbob_threshold=0.0,  # decay only on regression
    )
    tr = NnTrainer(FeedForwardNet(num_classes=4, hidden=(16,)), 4, cfg)
    params, stats = tr.train(FrameDataset(feats, labels), dev=FrameDataset(dev_f, dev_l))
    assert all("dev_loss" in s and "dev_frame_accuracy" in s for s in stats)


def test_bf16_compute_matches_f32_and_trains(rng):
    """compute_dtype='bfloat16': params stay f32, forward ~= the f32
    forward (bf16 mantissa tolerance), and training converges."""
    from rasr_tpu.models.nn import ConformerEncoderNet

    x = rng.normal(size=(2, 12, 8)).astype(np.float32)
    lengths = jnp.asarray(np.array([12, 9], np.int32))
    f32 = ConformerEncoderNet(num_classes=6, d_model=16, num_blocks=2, num_heads=2)
    b16 = ConformerEncoderNet(
        num_classes=6, d_model=16, num_blocks=2, num_heads=2,
        compute_dtype="bfloat16",
    )
    params = f32.init(jax.random.PRNGKey(0), jnp.asarray(x), lengths=lengths)["params"]
    # same param tree (params are f32 in both)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a: a.dtype == jnp.float32, params
        )
    )
    y32 = np.asarray(f32.apply({"params": params}, x, lengths=lengths))
    y16 = np.asarray(b16.apply({"params": params}, x, lengths=lengths))
    assert y16.dtype == np.float32
    np.testing.assert_allclose(y16, y32, rtol=0.15, atol=0.15)
    corr = np.corrcoef(y16.ravel(), y32.ravel())[0, 1]
    assert corr > 0.99

    # a bf16 FFNN still learns the toy task
    feats, labels, _ = _toy_data(rng)
    tr = NnTrainer(
        FeedForwardNet(num_classes=4, hidden=(32,), compute_dtype="bfloat16"),
        4, TrainConfig(batch_size=64, learning_rate=0.1, epochs=4),
    )
    _, stats = tr.train(FrameDataset(feats, labels))
    assert stats[-1]["frame_accuracy"] > 0.9
