"""EM / LDA / CART training tests."""

import numpy as np
import pytest

from rasr_tpu.models.cart import CartExamples, CartTree, Question, default_questions
from rasr_tpu.models.gmm import MixtureSet
from rasr_tpu.train.em import GmmAccumulator, accumulate, estimate, split
from rasr_tpu.train.lda import ScatterAccumulator, accumulate_scatter, estimate_lda


def test_em_single_gaussian_recovers_moments(rng):
    """One mixture, one density: estimate == sample moments."""
    D = 4
    data = rng.normal(loc=2.0, scale=1.5, size=(500, D)).astype(np.float32)
    model = MixtureSet.single_density(np.zeros((1, D), np.float32), np.ones((1, D), np.float32))
    acc = GmmAccumulator.zeros(1, 1, D)
    accumulate(acc, model, data, np.zeros(500, np.int32))
    new = estimate(acc, variance_floor_factor=0.0)
    np.testing.assert_allclose(new.means[0, 0], data.mean(0), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(new.variances[0, 0], data.var(0), rtol=1e-3, atol=1e-3)


def test_em_two_density_separation(rng):
    """Bimodal data + split model -> EM separates the modes."""
    D = 2
    mode_a = rng.normal(loc=-3.0, size=(300, D))
    mode_b = rng.normal(loc=+3.0, size=(300, D))
    data = np.concatenate([mode_a, mode_b]).astype(np.float32)
    labels = np.zeros(600, np.int32)
    model = MixtureSet.single_density(data.mean(0, keepdims=True), data.var(0, keepdims=True))
    for _ in range(2):  # split -> re-estimate a few rounds
        model = split(model)
        for _ in range(5):
            acc = GmmAccumulator.zeros(*model.means.shape)
            accumulate(acc, model, data, labels)
            model = estimate(acc, prev=model)
    # after one split round: exactly 2 densities near -3 and +3
    centers = sorted(model.means[0, : model.num_densities[0], 0].tolist())
    assert model.num_densities[0] >= 2
    assert abs(centers[0] - (-3)) < 0.5
    assert abs(centers[-1] - 3) < 0.5
    np.testing.assert_allclose(model.weights[0, : model.num_densities[0]].sum(), 1.0, rtol=1e-5)


def test_em_multi_mixture_and_padding_labels(rng):
    D, M = 3, 4
    feats = rng.normal(size=(2, 50, D)).astype(np.float32)
    labels = rng.integers(0, M, size=(2, 50)).astype(np.int32)
    labels[1, 40:] = -1  # padding
    model = MixtureSet.single_density(np.zeros((M, D), np.float32), np.ones((M, D), np.float32))
    acc = GmmAccumulator.zeros(M, 1, D)
    accumulate(acc, model, feats, labels)
    total = acc.count.sum()
    np.testing.assert_allclose(total, 90.0, rtol=1e-5)  # 100 - 10 padded
    # per-class counts match label histogram
    hist = np.bincount(labels[labels >= 0].reshape(-1), minlength=M)
    np.testing.assert_allclose(acc.count[:, 0], hist, rtol=1e-5)


def test_accumulator_merge_equals_joint(rng):
    D, M = 3, 2
    f1 = rng.normal(size=(40, D)).astype(np.float32)
    f2 = rng.normal(size=(60, D)).astype(np.float32)
    l1 = rng.integers(0, M, size=40).astype(np.int32)
    l2 = rng.integers(0, M, size=60).astype(np.int32)
    model = MixtureSet.single_density(np.zeros((M, D), np.float32), np.ones((M, D), np.float32))
    a = GmmAccumulator.zeros(M, 1, D)
    accumulate(a, model, f1, l1)
    b = GmmAccumulator.zeros(M, 1, D)
    accumulate(b, model, f2, l2)
    joint = GmmAccumulator.zeros(M, 1, D)
    accumulate(joint, model, np.concatenate([f1, f2]), np.concatenate([l1, l2]))
    a.merge(b)
    np.testing.assert_allclose(a.count, joint.count, rtol=1e-5)
    np.testing.assert_allclose(a.sum, joint.sum, rtol=1e-4, atol=1e-4)


def test_accumulator_io(tmp_path, rng):
    acc = GmmAccumulator.zeros(2, 1, 3)
    acc.count += 1
    acc.save(str(tmp_path / "acc"))
    acc2 = GmmAccumulator.load(str(tmp_path / "acc"))
    np.testing.assert_array_equal(acc.count, acc2.count)


def test_min_observation_pruning(rng):
    D = 2
    model = MixtureSet(
        means=rng.normal(size=(1, 2, D)).astype(np.float32),
        variances=np.ones((1, 2, D), np.float32),
        weights=np.array([[0.5, 0.5]], np.float32),
        num_densities=np.array([2], np.int32),
    )
    acc = GmmAccumulator.zeros(1, 2, D)
    acc.count[0] = [100.0, 0.5]  # second density starves
    acc.sum[0, 0] = 100.0 * np.array([1.0, 2.0])
    acc.sumsq[0, 0] = 100.0 * (np.array([1.0, 2.0]) ** 2 + 1.0)
    new = estimate(acc, min_observations=1.0)
    assert new.num_densities[0] == 1
    np.testing.assert_allclose(new.weights[0, 0], 1.0)
    np.testing.assert_allclose(new.means[0, 0], [1.0, 2.0], rtol=1e-6)


def test_lda_separates_informative_dim(rng):
    """Two classes differ only in dim 0; noise in dims 1..3 -> first LDA
    direction aligns with dim 0."""
    N, D = 400, 4
    feats = rng.normal(size=(N, D)).astype(np.float32)
    labels = (rng.uniform(size=N) < 0.5).astype(np.int32)
    feats[:, 0] += labels * 5.0
    feats[:, 2] *= 4.0  # high-variance junk dim
    acc = ScatterAccumulator.zeros(2, D)
    accumulate_scatter(acc, feats, labels)
    lda, vals = estimate_lda(acc, output_dim=2)
    assert lda.shape == (D, 2)
    direction = np.abs(lda[:, 0]) / np.linalg.norm(lda[:, 0])
    assert direction[0] > 0.9  # dominated by the informative dim
    assert vals[0] > 5 * max(vals[1], 1e-9)


def test_lda_projection_whitens_within(rng):
    N, D = 1000, 3
    feats = rng.normal(size=(N, D)).astype(np.float32)
    labels = (rng.uniform(size=N) < 0.5).astype(np.int32)
    feats[:, 1] += labels * 4.0
    acc = ScatterAccumulator.zeros(2, D)
    accumulate_scatter(acc, feats, labels)
    lda, _ = estimate_lda(acc, output_dim=1)
    proj = feats @ lda
    # within-class variance ~ 1 after projection
    v = np.concatenate([proj[labels == 0] - proj[labels == 0].mean(0),
                        proj[labels == 1] - proj[labels == 1].mean(0)])
    np.testing.assert_allclose(v.var(), 1.0, rtol=0.15)


def test_cart_learns_separating_question(rng):
    """Examples where the left context {1,2} vs {3,4} decides the
    distribution -> tree must split on exactly that partition."""
    D = 2
    ex = CartExamples(D)
    for left in (1, 2, 3, 4):
        for right in (1, 2, 3, 4):
            loc = -5.0 if left in (1, 2) else 5.0
            data = rng.normal(loc=loc, size=(50, D))
            ex.add((left, 9, right, 0), 50.0, data.sum(0), (data**2).sum(0))
    questions = [
        Question("left", frozenset([1, 2]), "L12"),
        Question("left", frozenset([1]), "L1"),
        Question("right", frozenset([1, 2]), "R12"),
        Question("state", frozenset([0]), "S0"),
    ]
    tree = CartTree.train(ex, questions, max_leaves=2)
    assert tree.num_classes == 2
    assert tree.root.question.name == "L12"
    # unseen context generalizes through the question
    assert tree.classify_key((1, 9, 7, 0)) == tree.classify_key((2, 9, 8, 0))
    assert tree.classify_key((3, 9, 7, 0)) != tree.classify_key((1, 9, 7, 0))


def test_cart_separate_classes_and_io(tmp_path, rng):
    D = 2
    ex = CartExamples(D)
    sil_key = (0, 5, 0, 0)
    ex.add(sil_key, 10.0, np.zeros(D), np.ones(D))
    for left in (1, 2):
        data = rng.normal(loc=left * 3.0, size=(30, D))
        ex.add((left, 9, 0, 0), 30.0, data.sum(0), (data**2).sum(0))
    qs = [Question("left", frozenset([1]), "L1")]
    tree = CartTree.train(ex, qs, max_leaves=4, separate={0: [sil_key]})
    assert tree.classify_key(sil_key) == 0
    assert tree.classify_key((1, 9, 0, 0)) != tree.classify_key((2, 9, 0, 0))
    path = str(tmp_path / "tree.json")
    tree.save(path)
    tree2 = CartTree.load(path)
    for key in [sil_key, (1, 9, 0, 0), (2, 9, 0, 0), (1, 9, 3, 0)]:
        assert tree.classify_key(key) == tree2.classify_key(key)
    assert tree2.num_classes == tree.num_classes


def test_default_questions(rng):
    from rasr_tpu.corpus.lexicon import Lexicon, build_default_silence

    lex = Lexicon()
    build_default_silence(lex)
    lex.add_lemma(["X"], [(["a", "b"], 0.0)])
    qs = default_questions(lex, groups={"AB": ["a", "b"]})
    names = {q.name for q in qs}
    assert "left=a" in names and "leftinAB" in names and "state=0" in names
    assert "center=#" in names


def test_variance_tying_pooled_and_mixture(rng):
    """Tied-variance estimation == count-weighted within-density scatter
    oracle (ref: Mm pooled covariances)."""
    M, D, n = 3, 4, 900
    means_true = rng.normal(size=(M, D)).astype(np.float32) * 2
    labels = rng.integers(0, M, size=n).astype(np.int32)
    data = (means_true[labels] + rng.normal(size=(n, D)) * (1.0 + labels[:, None] * 0.5)).astype(np.float32)
    model = MixtureSet.single_density(means_true, np.ones((M, D), np.float32))
    acc = GmmAccumulator.zeros(M, 1, D)
    accumulate(acc, model, data, labels)

    pooled = estimate(acc, variance_floor_factor=0.0, variance_tying="pooled")
    mix = estimate(acc, variance_floor_factor=0.0, variance_tying="mixture")
    plain = estimate(acc, variance_floor_factor=0.0)

    # oracle: within-class scatter per mixture / globally
    want_mix = np.stack(
        [data[labels == m].var(0) for m in range(M)]
    )
    counts = np.array([(labels == m).sum() for m in range(M)], np.float64)
    want_pool = (want_mix * counts[:, None]).sum(0) / counts.sum()

    for m in range(M):
        np.testing.assert_allclose(mix.variances[m, 0], want_mix[m], rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(pooled.variances[m, 0], want_pool, rtol=1e-3, atol=1e-3)
        # means unchanged by the tying
        np.testing.assert_allclose(pooled.means[m, 0], plain.means[m, 0], rtol=1e-5)
    # per-density estimation differs from pooled when classes differ
    assert not np.allclose(plain.variances[0, 0], plain.variances[2, 0], rtol=0.05)
