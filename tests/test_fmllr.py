"""CMLLR/fMLLR speaker adaptation tests (train/fmllr.py).

Oracle strategy (SURVEY §4): the estimator must recover the inverse of
a known affine feature corruption under the true GMM.
"""

import numpy as np

from rasr_tpu.models.gmm import MixtureSet
from rasr_tpu.train.fmllr import (
    FmllrModelTensors,
    apply_fmllr,
    apply_speaker_transforms,
    estimate_fmllr,
    fmllr_auxiliary,
    fmllr_stats,
    load_transforms,
    save_transforms,
)


def _toy_model(rng, M=6, K=2, D=5):
    means = rng.normal(scale=3.0, size=(M, K, D)).astype(np.float32)
    var = (0.5 + rng.random((M, K, D))).astype(np.float32)
    w = np.full((M, K), 1.0 / K, np.float32)
    return MixtureSet(means, var, w, np.full(M, K, np.int32))


def _sample(rng, ms, N):
    M, K, D = ms.means.shape
    mix = rng.integers(0, M, N)
    comp = rng.integers(0, K, N)
    x = ms.means[mix, comp] + rng.normal(size=(N, D)) * np.sqrt(
        ms.variances[mix, comp]
    )
    return x.astype(np.float32), mix


def test_fmllr_recovers_affine_corruption():
    rng = np.random.default_rng(0)
    ms = _toy_model(rng)
    D = ms.dim
    x, mix = _sample(rng, ms, 4000)
    A0 = np.eye(D) + 0.15 * rng.normal(size=(D, D))
    c0 = 0.5 * rng.normal(size=D)
    xc = (x @ A0.T + c0).astype(np.float32)

    G, k, beta = fmllr_stats(xc, mix, ms)
    W = estimate_fmllr(G, k, beta, iterations=30)
    A, b = W[:, :-1], W[:, -1]
    # estimated transform inverts the corruption
    assert np.abs(A @ A0 - np.eye(D)).max() < 0.08
    assert np.abs(A @ c0 + b).max() < 0.2
    assert np.abs(apply_fmllr(xc, W) - x).mean() < 0.15
    # auxiliary improves over identity and is non-decreasing in sweeps
    ident = np.hstack([np.eye(D), np.zeros((D, 1))])
    q_prev = fmllr_auxiliary(G, k, beta, ident)
    for it in (1, 3, 30):
        q = fmllr_auxiliary(G, k, beta, estimate_fmllr(G, k, beta, iterations=it))
        assert q >= q_prev - 1e-6
        q_prev = q


def test_fmllr_stats_additive_and_min_count():
    rng = np.random.default_rng(1)
    ms = _toy_model(rng)
    x, mix = _sample(rng, ms, 400)
    G, k, beta = fmllr_stats(x, mix, ms)
    G1, k1, b1 = fmllr_stats(x[:150], mix[:150], ms)
    G2, k2, b2 = fmllr_stats(x[150:], mix[150:], ms)
    np.testing.assert_allclose(G, G1 + G2, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(k, k1 + k2, rtol=1e-4, atol=1e-3)
    assert beta == b1 + b2 == 400.0
    # thin-speaker guard: identity below min_count
    W = estimate_fmllr(G, k, beta, min_count=1000.0)
    D = ms.dim
    np.testing.assert_array_equal(W, np.hstack([np.eye(D), np.zeros((D, 1))]))


def test_apply_speaker_transforms_and_io(tmp_path):
    class Seg:
        def __init__(self, speaker):
            self.speaker = speaker

    D = 3
    W_a = np.hstack([2.0 * np.eye(D), np.ones((D, 1))])
    table = {"alice": W_a}
    path = str(tmp_path / "fmllr.json")
    save_transforms(path, table)
    loaded = load_transforms(path)
    np.testing.assert_allclose(loaded["alice"], W_a)

    feats = np.ones((2, 4, D), np.float32)
    out = apply_speaker_transforms(feats, [Seg("alice"), Seg("bob")], loaded)
    np.testing.assert_allclose(out[0], 3.0)  # 2*1 + 1
    np.testing.assert_allclose(out[1], 1.0)  # no transform -> pass-through
    # "*" default applies to unmapped speakers
    out = apply_speaker_transforms(feats, [Seg(None)], {"*": W_a})
    np.testing.assert_allclose(out[0], 3.0)


# ----------------------------------------------------------- model-space MLLR
def test_mllr_recovers_mean_corruption():
    """Mean-MLLR oracle: data from the true model, model means corrupted
    by a known affine -> the estimated transform restores the means."""
    from rasr_tpu.train.mllr import adapt_means, estimate_mllr, mllr_stats

    rng = np.random.default_rng(3)
    ms = _toy_model(rng, M=6, K=2, D=5)
    D = ms.dim
    x, mix = _sample(rng, ms, 4000)
    A0 = np.eye(D) + 0.1 * rng.normal(size=(D, D))
    c0 = 0.4 * rng.normal(size=D)
    bad = MixtureSet((ms.means @ A0.T + c0).astype(np.float32),
                     ms.variances, ms.weights, ms.num_densities)
    g, gx = mllr_stats(x, mix, bad)
    W = estimate_mllr(g, gx, bad, min_count=50.0)
    adapted = adapt_means(bad, W)
    # adapted means ~ true means (weighted by how often each density
    # was actually observed — rarely-hit densities recover less exactly)
    err = np.abs(adapted.means - ms.means).mean()
    base = np.abs(bad.means - ms.means).mean()
    assert err < 0.25 * base
    # statistics are additive
    g1, gx1 = mllr_stats(x[:1500], mix[:1500], bad)
    g2, gx2 = mllr_stats(x[1500:], mix[1500:], bad)
    np.testing.assert_allclose(g, g1 + g2, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(gx, gx1 + gx2, rtol=1e-4, atol=1e-2)


def test_mllr_regression_classes_and_min_count():
    """Two mixture blocks corrupted by DIFFERENT affines: per-class
    transforms must beat a single global one; thin classes back off."""
    from rasr_tpu.train.mllr import adapt_means, estimate_mllr, mllr_stats

    rng = np.random.default_rng(4)
    ms = _toy_model(rng, M=6, K=2, D=4)
    D = ms.dim
    x, mix = _sample(rng, ms, 6000)
    classes = np.array([0, 0, 0, 1, 1, 1])
    shifts = {0: 1.5 * np.ones(D), 1: -2.0 * np.ones(D)}
    bad_means = ms.means.copy()
    for c, sh in shifts.items():
        bad_means[classes == c] += sh
    bad = MixtureSet(bad_means.astype(np.float32), ms.variances,
                     ms.weights, ms.num_densities)
    g, gx = mllr_stats(x, mix, bad)
    W2 = estimate_mllr(g, gx, bad, classes=classes, min_count=50.0)
    W1 = estimate_mllr(g, gx, bad, min_count=50.0)
    err2 = np.abs(adapt_means(bad, W2, classes).means - ms.means).mean()
    err1 = np.abs(adapt_means(bad, W1).means - ms.means).mean()
    assert err2 < err1  # class-wise beats global under class-wise mismatch
    assert err2 < 0.3
    # min-count backoff: huge threshold -> both classes get the SAME
    # (global) transform
    Wb = estimate_mllr(g, gx, bad, classes=classes, min_count=1e7)
    np.testing.assert_array_equal(Wb[0], Wb[1])


def test_default_regression_classes():
    from rasr_tpu.train.mllr import default_regression_classes

    rng = np.random.default_rng(5)
    ms = _toy_model(rng, M=8, K=2, D=4)
    # move half the mixtures far away: the 2-class split must find it
    ms.means[4:] += 50.0
    cls = default_regression_classes(ms, 2)
    assert len(set(cls[:4])) == 1 and len(set(cls[4:])) == 1
    assert cls[0] != cls[4]
