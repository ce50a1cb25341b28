"""GMM scoring engine tests vs scipy/numpy oracles."""

import numpy as np
import pytest
import scipy.stats

import jax.numpy as jnp

from rasr_tpu.models.gmm import (
    MixtureSet,
    density_scores,
    make_scoring_tensors,
    mixture_posteriors,
    mixture_scores,
)
from rasr_tpu.models.scorer import GmmFeatureScorer, PrecomputedScorer, create_scorer


def _random_mixture_set(rng, M=5, K=3, D=8, ragged=True):
    means = rng.normal(size=(M, K, D)).astype(np.float32)
    variances = (0.5 + rng.uniform(size=(M, K, D))).astype(np.float32)
    nd = rng.integers(1, K + 1, size=M).astype(np.int32) if ragged else np.full(M, K, np.int32)
    weights = rng.uniform(0.2, 1.0, size=(M, K)).astype(np.float32)
    mask = np.arange(K)[None, :] < nd[:, None]
    weights = weights * mask
    weights /= weights.sum(axis=1, keepdims=True)
    return MixtureSet(means, variances, weights, nd)


def _oracle_nll(ms, x, mixture, max_approx):
    """Brute-force -log p(x | mixture) via scipy."""
    scores = []
    for k in range(int(ms.num_densities[mixture])):
        lp = scipy.stats.multivariate_normal.logpdf(
            x, ms.means[mixture, k], np.diag(ms.variances[mixture, k])
        )
        scores.append(np.log(ms.weights[mixture, k]) + lp)
    scores = np.array(scores)
    if max_approx:
        return -scores.max()
    return -scipy.special.logsumexp(scores)


@pytest.mark.parametrize("max_approx", [True, False])
def test_mixture_scores_match_scipy(rng, max_approx):
    ms = _random_mixture_set(rng)
    st = make_scoring_tensors(ms, var_floor=0.0)
    x = rng.normal(size=(4, ms.dim)).astype(np.float32)
    got = np.asarray(mixture_scores(jnp.asarray(x), st, max_approx))
    assert got.shape == (4, ms.num_mixtures)
    for t in range(4):
        for m in range(ms.num_mixtures):
            ref = _oracle_nll(ms, x[t], m, max_approx)
            np.testing.assert_allclose(got[t, m], ref, rtol=2e-4, atol=2e-4)


def test_padding_densities_never_win(rng):
    ms = _random_mixture_set(rng, ragged=True)
    st = make_scoring_tensors(ms)
    x = rng.normal(size=(3, ms.dim)).astype(np.float32)
    d = np.asarray(density_scores(jnp.asarray(x), st)).reshape(
        3, ms.num_mixtures, ms.max_densities
    )
    mask = ms.density_mask
    assert np.all(d[:, ~mask] > 1e29)
    assert np.all(d[:, mask] < 1e6)


def test_posteriors_sum_to_one(rng):
    ms = _random_mixture_set(rng)
    st = make_scoring_tensors(ms)
    x = rng.normal(size=(6, ms.dim)).astype(np.float32)
    gamma, total = mixture_posteriors(jnp.asarray(x), st)
    gamma = np.asarray(gamma)
    mask = ms.density_mask
    # padding densities get ~0 posterior; valid ones sum to 1
    np.testing.assert_allclose(gamma.sum(-1), 1.0, rtol=1e-5)
    assert np.all(gamma[:, ~mask] < 1e-12)
    # total equals exact logsumexp mixture score
    exact = np.asarray(mixture_scores(jnp.asarray(x), st, max_approx=False))
    np.testing.assert_allclose(np.asarray(total), exact, rtol=1e-5, atol=1e-5)


def test_scorer_interface(rng):
    ms = _random_mixture_set(rng)
    scorer = GmmFeatureScorer(ms, scale=0.5)
    feats = rng.normal(size=(2, 7, ms.dim)).astype(np.float32)
    out = np.asarray(scorer(feats))
    assert out.shape == (2, 7, ms.num_mixtures)
    unscaled = np.asarray(mixture_scores(jnp.asarray(feats), scorer.tensors, True))
    np.testing.assert_allclose(out, 0.5 * unscaled, rtol=1e-6)


def test_scorer_registry(rng):
    ms = _random_mixture_set(rng)
    scorer = create_scorer("gmm", ms)
    assert isinstance(scorer, GmmFeatureScorer)
    with pytest.raises(KeyError):
        create_scorer("bogus")


def test_precomputed_scorer(rng):
    scores = rng.normal(size=(1, 5, 10)).astype(np.float32)
    scorer = PrecomputedScorer(scores, scale=2.0)
    np.testing.assert_allclose(np.asarray(scorer.score(None)), 2.0 * scores)


def test_mixture_set_io(tmp_path, rng):
    ms = _random_mixture_set(rng)
    path = str(tmp_path / "model.mix")
    ms.save(path)
    ms2 = MixtureSet.load(path)
    np.testing.assert_array_equal(ms.means, ms2.means)
    np.testing.assert_array_equal(ms.num_densities, ms2.num_densities)


def test_single_density_and_pad(rng):
    means = rng.normal(size=(4, 6)).astype(np.float32)
    var = np.ones((4, 6), np.float32)
    ms = MixtureSet.single_density(means, var)
    assert ms.max_densities == 1 and ms.total_densities == 4
    ms8 = ms.pad_to(8)
    assert ms8.max_densities == 8
    st = make_scoring_tensors(ms8)
    x = rng.normal(size=(2, 6)).astype(np.float32)
    s1 = np.asarray(mixture_scores(jnp.asarray(x), make_scoring_tensors(ms), True))
    s8 = np.asarray(mixture_scores(jnp.asarray(x), st, True))
    np.testing.assert_allclose(s1, s8, rtol=1e-5)
