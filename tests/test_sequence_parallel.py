"""Sequence-parallel (time-sharded) frontend + Viterbi vs dense oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from rasr_tpu.ops.frontend import FeatureFrontend, FrontendConfig
from rasr_tpu.ops.viterbi import BIG, viterbi_align
from rasr_tpu.parallel.mesh import make_mesh
from rasr_tpu.parallel.sequence import SpFrontend, sp_viterbi_align



pytestmark = pytest.mark.slow  # full tier: pytest -m "" tests/

def _tones(rng, B=2, seconds=1.2, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    samples = np.stack(
        [
            np.sin(2 * np.pi * (180 + 90 * b) * t)
            + 0.3 * np.sin(2 * np.pi * (800 + 50 * b) * t)
            + 0.01 * rng.normal(size=t.shape)
            for b in range(B)
        ]
    ).astype(np.float32)
    lengths = np.array(
        [samples.shape[1] - 1600 * b for b in range(B)], np.int32
    )
    return samples, lengths


@pytest.mark.parametrize(
    "kw",
    [
        dict(cfg=FrontendConfig(), splice_context=4),
        dict(cfg=FrontendConfig(normalize="none"), delta_order=2),
        # sliding-window stats cumsum in a different order than the dense
        # path -> ~1e-3 noise after rsqrt of small variances
        dict(
            cfg=FrontendConfig(normalize="sliding", norm_window=40),
            splice_context=2,
            delta_order=1,
            tol=3e-3,
        ),
    ],
    ids=["segment+splice", "none+deltas", "sliding+both"],
)
def test_sp_frontend_matches_dense(rng, kw):
    kw = dict(kw)
    tol = kw.pop("tol", 2e-4)
    samples, lengths = _tones(rng)
    lda = None
    dense = FeatureFrontend(lda=lda, **kw)
    ref, n_ref = dense(samples, lengths)

    mesh = make_mesh(data=4, model=2)
    sp = SpFrontend(FeatureFrontend(lda=lda, **kw), mesh)
    got, n_got = sp(samples, lengths)

    np.testing.assert_array_equal(np.asarray(n_ref), np.asarray(n_got))
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=tol, atol=tol
    )


def test_sp_frontend_with_lda(rng):
    samples, lengths = _tones(rng, seconds=0.9)
    cfg = FrontendConfig()
    lda = rng.normal(size=(16 * 9, 12)).astype(np.float32)
    dense = FeatureFrontend(cfg, splice_context=4, lda=lda)
    ref, _ = dense(samples, lengths)
    mesh = make_mesh(data=8, model=1)
    got, _ = SpFrontend(FeatureFrontend(cfg, splice_context=4, lda=lda), mesh)(
        samples, lengths
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-4, atol=3e-4)


def test_sp_frontend_rejects_too_short(rng):
    samples, lengths = _tones(rng, seconds=0.2)  # ~18 frames over 8 shards
    mesh = make_mesh(data=8, model=1)
    sp = SpFrontend(FeatureFrontend(splice_context=4), mesh)
    with pytest.raises(ValueError, match="sequence parallelism"):
        sp(samples, lengths)


def _random_hmm(rng, B, T, S):
    emis = rng.uniform(0.1, 5.0, size=(B, T, S)).astype(np.float32)
    loop = rng.uniform(0.1, 2.0, size=S).astype(np.float32)
    fwd = rng.uniform(0.1, 2.0, size=S).astype(np.float32)
    skip = rng.uniform(0.5, 3.0, size=S).astype(np.float32)
    init = np.full(S, BIG, np.float32)
    init[0] = 0.0
    init[1] = 0.8
    final = np.full(S, BIG, np.float32)
    final[S - 1] = 0.0
    final[S - 2] = 0.5
    return emis, loop, fwd, skip, init, final


def test_sp_viterbi_matches_dense(rng):
    B, T, S = 3, 37, 9
    emis, loop, fwd, skip, init, final = _random_hmm(rng, B, T, S)
    n_frames = np.array([37, 25, 11], np.int32)

    best_ref, states_ref = viterbi_align(
        jnp.asarray(emis), jnp.asarray(loop), jnp.asarray(fwd),
        jnp.asarray(skip), jnp.asarray(init), jnp.asarray(final),
        jnp.asarray(n_frames),
    )
    mesh = make_mesh(data=4, model=2)
    best, states = sp_viterbi_align(
        mesh, emis, loop, fwd, skip, init, final, n_frames
    )
    np.testing.assert_allclose(np.asarray(best), np.asarray(best_ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(states), np.asarray(states_ref))


def test_sp_viterbi_edge_lengths(rng):
    """n=1 and n=T utterances; T not divisible by the axis size."""
    B, T, S = 2, 30, 6
    emis, loop, fwd, skip, init, final = _random_hmm(rng, B, T, S)
    n_frames = np.array([1, 30], np.int32)
    best_ref, states_ref = viterbi_align(
        jnp.asarray(emis), jnp.asarray(loop), jnp.asarray(fwd),
        jnp.asarray(skip), jnp.asarray(init), jnp.asarray(final),
        jnp.asarray(n_frames),
    )
    mesh = make_mesh(data=8, model=1)
    best, states = sp_viterbi_align(
        mesh, emis, loop, fwd, skip, init, final, n_frames
    )
    np.testing.assert_allclose(np.asarray(best), np.asarray(best_ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(states), np.asarray(states_ref))
