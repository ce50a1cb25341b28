"""Pallas kernel tests (interpreter mode on CPU; compiled path is
exercised on TPU by bench/graft)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rasr_tpu.models.gmm import MixtureSet, make_scoring_tensors, mixture_scores
from rasr_tpu.ops.pallas.gmm_kernel import mixture_scores_fused


def _mixtures(rng, M, K, D):
    return MixtureSet(
        means=rng.normal(size=(M, K, D)).astype(np.float32),
        variances=(0.5 + rng.uniform(size=(M, K, D))).astype(np.float32),
        weights=np.full((M, K), 1.0 / K, np.float32),
        num_densities=np.full(M, K, np.int32),
    )


@pytest.mark.parametrize("max_approx", [True, False])
def test_fused_gmm_kernel_matches_reference(rng, max_approx):
    ms = _mixtures(rng, M=7, K=3, D=5)
    st = make_scoring_tensors(ms)
    x = rng.normal(size=(11, 5)).astype(np.float32)
    ref = np.asarray(mixture_scores(jnp.asarray(x), st, max_approx))
    got = np.asarray(
        mixture_scores_fused(jnp.asarray(x), st, max_approx, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fused_gmm_kernel_ragged_and_batched(rng):
    """Non-tile-aligned sizes + leading batch dims pad correctly."""
    ms = _mixtures(rng, M=13, K=2, D=9)  # awkward sizes
    # ragged density counts: mask some via the standard padding machinery
    ms.num_densities[3] = 1
    ms.weights[3] = np.array([1.0, 0.0], np.float32)
    st = make_scoring_tensors(ms)
    x = rng.normal(size=(2, 5, 9)).astype(np.float32)
    ref = np.asarray(mixture_scores(jnp.asarray(x), st, True))
    got = np.asarray(mixture_scores_fused(jnp.asarray(x), st, True, interpret=True))
    assert got.shape == (2, 5, 13)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fused_mfcc_kernel_matches_jnp(rng):
    from rasr_tpu.ops.frontend import (
        FrontendConfig, frame_signal, make_params, mfcc_from_frames,
        preemphasize,
    )
    from rasr_tpu.ops.pallas.frontend_kernel import mfcc_frames_fused

    cfg = FrontendConfig()
    params = make_params(cfg)
    sig = rng.normal(size=(2, 16000)).astype(np.float32)
    x = preemphasize(jnp.asarray(sig), cfg.preemphasis)
    frames = frame_signal(x, 98, cfg)
    ref = np.asarray(mfcc_from_frames(frames, params, cfg))
    got = np.asarray(mfcc_frames_fused(frames, params, cfg, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_fused_mfcc_kernel_ragged_tile(rng):
    """Frame count not a multiple of the tile pads correctly."""
    from rasr_tpu.ops.frontend import FrontendConfig, make_params, mfcc_from_frames
    from rasr_tpu.ops.pallas.frontend_kernel import mfcc_frames_fused

    cfg = FrontendConfig()
    params = make_params(cfg)
    frames = rng.normal(size=(1, 7, cfg.frame_length)).astype(np.float32)
    ref = np.asarray(mfcc_from_frames(jnp.asarray(frames), params, cfg))
    got = np.asarray(
        mfcc_frames_fused(jnp.asarray(frames), params, cfg, tile_n=8, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
