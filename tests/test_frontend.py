"""Feature frontend tests against independent numpy/scipy oracles.

(SURVEY.md §4: golden-value unit tests per kernel — STFT/MFCC/LDA vs
scipy reference implementations.)
"""

import numpy as np
import pytest
import scipy.fftpack
import scipy.signal

from rasr_tpu.ops.frontend import (
    FeatureFrontend,
    FrontendConfig,
    FrontendParams,
    apply_lda,
    cmvn,
    deltas,
    dct_matrix,
    frame_signal,
    make_params,
    mel_filterbank,
    mfcc_from_frames,
    num_frames,
    power_spectrum,
    preemphasize,
    splice,
    window_function,
)

import jax.numpy as jnp


CFG = FrontendConfig(normalize="none")


def _signal(rng, n=16000 * 2):
    t = np.arange(n) / 16000.0
    return (
        0.3 * np.sin(2 * np.pi * 440 * t)
        + 0.1 * np.sin(2 * np.pi * 1330 * t + 0.5)
        + 0.01 * rng.normal(size=n)
    ).astype(np.float32)


def test_num_frames():
    cfg = CFG
    assert num_frames(399, cfg) == 0
    assert num_frames(400, cfg) == 1
    assert num_frames(560, cfg) == 2
    assert num_frames(16000, cfg) == 98


def test_preemphasis_matches_reference_formula(rng):
    x = _signal(rng, 1000)
    y = np.asarray(preemphasize(jnp.asarray(x), 0.97))
    ref = np.concatenate([[x[0] - 0.97 * 0.0], x[1:] - 0.97 * x[:-1]])
    np.testing.assert_allclose(y, ref, rtol=1e-6)


def test_framing(rng):
    x = _signal(rng, 1000)
    T = num_frames(1000, CFG)
    frames = np.asarray(frame_signal(jnp.asarray(x), T, CFG))
    assert frames.shape == (T, 400)
    for i in range(T):
        np.testing.assert_array_equal(frames[i], x[i * 160 : i * 160 + 400])


def test_power_spectrum_matmul_vs_rfft(rng):
    x = _signal(rng, 2000)
    T = num_frames(2000, CFG)
    frames = frame_signal(jnp.asarray(x), T, CFG)
    params = make_params(CFG)
    p_mm = np.asarray(power_spectrum(frames, params, CFG))
    cfg_fft = FrontendConfig(normalize="none", use_matmul_dft=False)
    p_fft = np.asarray(power_spectrum(frames, params, cfg_fft))
    np.testing.assert_allclose(p_mm, p_fft, rtol=1e-3, atol=1e-3)
    # and vs scipy oracle
    win = window_function("hamming", 400)
    oracle = np.abs(np.fft.rfft(np.asarray(frames) * win, n=512, axis=-1)) ** 2
    np.testing.assert_allclose(p_mm, oracle, rtol=1e-3, atol=1e-3)


def test_mel_filterbank_properties():
    fb = mel_filterbank(20, 257, 512, 16000)
    assert fb.shape == (257, 20)
    assert np.all(fb >= 0)
    # each filter is unimodal with a single peak near its center
    assert np.all(fb.max(axis=0) > 0.5)
    # adjacent filters overlap: column supports intersect
    for m in range(19):
        assert np.any((fb[:, m] > 0) & (fb[:, m + 1] > 0))


def test_dct_matches_scipy():
    rng = np.random.default_rng(0)
    logmel = rng.normal(size=(7, 20)).astype(np.float32)
    d_ortho = dct_matrix(20, 16, "ortho")
    ours = logmel @ d_ortho
    oracle = scipy.fftpack.dct(logmel, type=2, axis=-1, norm="ortho")[:, :16]
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_mfcc_pipeline_shapes(rng):
    x = _signal(rng)
    fe = FeatureFrontend(CFG)
    feats, n = fe(x[None, :], np.array([x.shape[0]]))
    assert feats.shape == (1, num_frames(x.shape[0], CFG), 16)
    assert int(n[0]) == num_frames(x.shape[0], CFG)


def test_cmvn_masked(rng):
    feats = jnp.asarray(rng.normal(size=(2, 50, 8)).astype(np.float32))
    mask = np.zeros((2, 50), np.float32)
    mask[0, :30] = 1
    mask[1, :50] = 1
    out = np.asarray(cmvn(feats, jnp.asarray(mask)))
    # valid region: zero mean / unit variance
    v = out[0, :30]
    np.testing.assert_allclose(v.mean(axis=0), 0, atol=1e-4)
    np.testing.assert_allclose(v.var(axis=0), 1, atol=1e-2)
    # padded region zeroed
    np.testing.assert_array_equal(out[0, 30:], 0)


def test_splice(rng):
    feats = jnp.asarray(rng.normal(size=(1, 10, 3)).astype(np.float32))
    sp = np.asarray(splice(feats, 2))
    assert sp.shape == (1, 10, 15)
    f = np.asarray(feats)[0]
    # middle frame: exact concatenation of neighbors
    np.testing.assert_array_equal(sp[0, 5], np.concatenate([f[3], f[4], f[5], f[6], f[7]]))
    # edge replication
    np.testing.assert_array_equal(sp[0, 0][:3], f[0])
    np.testing.assert_array_equal(sp[0, 0][3:6], f[0])


def test_deltas_linear_signal():
    # linear ramp -> first delta constant, second delta ~0
    T = 20
    ramp = jnp.asarray(np.arange(T, dtype=np.float32)[None, :, None])
    out = np.asarray(deltas(ramp, order=2, window=2))
    assert out.shape == (1, T, 3)
    np.testing.assert_allclose(out[0, 5:15, 1], 1.0, atol=1e-5)
    np.testing.assert_allclose(out[0, 5:15, 2], 0.0, atol=1e-5)


def test_lda_projection(rng):
    feats = jnp.asarray(rng.normal(size=(2, 5, 144)).astype(np.float32))
    lda = rng.normal(size=(144, 45)).astype(np.float32)
    out = np.asarray(apply_lda(feats, jnp.asarray(lda)))
    np.testing.assert_allclose(out, np.asarray(feats) @ lda, rtol=1e-4, atol=1e-4)


def test_full_frontend_with_splice_lda(rng):
    x = _signal(rng)
    lda = rng.normal(size=(16 * 9, 45)).astype(np.float32) * 0.1
    fe = FeatureFrontend(FrontendConfig(), splice_context=4, lda=lda)
    assert fe.output_dim == 45
    feats, n = fe(np.stack([x, x * 0.5]), np.array([x.shape[0], x.shape[0] // 2]))
    assert feats.shape[2] == 45
    # second utterance: frames beyond its length are zero
    n1 = int(n[1])
    assert np.all(np.asarray(feats)[1, n1:] == 0)
    assert np.any(np.asarray(feats)[1, : n1] != 0)


def test_batch_equals_single(rng):
    """Batched frontend == per-utterance computation (no cross-talk)."""
    xs = [
        _signal(rng, 16000),
        _signal(rng, 12000),
    ]
    cfg = FrontendConfig()
    fe = FeatureFrontend(cfg)
    S = 16000
    batch = np.zeros((2, S), np.float32)
    for i, x in enumerate(xs):
        batch[i, : len(x)] = x
    lengths = np.array([len(x) for x in xs])
    feats_b, n_b = fe(batch, lengths)
    for i, x in enumerate(xs):
        pad = np.zeros((1, S), np.float32)
        pad[0, : len(x)] = x
        feats_s, n_s = fe(pad, np.array([len(x)]))
        ni = int(n_s[0])
        assert ni == int(n_b[i])
        np.testing.assert_allclose(
            np.asarray(feats_b)[i, :ni], np.asarray(feats_s)[0, :ni],
            rtol=1e-4, atol=1e-4,
        )


def test_batch_padding_invariance_with_context(rng):
    """Features must not depend on batch packing: a short utterance in a
    longer padded buffer == the same utterance at its exact length, even
    with delta/splice context windows at the segment tail (per-segment
    edge replication — the reference streams per segment, so its
    regression/splice always replicate the true segment edge)."""
    from rasr_tpu.ops.frontend import FeatureFrontend, FrontendConfig

    x = _signal(rng, 12000)
    fe = FeatureFrontend(FrontendConfig(), splice_context=4, delta_order=2)
    f_exact, n_exact = fe(x[None, :], np.array([12000]))
    pad = np.zeros((1, 16000), np.float32)
    pad[0, : len(x)] = x
    f_padded, n_padded = fe(pad, np.array([12000]))
    n = int(n_exact[0])
    assert n == int(n_padded[0])
    np.testing.assert_allclose(
        np.asarray(f_exact)[0, :n], np.asarray(f_padded)[0, :n],
        rtol=1e-5, atol=1e-5,
    )
    # padding rows beyond each segment stay exactly zero
    assert np.all(np.asarray(f_padded)[0, n:] == 0.0)


def test_sliding_cmvn(rng):
    from rasr_tpu.ops.frontend import sliding_cmvn

    feats = jnp.asarray(rng.normal(loc=3.0, size=(1, 100, 4)).astype(np.float32))
    mask = np.ones((1, 100), np.float32)
    out = np.asarray(sliding_cmvn(feats, jnp.asarray(mask), window=30))
    # interior frames: locally near zero-mean unit-var
    mid = out[0, 30:70]
    assert abs(mid.mean()) < 0.2
    assert 0.5 < mid.std() < 1.5
    # huge window: converges to segment cmvn
    out_big = np.asarray(sliding_cmvn(feats, jnp.asarray(mask), window=10000))
    ref = np.asarray(cmvn(feats, jnp.asarray(mask)))
    np.testing.assert_allclose(out_big, ref, atol=1e-4)


def test_sliding_cmvn_respects_mask(rng):
    from rasr_tpu.ops.frontend import sliding_cmvn

    feats = jnp.asarray(rng.normal(size=(1, 50, 3)).astype(np.float32))
    mask = np.zeros((1, 50), np.float32)
    mask[0, :30] = 1
    out = np.asarray(sliding_cmvn(feats, jnp.asarray(mask), window=20))
    np.testing.assert_array_equal(out[0, 30:], 0)


def test_checkpoint_manager(tmp_path, rng):
    from rasr_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ckpts"), max_to_keep=2)
    state = {"w": np.arange(6, dtype=np.float32).reshape(2, 3), "step": 0}
    for step in (1, 2, 3):
        state["step"] = step
        mgr.save(step, state, {"loss": 0.5 / step})
    assert mgr.all_steps() == [2, 3]  # gc keeps last 2
    restored, meta = mgr.restore({"w": np.zeros((2, 3), np.float32), "step": 0})
    np.testing.assert_array_equal(restored["w"], state["w"])
    assert meta["step"] == 3 and "loss" in meta


# ----------------------------------------------------------- misc DSP ops


def test_frame_energy_matches_numpy():
    from rasr_tpu.ops.dsp import frame_energy

    rng = np.random.default_rng(0)
    frames = rng.normal(size=(2, 7, 25)).astype(np.float32)
    e = np.asarray(frame_energy(jnp.asarray(frames), log=False))
    np.testing.assert_allclose(e, (frames ** 2).sum(-1), rtol=1e-5)


def test_silence_detection_marks_tone_frames():
    from rasr_tpu.ops.dsp import frame_energy, silence_detection

    # 20 frames: silence, loud tone in 8..12, silence
    rng = np.random.default_rng(1)
    frames = rng.normal(size=(1, 20, 50)).astype(np.float32) * 1e-3
    frames[0, 8:12] += np.sin(np.linspace(0, 20, 50)).astype(np.float32)
    e = frame_energy(jnp.asarray(frames))
    mask = np.ones((1, 20), np.float32)
    speech = np.asarray(silence_detection(e, jnp.asarray(mask), hangover=1))
    assert speech[0, 8:12].all()
    assert speech[0, 7] == 1.0 and speech[0, 12] == 1.0  # hangover
    assert speech[0, :5].sum() == 0.0 and speech[0, 15:].sum() == 0.0


def test_fir_filter_matches_scipy():
    from rasr_tpu.ops.dsp import fir_filter

    scipy_signal = pytest.importorskip("scipy.signal")
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 40)).astype(np.float32)
    taps = np.array([0.5, 0.3, -0.2], np.float32)
    got = np.asarray(fir_filter(jnp.asarray(x), taps))
    want = scipy_signal.lfilter(taps, [1.0], x, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_delay_shifts():
    from rasr_tpu.ops.dsp import delay

    x = jnp.asarray(np.arange(6, dtype=np.float32)[None])
    np.testing.assert_allclose(np.asarray(delay(x, 2))[0], [0, 0, 0, 1, 2, 3])
    np.testing.assert_allclose(np.asarray(delay(x, -2))[0], [2, 3, 4, 5, 0, 0])


def test_cepstral_liftering_folds_into_dct(rng):
    """cep_lifter folds into the DCT matrix: liftered cepstra ==
    unliftered * HTK sin-lifter coefficients."""
    from rasr_tpu.ops.frontend import lifter_coeffs

    sig = (rng.normal(size=(1, 4000)) * 0.2).astype(np.float32)
    lens = np.array([4000], np.int64)
    base = FeatureFrontend(FrontendConfig(normalize="none"))
    lift = FeatureFrontend(FrontendConfig(normalize="none", cep_lifter=22.0))
    f0, n0 = base(sig, lens)
    f1, n1 = lift(sig, lens)
    co = lifter_coeffs(base.cfg.num_cepstra, 22.0)
    np.testing.assert_allclose(
        np.asarray(f1)[0, : int(n1[0])],
        np.asarray(f0)[0, : int(n0[0])] * co[None, :],
        rtol=1e-4, atol=1e-4,
    )
    assert co[0] == 1.0 and co.max() > 5.0
