"""Batched acoustic feature frontend (MFCC / filterbank / LDA).

TPU-native replacement for the reference's Flow DSP chain
(ref: src/Signal/Preemphasis.*, Window.*, FastFourierTransform.*,
FilterBank.*, Cepstrum.*, Normalization.*, Regression.*, and the
matrix-multiplication/LDA flow node). Where the reference pulls one frame
at a time through an XML dataflow graph, this frontend maps whole padded
utterance batches ``[B, S]`` to feature tensors ``[B, T, D]`` in one jitted
program.

Design notes (TPU-first):

* Framing is a strided gather (reshape-friendly), windowing a broadcast
  multiply.
* The power spectrum is computed either via ``jnp.fft.rfft`` or as a
  **real DFT by matmul** with precomputed cos/sin bases — the matmul path
  rides the MXU and fuses with the surrounding elementwise ops under XLA.
  An opt-in fused Pallas kernel (ops/pallas/frontend_kernel) keeps the
  whole windowed-DFT→mel→log→DCT chain in VMEM (``use_pallas=True``).
* Mel filterbank, DCT (cepstrum) and LDA are all matmuls by construction.
* CMVN masks padded frames; all shapes are static (bucketed batches).

Everything is pure-functional over a precomputed :class:`FrontendParams`
constant pytree, so the whole chain jits/vmaps/shards.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------- config
@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Static frontend hyperparameters (defaults mirror the classic RASR
    MFCC pipeline: 25ms/10ms Hamming frames, preemphasis 1.0, mel
    filterbank, 16 cepstral coefficients, per-segment mean/variance
    normalization)."""

    sample_rate: int = 16000
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    preemphasis: float = 1.0
    window: str = "hamming"  # hamming | hanning | rectangular
    fft_size: int = 0  # 0 = next pow2 >= frame_length
    use_matmul_dft: bool = True
    num_mel: int = 20
    fmin: float = 0.0
    fmax: float = 0.0  # 0 = nyquist
    num_cepstra: int = 16
    dct_norm: str = "rasr"  # rasr (scale 2/num_mel-ish) | ortho
    #: sinusoidal cepstral liftering (ref: src/Signal/Cepstrum.* optional
    #: liftering; HTK-style c_k *= 1 + (L/2) sin(pi k / L)). 0 = off.
    #: Folded into the DCT matrix, so it costs nothing at runtime.
    cep_lifter: float = 0.0
    log_floor: float = 1e-10
    append_energy: bool = False
    normalize: str = "segment"  # none | segment | sliding (cyclic window)
    norm_variance: bool = True
    norm_window: int = 300  # frames, for normalize="sliding"

    @property
    def frame_length(self) -> int:
        return int(round(self.sample_rate * self.frame_length_ms / 1000.0))

    @property
    def frame_shift(self) -> int:
        return int(round(self.sample_rate * self.frame_shift_ms / 1000.0))

    @property
    def padded_fft_size(self) -> int:
        if self.fft_size:
            return self.fft_size
        n = 1
        while n < self.frame_length:
            n *= 2
        return n

    @property
    def num_bins(self) -> int:
        return self.padded_fft_size // 2 + 1

    @property
    def output_dim(self) -> int:
        return self.num_cepstra + (1 if self.append_energy else 0)


# ----------------------------------------------------------------- basis math
def window_function(kind: str, length: int) -> np.ndarray:
    n = np.arange(length)
    if kind == "hamming":
        return (0.54 - 0.46 * np.cos(2 * np.pi * n / (length - 1))).astype(np.float32)
    if kind == "hanning":
        return (0.5 - 0.5 * np.cos(2 * np.pi * n / (length - 1))).astype(np.float32)
    if kind == "rectangular":
        return np.ones(length, np.float32)
    raise ValueError(f"unknown window {kind!r}")


def dft_matrices(frame_length: int, fft_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real-DFT bases: power[k] = (x·C)[k]^2 + (x·S)[k]^2.

    Shapes ``[frame_length, num_bins]`` — zero-padding to fft_size is
    implicit (samples beyond frame_length contribute nothing).
    """
    bins = fft_size // 2 + 1
    t = np.arange(frame_length)[:, None]
    k = np.arange(bins)[None, :]
    ang = 2.0 * np.pi * t * k / fft_size
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def mel_filterbank(
    num_mel: int, num_bins: int, fft_size: int, sample_rate: int,
    fmin: float = 0.0, fmax: float = 0.0,
) -> np.ndarray:
    """HTK-style triangular mel filterbank, shape ``[num_bins, num_mel]``."""
    if fmax <= 0.0:
        fmax = sample_rate / 2.0
    mel_points = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), num_mel + 2)
    hz_points = mel_to_hz(mel_points)
    bin_freqs = np.arange(num_bins) * sample_rate / fft_size
    fb = np.zeros((num_bins, num_mel), np.float32)
    for m in range(num_mel):
        lo, ctr, hi = hz_points[m], hz_points[m + 1], hz_points[m + 2]
        up = (bin_freqs - lo) / max(ctr - lo, 1e-9)
        down = (hi - bin_freqs) / max(hi - ctr, 1e-9)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb


def dct_matrix(num_mel: int, num_cepstra: int, norm: str = "rasr") -> np.ndarray:
    """DCT-II basis ``[num_mel, num_cepstra]`` (cepstrum extraction)."""
    m = np.arange(num_mel)[:, None]
    k = np.arange(num_cepstra)[None, :]
    basis = np.cos(np.pi * k * (2 * m + 1) / (2.0 * num_mel))
    if norm == "ortho":
        basis *= np.sqrt(2.0 / num_mel)
        basis[:, 0] *= 1.0 / np.sqrt(2.0)
    else:  # rasr-style plain scaling
        basis *= 2.0 / num_mel
    return basis.astype(np.float32)


def lifter_coeffs(num_cepstra: int, lifter: float) -> np.ndarray:
    """Sinusoidal liftering coefficients ``[C]`` (identity for lifter<=0)."""
    if lifter <= 0:
        return np.ones(num_cepstra, np.float32)
    k = np.arange(num_cepstra)
    return (1.0 + lifter / 2.0 * np.sin(np.pi * k / lifter)).astype(np.float32)


# ------------------------------------------------------------------ parameters
@dataclasses.dataclass(frozen=True)
class FrontendParams:
    """Constant tensors for the jitted frontend (a pytree)."""

    window: jnp.ndarray  # [L]
    dft_cos: jnp.ndarray  # [L, K]
    dft_sin: jnp.ndarray  # [L, K]
    mel: jnp.ndarray  # [K, M]
    dct: jnp.ndarray  # [M, C]


jax.tree_util.register_pytree_node(
    FrontendParams,
    lambda p: ((p.window, p.dft_cos, p.dft_sin, p.mel, p.dct), None),
    lambda aux, ch: FrontendParams(*ch),
)


def make_params(cfg: FrontendConfig) -> FrontendParams:
    cos_b, sin_b = dft_matrices(cfg.frame_length, cfg.padded_fft_size)
    return FrontendParams(
        window=jnp.asarray(window_function(cfg.window, cfg.frame_length)),
        dft_cos=jnp.asarray(cos_b),
        dft_sin=jnp.asarray(sin_b),
        mel=jnp.asarray(
            mel_filterbank(
                cfg.num_mel, cfg.num_bins, cfg.padded_fft_size,
                cfg.sample_rate, cfg.fmin, cfg.fmax,
            )
        ),
        dct=jnp.asarray(
            dct_matrix(cfg.num_mel, cfg.num_cepstra, cfg.dct_norm)
            * lifter_coeffs(cfg.num_cepstra, cfg.cep_lifter)[None, :]
        ),
    )


# ------------------------------------------------------------------- pipeline
def num_frames(num_samples: int, cfg: FrontendConfig) -> int:
    """Frames fully covered by the signal (no partial tail frames)."""
    if num_samples < cfg.frame_length:
        return 0
    return 1 + (num_samples - cfg.frame_length) // cfg.frame_shift


def preemphasize(x: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """y[t] = x[t] - alpha*x[t-1] (first sample: x[0] kept, like a zero
    history — ref: Signal::Preemphasis)."""
    if alpha == 0.0:
        return x
    shifted = jnp.pad(x[..., :-1], [(0, 0)] * (x.ndim - 1) + [(1, 0)])
    return x - alpha * shifted


def frame_signal(x: jnp.ndarray, max_frames: int, cfg: FrontendConfig) -> jnp.ndarray:
    """[..., S] -> [..., max_frames, frame_length] strided framing."""
    L, H = cfg.frame_length, cfg.frame_shift
    needed = (max_frames - 1) * H + L if max_frames > 0 else L
    pad = max(0, needed - x.shape[-1])
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    idx = (np.arange(max_frames) * H)[:, None] + np.arange(L)[None, :]
    return x[..., idx]


def power_spectrum(
    frames: jnp.ndarray, params: FrontendParams, cfg: FrontendConfig
) -> jnp.ndarray:
    """[..., T, L] -> [..., T, K] power spectrum (matmul-DFT or rfft)."""
    windowed = frames * params.window
    if cfg.use_matmul_dft:
        re = jnp.matmul(windowed, params.dft_cos, precision=jax.lax.Precision.HIGHEST)
        im = jnp.matmul(windowed, params.dft_sin, precision=jax.lax.Precision.HIGHEST)
        return re * re + im * im
    spec = jnp.fft.rfft(windowed, n=cfg.padded_fft_size, axis=-1)
    return jnp.abs(spec).astype(jnp.float32) ** 2


def mfcc_from_frames(
    frames: jnp.ndarray, params: FrontendParams, cfg: FrontendConfig
) -> jnp.ndarray:
    """[..., T, L] windowing → power → mel → log → DCT = [..., T, C]."""
    power = power_spectrum(frames, params, cfg)
    mel_energies = jnp.matmul(power, params.mel, precision=jax.lax.Precision.HIGHEST)
    log_mel = jnp.log(jnp.maximum(mel_energies, cfg.log_floor))
    ceps = jnp.matmul(log_mel, params.dct, precision=jax.lax.Precision.HIGHEST)
    if cfg.append_energy:
        energy = jnp.log(jnp.maximum(jnp.sum(power, axis=-1, keepdims=True), cfg.log_floor))
        ceps = jnp.concatenate([ceps, energy], axis=-1)
    return ceps


def cmvn(
    feats: jnp.ndarray, frame_mask: jnp.ndarray, norm_variance: bool = True,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Per-segment mean (and variance) normalization over valid frames.

    feats ``[..., T, D]``, frame_mask ``[..., T]`` (1 = valid).
    (ref: Signal::Normalization, segmentwise mode.)
    """
    mask = frame_mask[..., None]
    count = jnp.maximum(jnp.sum(mask, axis=-2, keepdims=True), 1.0)
    mean = jnp.sum(feats * mask, axis=-2, keepdims=True) / count
    out = (feats - mean) * mask
    if norm_variance:
        var = jnp.sum(out * out * mask, axis=-2, keepdims=True) / count
        out = out * jax.lax.rsqrt(var + eps)
    return out


def sliding_cmvn(
    feats: jnp.ndarray,
    frame_mask: jnp.ndarray,
    window: int = 300,
    norm_variance: bool = True,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Sliding-window (cyclic) mean/variance normalization.

    Each frame normalizes by statistics of the ±window/2 frames around it
    (clipped at segment edges), the reference's cyclic normalization mode
    (ref: Signal::Normalization with a bounded history) — used for long
    recordings where segment-global CMVN lags. Implemented with cumulative
    sums: O(T·D), jit-friendly.
    """
    mask = frame_mask[..., None]
    x = feats * mask
    half = window // 2
    T = feats.shape[-2]
    csum = jnp.cumsum(x, axis=-2)
    csum2 = jnp.cumsum(x * x, axis=-2)
    cnt = jnp.cumsum(mask, axis=-2)

    def rangesum(c):
        zero = jnp.zeros_like(c[..., :1, :])
        padded = jnp.concatenate([zero, c], axis=-2)
        idx_hi = np.minimum(np.arange(T) + half + 1, T)
        idx_lo = np.maximum(np.arange(T) - half, 0)
        return padded[..., idx_hi, :] - padded[..., idx_lo, :]

    n = jnp.maximum(rangesum(cnt), 1.0)
    mean = rangesum(csum) / n
    out = (feats - mean) * mask
    if norm_variance:
        var = jnp.maximum(rangesum(csum2) / n - mean * mean, eps)
        out = out * jax.lax.rsqrt(var)
    return out


def edge_fill(feats: jnp.ndarray, n_frames: jnp.ndarray) -> jnp.ndarray:
    """Replace padding frames with each row's LAST VALID frame.

    ``feats [B, T, D]``, ``n_frames [B]``. With the padding pre-filled,
    the buffer-edge index clipping of :func:`splice`/:func:`deltas`
    realizes per-SEGMENT edge replication — the reference's per-segment
    boundary semantics (its Flow nodes stream one segment at a time, so
    regression/splicing always replicates the true segment edge). Without
    it, batch padding zeros leak into the context windows of the last
    frames of every shorter-than-buffer utterance, making features depend
    on batch packing. Rows with ``n == 0`` fill from frame 0 (masked to
    zero downstream)."""
    B, T = feats.shape[0], feats.shape[-2]
    tidx = jnp.minimum(
        jnp.arange(T, dtype=jnp.int32)[None, :],
        jnp.maximum(n_frames.astype(jnp.int32) - 1, 0)[:, None],
    )  # [B, T]
    off = jnp.asarray((np.arange(B, dtype=np.int32) * T)[:, None])
    return feats.reshape((B * T,) + feats.shape[2:])[tidx + off]


def splice(feats: jnp.ndarray, context: int) -> jnp.ndarray:
    """[..., T, D] -> [..., T, (2*context+1)*D] with edge replication.

    (ref: vector-concat Flow node feeding LDA, typ. ±4.)
    """
    T = feats.shape[-2]
    pieces = []
    for off in range(-context, context + 1):
        idx = np.clip(np.arange(T) + off, 0, T - 1)
        pieces.append(feats[..., idx, :])
    return jnp.concatenate(pieces, axis=-1)


def deltas(
    feats: jnp.ndarray, order: int = 2, window: int = 2,
    n_frames: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Append regression-based delta features (ref: Signal::Regression).

    With ``n_frames`` (requires ``[B, T, D]`` input), each order's output
    is re-filled past every row's segment end (:func:`edge_fill`) so the
    next order's clipped window reads the true per-segment edge value —
    matching the reference's per-segment streaming exactly; the caller is
    expected to have edge-filled the input likewise."""
    out = [feats]
    cur = feats
    denom = 2.0 * sum(i * i for i in range(1, window + 1))
    T = feats.shape[-2]
    for _ in range(order):
        acc = jnp.zeros_like(cur)
        for i in range(1, window + 1):
            fwd = cur[..., np.clip(np.arange(T) + i, 0, T - 1), :]
            bwd = cur[..., np.clip(np.arange(T) - i, 0, T - 1), :]
            acc = acc + i * (fwd - bwd)
        cur = acc / denom
        if n_frames is not None:
            cur = edge_fill(cur, n_frames)
        out.append(cur)
    return jnp.concatenate(out, axis=-1)


def apply_lda(feats: jnp.ndarray, lda: jnp.ndarray) -> jnp.ndarray:
    """Project spliced features with an LDA matrix ``[D_in, D_out]``."""
    return jnp.matmul(feats, lda, precision=jax.lax.Precision.HIGHEST)


# ------------------------------------------------------------------- frontend
class FeatureFrontend:
    """End-to-end batched frontend: samples → (spliced+LDA'd) features.

    ``lda`` is optional; without it the output is (normalized) cepstra,
    optionally spliced. The callable is jit-compiled per (B, S) shape.
    """

    def __init__(
        self,
        cfg: FrontendConfig = FrontendConfig(),
        splice_context: int = 0,
        lda: Optional[np.ndarray] = None,
        delta_order: int = 0,
        vtln_warp: Optional[np.ndarray] = None,
        use_pallas: bool = False,
    ):
        self.cfg = cfg
        self.splice_context = splice_context
        self.delta_order = delta_order
        # opt-in fused Pallas MFCC kernel (ops/pallas/frontend_kernel):
        # kept off by default because remote TPU Pallas compiles are slow
        self.use_pallas = use_pallas
        self.params = make_params(cfg)
        self.lda = None if lda is None else jnp.asarray(lda, jnp.float32)
        # VTLN: warp matrix [K, K] applied on the power spectrum before
        # the mel filterbank (ref: Signal::Warping applied in the filter
        # stage); folded into the mel matrix so it costs nothing extra.
        if vtln_warp is not None:
            self.params = dataclasses.replace(
                self.params,
                mel=jnp.asarray(
                    np.asarray(vtln_warp, np.float32) @ np.asarray(self.params.mel)
                ),
            )
        self._jitted = jax.jit(self._forward, static_argnames=("max_frames",))

    @property
    def output_dim(self) -> int:
        d = self.cfg.output_dim
        if self.delta_order:
            d *= self.delta_order + 1
        if self.splice_context:
            d *= 2 * self.splice_context + 1
        if self.lda is not None:
            d = self.lda.shape[1]
        return d

    def _forward(
        self, samples: jnp.ndarray, lengths: jnp.ndarray, max_frames: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        x = preemphasize(samples.astype(jnp.float32), cfg.preemphasis)
        frames = frame_signal(x, max_frames, cfg)
        if self.use_pallas:
            from .pallas.frontend_kernel import mfcc_frames_fused

            feats = mfcc_frames_fused(frames, self.params, cfg)
        else:
            feats = mfcc_from_frames(frames, self.params, cfg)
        n_frames = jnp.where(
            lengths >= cfg.frame_length,
            1 + (lengths - cfg.frame_length) // cfg.frame_shift,
            0,
        )
        # lengths beyond the sample buffer must not claim frames that were
        # never computed
        n_frames = jnp.minimum(n_frames, max_frames)
        mask = (
            jnp.arange(max_frames)[None, :] < n_frames[:, None]
        ).astype(jnp.float32)
        if cfg.normalize == "segment":
            feats = cmvn(feats, mask, cfg.norm_variance)
        elif cfg.normalize == "sliding":
            feats = sliding_cmvn(feats, mask, cfg.norm_window, cfg.norm_variance)
        if self.delta_order or self.splice_context:
            # per-segment edge replication: context windows near each
            # row's segment end must read the true edge frame, not batch
            # padding — otherwise features depend on batch packing
            feats = edge_fill(feats, n_frames)
        if self.delta_order:
            feats = deltas(feats, self.delta_order, n_frames=n_frames)
        if self.splice_context:
            feats = splice(feats, self.splice_context)
        if self.lda is not None:
            feats = apply_lda(feats, self.lda)
        feats = feats * mask[..., None]
        return feats, n_frames

    def __call__(
        self, samples: np.ndarray, lengths: np.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """samples ``[B, S]`` float32, lengths ``[B]`` int32 →
        (features ``[B, T, D]``, frame counts ``[B]``)."""
        samples = jnp.asarray(samples)
        lengths = jnp.asarray(lengths, jnp.int32)
        max_frames = num_frames(samples.shape[-1], self.cfg)
        return self._jitted(samples, lengths, max_frames=max_frames)
