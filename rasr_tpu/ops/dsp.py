"""Miscellaneous DSP ops: energy, silence detection, FIR filtering, delay.

TPU-native equivalents of the reference's remaining Signal flow nodes
(ref: src/Signal/ — energy node, silence detection, linear filtering,
delay [K?]): batched tensor programs over ``[B, T, ...]`` instead of
per-frame packet pulls. All are jit-safe with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def frame_energy(frames: jnp.ndarray, log: bool = True, floor: float = 1e-10) -> jnp.ndarray:
    """Per-frame energy of framed samples ``[..., T, L]`` -> ``[..., T]``."""
    e = jnp.sum(frames * frames, axis=-1)
    if log:
        e = jnp.log(jnp.maximum(e, floor))
    return e


def silence_detection(
    energy: jnp.ndarray,
    frame_mask: jnp.ndarray,
    threshold_db: float = 30.0,
    hangover: int = 5,
) -> jnp.ndarray:
    """Energy-based speech/silence classification per frame.

    A frame is speech if its energy is within ``threshold_db`` of the
    segment's maximum energy; speech runs are extended by ``hangover``
    frames on both sides (the reference's silence-detection node keeps
    short pauses attached to speech). energy ``[..., T]`` (log scale,
    nats), frame_mask ``[..., T]`` 1=valid. Returns float mask 1=speech.
    """
    neg = jnp.where(frame_mask > 0, energy, -jnp.inf)
    peak = jnp.max(neg, axis=-1, keepdims=True)
    thresh_nats = threshold_db * (np.log(10.0) / 10.0)
    speech = (neg > peak - thresh_nats).astype(jnp.float32)
    if hangover > 0:
        # dilate the speech mask by ±hangover via a max pool
        T = speech.shape[-1]
        idx = np.arange(T)[:, None] + np.arange(-hangover, hangover + 1)[None, :]
        idx = np.clip(idx, 0, T - 1)
        speech = jnp.max(speech[..., idx], axis=-1)
    return speech * frame_mask


def fir_filter(x: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """Causal FIR filtering along the last axis (ref: the linear-filter
    flow node). x ``[..., S]``, taps ``[ntaps]`` (tap 0 = current sample).
    Implemented as a strided matmul-friendly correlation."""
    taps = jnp.asarray(taps, x.dtype)
    n = taps.shape[0]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(n - 1, 0)])
    # window view [..., S, n] then dot with reversed taps
    S = x.shape[-1]
    idx = np.arange(S)[:, None] + np.arange(n)[None, :]
    win = xp[..., idx]
    return jnp.matmul(win, taps[::-1], precision=jax.lax.Precision.HIGHEST)


def delay(x: jnp.ndarray, frames: int) -> jnp.ndarray:
    """Shift along the last axis by ``frames`` (positive = delay),
    zero-filled (ref: delay flow node)."""
    if frames == 0:
        return x
    pads = [(0, 0)] * (x.ndim - 1)
    if frames > 0:
        return jnp.pad(x, pads + [(frames, 0)])[..., : x.shape[-1]]
    return jnp.pad(x, pads + [(0, -frames)])[..., -frames:]
