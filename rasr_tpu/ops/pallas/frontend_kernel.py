"""Fused MFCC frontend Pallas kernel (windowed DFT -> mel -> log -> DCT).

The jnp frontend (ops/frontend.py) runs four separate matmuls with the
power spectrum and mel energies round-tripping through HBM. This kernel
keeps the whole per-frame chain in VMEM: one grid step loads a tile of
frames and produces cepstra directly — power spectrum and filterbank
energies never leave the chip. The Hamming window is folded into the
DFT bases (diag(w)·C), so the kernel body is four MXU dots plus
elementwise ops.

All operand minor dimensions are zero-padded to lane multiples (zeros
cannot contribute: padded spectrum bins have zero filters, padded mel
channels have zero DCT rows). Used via ``mfcc_frames_fused`` — a
drop-in for ``mfcc_from_frames``; ``interpret=True`` runs on CPU for
tests. (ref: src/Signal/ FFT/FilterBank/Cepstrum nodes — here a single
fused tensor program, SURVEY §7 M2.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..frontend import FrontendConfig, FrontendParams


def _pad_to(a: np.ndarray, rows: int, cols: int) -> np.ndarray:
    out = np.zeros((rows, cols), np.float32)
    out[: a.shape[0], : a.shape[1]] = a
    return out


def _kernel(x_ref, cosw_ref, sinw_ref, mel_ref, dct_ref, out_ref, *, log_floor):
    x = x_ref[:]
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(x, cosw_ref[:], preferred_element_type=jnp.float32, precision=hi)
    im = jnp.dot(x, sinw_ref[:], preferred_element_type=jnp.float32, precision=hi)
    power = re * re + im * im
    mel_e = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                    precision=hi)
    log_mel = jnp.log(jnp.maximum(mel_e, log_floor))
    out_ref[:] = jnp.dot(log_mel, dct_ref[:], preferred_element_type=jnp.float32,
                         precision=hi)


def mfcc_frames_fused(
    frames: jnp.ndarray,  # [..., T, L] (un-windowed frames)
    params: FrontendParams,
    cfg: FrontendConfig,
    tile_n: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """[..., T, L] -> [..., T, C] fused MFCC (drop-in for
    mfcc_from_frames; append_energy is not fused — use the jnp path)."""
    if cfg.append_energy:
        raise NotImplementedError("fused kernel: append_energy unsupported")
    lead = frames.shape[:-1]
    L = frames.shape[-1]
    x = frames.reshape(-1, L)
    N = x.shape[0]

    def ceil_to(v, m):
        return ((v + m - 1) // m) * m

    win = np.asarray(params.window)
    cosb = np.asarray(params.dft_cos) * win[:, None]
    sinb = np.asarray(params.dft_sin) * win[:, None]
    mel = np.asarray(params.mel)
    dct = np.asarray(params.dct)
    K = cosb.shape[1]
    M = mel.shape[1]
    C = dct.shape[1]
    Lp, Kp, Mp, Cp = (ceil_to(v, 128) for v in (L, K, M, C))
    Np = ceil_to(max(N, 1), tile_n)

    xp = jnp.zeros((Np, Lp), jnp.float32).at[:N, :L].set(x)
    cosw = jnp.asarray(_pad_to(cosb, Lp, Kp))
    sinw = jnp.asarray(_pad_to(sinb, Lp, Kp))
    melp = jnp.asarray(_pad_to(mel, Kp, Mp))
    dctp = jnp.asarray(_pad_to(dct, Mp, Cp))

    out = pl.pallas_call(
        functools.partial(_kernel, log_floor=cfg.log_floor),
        grid=(Np // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, Lp), lambda i: (i, 0)),
            pl.BlockSpec((Lp, Kp), lambda i: (0, 0)),
            pl.BlockSpec((Lp, Kp), lambda i: (0, 0)),
            pl.BlockSpec((Kp, Mp), lambda i: (0, 0)),
            pl.BlockSpec((Mp, Cp), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_n, Cp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, Cp), jnp.float32),
        interpret=interpret,
    )(xp, cosw, sinw, melp, dctp)
    return out[:N, :C].reshape(*lead, C)
