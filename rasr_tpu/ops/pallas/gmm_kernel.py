"""Fused GMM scoring Pallas kernel.

The dense formulation (models/gmm.py) computes the per-density score
matrix ``[N, M*K]`` with two gemms and then reduces over the K densities
of each mixture. XLA materializes the gemm output in HBM — for
production inventories (M≈2000-9000, K≈8-32, N≈8000 frames) that is
hundreds of MB of write+read traffic for a tensor that only exists to be
min-reduced.

This kernel fuses the reduction into the matmul epilogue: a grid over
(frame tiles × mixture tiles) computes each ``[TN, TM*K]`` density block
in VMEM with two MXU dots and writes only the ``[TN, TM]`` reduced
emission scores — the K axis never touches HBM.

Used by GmmFeatureScorer via use_pallas=True (TPU backend); falls back
to the XLA path elsewhere (CPU tests run the interpreter).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..viterbi import BIG


def _kernel(x2_ref, x_ref, a_ref, b_ref, c_ref, out_ref, *, k_densities, max_approx):
    # x2/x: [TN, D]; a/b: [D, TM*K]; c: [TM*K]; out: [TN, TM]
    dens = (
        jnp.dot(x2_ref[:], a_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(x_ref[:], b_ref[:], preferred_element_type=jnp.float32)
        + c_ref[:][None, :]
    )
    tn = dens.shape[0]
    tm = dens.shape[1] // k_densities
    dens = dens.reshape(tn, tm, k_densities)
    if max_approx:
        out_ref[:] = jnp.min(dens, axis=-1)
    else:
        m = jnp.min(dens, axis=-1, keepdims=True)
        s = jnp.sum(jnp.exp(-(dens - m)), axis=-1)
        out_ref[:] = m[..., 0] - jnp.log(s)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("num_mixtures", "k_densities", "max_approx", "interpret")
)
def gmm_scores_pallas(
    feats: jnp.ndarray,  # [N, D]
    a: jnp.ndarray,  # [D, M*K]
    b: jnp.ndarray,  # [D, M*K]
    c: jnp.ndarray,  # [M*K]
    num_mixtures: int,
    k_densities: int,
    max_approx: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """[N, D] -> [N, M] fused emission scores."""
    N, D = feats.shape
    M = num_mixtures
    K = k_densities
    TN = 256
    TM = 128  # output tile last dim must be 128-aligned (Mosaic tiling)

    # pad N to TN, M to TM, D to 128-multiples for clean tiling
    Np = _round_up(max(N, 1), TN)
    Mp = _round_up(M, TM)
    Dp = _round_up(D, 128)
    x = feats.astype(jnp.float32)
    x = jnp.pad(x, ((0, Np - N), (0, Dp - D)))
    a_p = jnp.pad(a, ((0, Dp - D), (0, (Mp - M) * K)))
    b_p = jnp.pad(b, ((0, Dp - D), (0, (Mp - M) * K)))
    c_p = jnp.pad(c, (0, (Mp - M) * K), constant_values=BIG)

    grid = (Np // TN, Mp // TM)
    out = pl.pallas_call(
        functools.partial(_kernel, k_densities=K, max_approx=max_approx),
        out_shape=jax.ShapeDtypeStruct((Np, Mp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, TM * K), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, TM * K), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM * K,), lambda i, j: (j,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, TM), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Np * Dp * Mp * K,
            bytes_accessed=(2 * Np * Dp + 2 * Dp * Mp * K + Np * Mp) * 4,
            transcendentals=0 if max_approx else Np * Mp * K,
        ),
        interpret=interpret,
    )(x * x, x, a_p, b_p, c_p)
    return out[:N, :M]


def mixture_scores_fused(
    feats: jnp.ndarray, st, max_approx: bool = True, interpret: bool = False
) -> jnp.ndarray:
    """Drop-in for models.gmm.mixture_scores using the fused kernel.

    feats [..., D] -> [..., M].
    """
    lead = feats.shape[:-1]
    flat = feats.reshape(-1, feats.shape[-1])
    out = gmm_scores_pallas(
        flat, st.a, st.b, st.c, st.num_mixtures, st.max_densities,
        max_approx=max_approx, interpret=interpret,
    )
    return out.reshape(*lead, st.num_mixtures)
