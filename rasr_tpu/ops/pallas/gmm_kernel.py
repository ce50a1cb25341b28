"""Fused GMM scoring Pallas kernel.

The dense formulation (models/gmm.py) computes the per-density score
matrix ``[N, M*K]`` with two gemms and then reduces over the K densities
of each mixture. XLA materializes the gemm output in HBM — for
production inventories (M≈2000-9000, K≈8-32, N≈8000 frames) that is
hundreds of MB of write+read traffic for a tensor that only exists to be
min-reduced.

This kernel fuses the reduction into the matmul epilogue: a grid over
(frame tiles × mixture tiles) computes, per density index k, the
``[TN, TM]`` score block in VMEM with two MXU dots and min/LSE-combines
across k on the fly — the K axis never touches HBM. The scoring tensors
are laid out ``[K, D, M]`` (k-major) so the combine is over unit-stride
blocks; Mosaic supports no lane-splitting reshapes.

Used via mixture_scores_fused (drop-in for models.gmm.mixture_scores);
interpret=True runs on CPU for tests.
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


def _kernel(x2_ref, x_ref, a_ref, b_ref, c_ref, out_ref, *, k_densities,
            max_approx, precision):
    # x2/x: [TN, D]; a/b: [K, D, TM]; c: [K, TM]; out: [TN, TM]
    def dens_k(k):
        return (
            jnp.dot(x2_ref[:], a_ref[k], preferred_element_type=jnp.float32,
                    precision=precision)
            + jnp.dot(x_ref[:], b_ref[k], preferred_element_type=jnp.float32,
                      precision=precision)
            + c_ref[k][None, :]
        )

    if max_approx:
        acc = dens_k(0)
        for k in range(1, k_densities):
            acc = jnp.minimum(acc, dens_k(k))
        out_ref[:] = acc
    else:
        m = dens_k(0)
        for k in range(1, k_densities):
            m = jnp.minimum(m, dens_k(k))
        s = jnp.zeros_like(m)
        for k in range(k_densities):
            s = s + jnp.exp(-(dens_k(k) - m))
        out_ref[:] = m - jnp.log(s)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_mixtures", "k_densities", "max_approx", "interpret", "precision",
    ),
)
def gmm_scores_pallas(
    feats: jnp.ndarray,  # [N, D]
    a: jnp.ndarray,  # [D, M*K] (m-major, as in ScoringTensors)
    b: jnp.ndarray,  # [D, M*K]
    c: jnp.ndarray,  # [M*K]
    num_mixtures: int,
    k_densities: int,
    max_approx: bool = True,
    interpret: bool = False,
    precision: str = "highest",  # matches the XLA path's HIGHEST default
) -> jnp.ndarray:
    """[N, D] -> [N, M] fused emission scores."""
    N, D = feats.shape
    M = num_mixtures
    K = k_densities
    TN = 256
    TM = 128

    Np = _round_up(max(N, 1), TN)
    Mp = _round_up(M, TM)
    Dp = _round_up(D, 128)
    x = feats.astype(jnp.float32)
    x = jnp.pad(x, ((0, Np - N), (0, Dp - D)))
    # [D, M*K] -> k-major [K, Dp, Mp]
    a3 = jnp.pad(a.reshape(D, M, K), ((0, Dp - D), (0, Mp - M), (0, 0))).transpose(2, 0, 1)
    b3 = jnp.pad(b.reshape(D, M, K), ((0, Dp - D), (0, Mp - M), (0, 0))).transpose(2, 0, 1)
    c2 = jnp.pad(
        c.reshape(M, K), ((0, Mp - M), (0, 0)), constant_values=BIG
    ).transpose(1, 0)

    grid = (Np // TN, Mp // TM)
    out = pl.pallas_call(
        functools.partial(
            _kernel, k_densities=K, max_approx=max_approx,
            precision=(
                {"default": jax.lax.Precision.DEFAULT,
                 "high": jax.lax.Precision.HIGH,
                 "highest": jax.lax.Precision.HIGHEST}[precision]
                if isinstance(precision, str) else precision
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((Np, Mp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Dp, TM), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Dp, TM), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TM), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, TM), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Np * Dp * Mp * K,
            bytes_accessed=(2 * Np * Dp + 2 * Dp * Mp * K + Np * Mp) * 4,
            transcendentals=0 if max_approx else Np * Mp * K,
        ),
        interpret=interpret,
    )(x * x, x, a3, b3, c2)
    return out[:N, :M]


def mixture_scores_fused(
    feats: jnp.ndarray, st, max_approx: bool = True, interpret: bool = False,
    precision: str = "highest",
) -> jnp.ndarray:
    """Drop-in for models.gmm.mixture_scores using the fused kernel.

    feats [..., D] -> [..., M].
    """
    lead = feats.shape[:-1]
    flat = feats.reshape(-1, feats.shape[-1])
    out = gmm_scores_pallas(
        flat, st.a, st.b, st.c, st.num_mixtures, st.max_densities,
        max_approx=max_approx, interpret=interpret, precision=precision,
    )
    return out.reshape(*lead, st.num_mixtures)
