"""LDA estimation: class-scatter accumulation + generalized eigensolve.

Re-implements the reference's LDA pipeline (ref: the acoustic-model-
trainer's scatter-matrix estimation actions and the Math::Lapack-backed
solve; applied by the linear-transform Flow node): spliced features with
tied-state labels accumulate within/between-class scatter on device
(matmuls), the small generalized symmetric eigenproblem solves on host
(scipy), and the resulting projection feeds ops/frontend.apply_lda.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg


@dataclasses.dataclass
class ScatterAccumulator:
    """Per-class first moments + global second moment; mergeable."""

    class_count: np.ndarray  # [C]
    class_sum: np.ndarray  # [C, D]
    total_sqsum: np.ndarray  # [D, D]

    @classmethod
    def zeros(cls, num_classes: int, dim: int) -> "ScatterAccumulator":
        return cls(
            np.zeros(num_classes, np.float64),
            np.zeros((num_classes, dim), np.float64),
            np.zeros((dim, dim), np.float64),
        )

    def merge(self, other: "ScatterAccumulator") -> "ScatterAccumulator":
        self.class_count += other.class_count
        self.class_sum += other.class_sum
        self.total_sqsum += other.total_sqsum
        return self

    def save(self, path: str) -> None:
        np.savez_compressed(
            path, class_count=self.class_count, class_sum=self.class_sum,
            total_sqsum=self.total_sqsum,
        )

    @classmethod
    def load(cls, path: str) -> "ScatterAccumulator":
        if not path.endswith(".npz"):
            path += ".npz"
        d = np.load(path)
        return cls(d["class_count"], d["class_sum"], d["total_sqsum"])


@partial(jax.jit, static_argnames=("num_classes",))
def _scatter_stats(feats, labels, weights, num_classes):
    seg = partial(jax.ops.segment_sum, num_segments=num_classes)
    w = weights[:, None]
    return (
        seg(weights, labels),
        seg(feats * w, labels),
        jnp.matmul(
            (feats * w).T, feats, precision=jax.lax.Precision.HIGHEST
        ),
    )


def accumulate_scatter(
    acc: ScatterAccumulator,
    feats: np.ndarray,  # [B, T, D] or [N, D]
    labels: np.ndarray,
    weights: Optional[np.ndarray] = None,
) -> ScatterAccumulator:
    feats = np.asarray(feats)
    labels = np.asarray(labels)
    if feats.ndim == 3:
        feats = feats.reshape(-1, feats.shape[-1])
        labels = labels.reshape(-1)
        if weights is not None:
            weights = np.asarray(weights).reshape(-1)
    if weights is None:
        weights = np.ones(labels.shape[0], np.float32)
    valid = labels >= 0
    weights = np.where(valid, weights, 0.0).astype(np.float32)
    labels_safe = np.where(valid, labels, 0).astype(np.int32)
    c, s, q = _scatter_stats(
        jnp.asarray(feats, jnp.float32), jnp.asarray(labels_safe),
        jnp.asarray(weights), acc.class_count.shape[0],
    )
    acc.class_count += np.asarray(c, np.float64)
    acc.class_sum += np.asarray(s, np.float64)
    acc.total_sqsum += np.asarray(q, np.float64)
    return acc


def estimate_lda(
    acc: ScatterAccumulator, output_dim: int, regularization: float = 1e-6
) -> Tuple[np.ndarray, np.ndarray]:
    """Solve the generalized eigenproblem B v = λ W v.

    Returns (lda matrix [D, output_dim], eigenvalues desc [output_dim]).
    """
    total = acc.class_count.sum()
    if total <= 0:
        raise ValueError("empty scatter accumulator")
    D = acc.class_sum.shape[1]
    g_mean = acc.class_sum.sum(0) / total
    total_scatter = acc.total_sqsum / total - np.outer(g_mean, g_mean)
    alive = acc.class_count > 0
    cm = acc.class_sum[alive] / acc.class_count[alive, None]  # class means
    dm = cm - g_mean
    between = (acc.class_count[alive, None, None] * dm[:, :, None] * dm[:, None, :]).sum(0) / total
    within = total_scatter - between
    within = within + regularization * np.eye(D) * np.trace(within) / D
    # symmetric generalized eig; eigh returns ascending
    vals, vecs = scipy.linalg.eigh(between, within)
    order = np.argsort(vals)[::-1][:output_dim]
    lda = vecs[:, order]
    # normalize projected within-class variance to 1 (standard whitening)
    norm = np.sqrt(np.einsum("dc,de,ec->c", lda, within, lda))
    lda = lda / np.maximum(norm, 1e-12)
    return lda.astype(np.float32), vals[order]
