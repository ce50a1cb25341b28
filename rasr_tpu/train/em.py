"""GMM EM training: accumulate → (merge) → estimate → split.

Re-implements the reference's mixture-set estimation machinery
(ref: src/Mm/MixtureSetEstimator.*,
Mm::MaximumLikelihoodMixtureSetEstimator and the accumulate / combine /
estimate / split actions of src/Speech/MixtureSetTrainer.* and the
acoustic-model-trainer tool). The reference's scale-out merges
*accumulator files* from independent jobs; here accumulators are dense
device tensors reduced with ``psum`` over the data mesh (same
order-independent-sum semantics), and ``merge``/``save`` keep the
file-based path for offline combination.

Accumulation is label-based: frames carry a tied-state label (from a
Viterbi or Baum-Welch alignment, with per-frame weights), and within the
labeled mixture the statistics are distributed over densities by the
current model's density posteriors (standard EM for mixtures).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gmm import MixtureSet, ScoringTensors, make_scoring_tensors


@dataclasses.dataclass
class GmmAccumulator:
    """Sufficient statistics; mergeable by addition (ref: accumulator files).

    count ``[M, K]``, sum ``[M, K, D]``, sumsq ``[M, K, D]``.
    """

    count: np.ndarray
    sum: np.ndarray
    sumsq: np.ndarray

    @classmethod
    def zeros(cls, M: int, K: int, D: int) -> "GmmAccumulator":
        return cls(
            np.zeros((M, K), np.float64),
            np.zeros((M, K, D), np.float64),
            np.zeros((M, K, D), np.float64),
        )

    def merge(self, other: "GmmAccumulator") -> "GmmAccumulator":
        self.count += other.count
        self.sum += other.sum
        self.sumsq += other.sumsq
        return self

    def save(self, path: str) -> None:
        np.savez_compressed(path, count=self.count, sum=self.sum, sumsq=self.sumsq)

    @classmethod
    def load(cls, path: str) -> "GmmAccumulator":
        if not path.endswith(".npz"):
            path += ".npz"
        d = np.load(path)
        return cls(d["count"], d["sum"], d["sumsq"])

    @property
    def shape(self):
        return self.sum.shape


# ------------------------------------------------------------------ accumulate
@partial(jax.jit, static_argnames=("num_mixtures", "max_densities"))
def _accumulate_stats(
    feats: jnp.ndarray,  # [N, D] flattened valid frames
    labels: jnp.ndarray,  # [N] int32 mixture ids
    weights: jnp.ndarray,  # [N] f32 (gamma or 1.0; 0 for padding)
    means: jnp.ndarray,  # [M, K, D]
    variances: jnp.ndarray,  # [M, K, D]
    log_weights: jnp.ndarray,  # [M, K] (-inf-ish on padding densities)
    num_mixtures: int,
    max_densities: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-density weighted stats via within-mixture posteriors.

    Density posteriors are computed only for each frame's labeled mixture
    (a gather), not the full inventory — O(N*K*D).
    """
    mu = means[labels]  # [N, K, D]
    var = variances[labels]
    lw = log_weights[labels]  # [N, K]
    x = feats[:, None, :]
    ll = lw - 0.5 * jnp.sum(
        jnp.log(var) + (x - mu) ** 2 / var, axis=-1
    )  # [N, K] log w_k N_k up to const
    gamma = jax.nn.softmax(ll, axis=-1) * weights[:, None]  # [N, K]

    seg = partial(jax.ops.segment_sum, num_segments=num_mixtures)
    count = seg(gamma, labels)  # [M, K]
    s1 = seg(gamma[..., None] * feats[:, None, :], labels)  # [M, K, D]
    s2 = seg(gamma[..., None] * (feats**2)[:, None, :], labels)
    return count, s1, s2


def accumulate(
    acc: GmmAccumulator,
    model: MixtureSet,
    feats: np.ndarray,  # [B, T, D] or [N, D]
    labels: np.ndarray,  # [B, T] or [N]
    weights: Optional[np.ndarray] = None,
    var_floor: float = 1e-4,
) -> GmmAccumulator:
    """Add one batch of aligned frames to the accumulator."""
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

    M, K, D = model.means.shape
    mask = model.density_mask
    with np.errstate(divide="ignore"):
        lw = np.where(mask, np.log(np.maximum(model.weights, 1e-37)), -1e30)
    count, s1, s2 = _accumulate_stats(
        jnp.asarray(feats, jnp.float32),
        jnp.asarray(labels_safe),
        jnp.asarray(weights),
        jnp.asarray(model.means),
        jnp.asarray(np.maximum(model.variances, var_floor)),
        jnp.asarray(lw.astype(np.float32)),
        M,
        K,
    )
    acc.count += np.asarray(count, np.float64)
    acc.sum += np.asarray(s1, np.float64)
    acc.sumsq += np.asarray(s2, np.float64)
    return acc


# -------------------------------------------------------------------- estimate
def estimate(
    acc: GmmAccumulator,
    min_observations: float = 1.0,
    variance_floor_factor: float = 0.01,
    prev: Optional[MixtureSet] = None,
    variance_tying: str = "density",
) -> MixtureSet:
    """ML re-estimation with min-observation pruning and variance flooring.

    Densities with too few observations are dropped (their mass folds into
    the surviving densities' weight renormalization); mixtures with no
    surviving density keep their previous parameters (or a unit Gaussian).
    The variance floor is ``factor * global pooled variance`` per dim
    (ref: Mm estimation's min-observation + variance flooring).

    ``variance_tying`` (ref: Mm pooled covariances — "means/vars possibly
    pooled"): ``"density"`` = per-density diagonal (default);
    ``"mixture"`` = one diagonal covariance shared by a mixture's
    densities; ``"pooled"`` = one global diagonal covariance. Tied
    variances are the ML estimates under the tying (count-weighted
    within-density scatter over the tied group).
    """
    if variance_tying not in ("density", "mixture", "pooled"):
        raise ValueError(f"unknown variance_tying {variance_tying!r}")
    M, K, D = acc.shape
    count = acc.count  # [M, K]
    total = count.sum()
    if total <= 0:
        raise ValueError("empty accumulator")
    g_mean = acc.sum.sum((0, 1)) / total
    g_var = np.maximum(acc.sumsq.sum((0, 1)) / total - g_mean**2, 1e-8)
    floor = variance_floor_factor * g_var  # [D]

    alive = count >= min_observations  # [M, K]
    cnt = np.maximum(count, 1e-10)[..., None]
    means = acc.sum / cnt
    if variance_tying == "density":
        variances = np.maximum(acc.sumsq / cnt - means**2, floor[None, None, :])
    else:
        # within-density scatter (zero for unobserved densities)
        within = acc.sumsq - count[..., None] * means**2  # [M, K, D]
        if variance_tying == "pooled":
            pooled = np.maximum(within.sum((0, 1)) / total, floor)
            variances = np.broadcast_to(pooled, (M, K, D)).copy()
        else:  # mixture
            cm = np.maximum(count.sum(1), 1e-10)[:, None]
            vm = np.maximum(within.sum(1) / cm, floor[None, :])  # [M, D]
            variances = np.broadcast_to(vm[:, None, :], (M, K, D)).copy()

    # compact: move surviving densities to the front of each mixture row
    new_means = np.zeros_like(means, dtype=np.float32)
    new_vars = np.ones_like(variances, dtype=np.float32)
    new_w = np.zeros((M, K), np.float32)
    new_nd = np.zeros(M, np.int32)
    for m in range(M):
        idx = np.where(alive[m])[0]
        if idx.size == 0:
            if prev is not None:
                nd = int(prev.num_densities[m])
                new_means[m, :nd] = prev.means[m, :nd]
                new_vars[m, :nd] = prev.variances[m, :nd]
                new_w[m, :nd] = prev.weights[m, :nd]
                new_nd[m] = nd
            else:
                new_means[m, 0] = g_mean
                new_vars[m, 0] = g_var
                new_w[m, 0] = 1.0
                new_nd[m] = 1
            continue
        n = idx.size
        new_means[m, :n] = means[m, idx]
        new_vars[m, :n] = variances[m, idx]
        w = count[m, idx]
        new_w[m, :n] = (w / w.sum()).astype(np.float32)
        new_nd[m] = n
    return MixtureSet(new_means, new_vars, new_w, new_nd)


# ----------------------------------------------------------------------- split
def split(
    model: MixtureSet,
    acc: Optional[GmmAccumulator] = None,
    min_split_observations: float = 2.0,
    perturbation: float = 0.2,
) -> MixtureSet:
    """Density splitting: each (sufficiently observed) density becomes two,
    perturbed ±eps·sigma along each dim (ref: Mm splitting — the
    1→2→4→… mixture growing schedule)."""
    M, K, D = model.means.shape
    K2 = K * 2
    means = np.zeros((M, K2, D), np.float32)
    variances = np.ones((M, K2, D), np.float32)
    weights = np.zeros((M, K2), np.float32)
    nd = np.zeros(M, np.int32)
    for m in range(M):
        n = int(model.num_densities[m])
        out = 0
        for k in range(n):
            c = acc.count[m, k] if acc is not None else np.inf
            sigma = np.sqrt(model.variances[m, k])
            if c >= min_split_observations:
                for sign in (+1.0, -1.0):
                    means[m, out] = model.means[m, k] + sign * perturbation * sigma
                    variances[m, out] = model.variances[m, k]
                    weights[m, out] = model.weights[m, k] / 2.0
                    out += 1
            else:
                means[m, out] = model.means[m, k]
                variances[m, out] = model.variances[m, k]
                weights[m, out] = model.weights[m, k]
                out += 1
        nd[m] = out
    k_max = max(int(nd.max()), 1)
    return MixtureSet(
        means[:, :k_max], variances[:, :k_max], weights[:, :k_max], nd
    )
