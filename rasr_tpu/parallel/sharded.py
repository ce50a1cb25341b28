"""Sharded compute paths: TP GMM scoring, DP EM reduction, DP decode.

The in-process distribution layer the reference never had (SURVEY §2.8 —
its only scale-out was independent jobs + accumulator-file merges):

* **GMM inventory sharding (TP)**: scoring tensors ``[D, M*K]`` shard by
  density block over the ``model`` axis; each chip scores its block and
  the per-mixture reduction happens after an XLA-inserted allgather over
  ICI (BASELINE: "GMM inventory exceeding one chip's HBM shards by
  mixture block with scores allgathered over ICI").
* **EM accumulation (DP)**: utterance batches shard over ``data``; the
  statistics reduce with ``psum`` — the collective replacement for the
  reference's combine-accumulator-files action, with identical
  order-independent-sum semantics.
* **WER/counters**: plain psum over the data axis.

Functions here are jit-compiled with explicit NamedShardings, so XLA
inserts the collectives; they run unchanged on a single device (trivial
mesh) or a multi-host pod slice.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.gmm import MixtureSet, ScoringTensors, make_scoring_tensors


class ShardedGmmScorer:
    """GMM scorer with the density inventory sharded over the model axis.

    Drop-in for GmmFeatureScorer on a mesh: features arrive data-sharded
    [B, T, D]; the emission matrix [B, T, M] comes back data-sharded.
    """

    def __init__(
        self,
        mixtures: MixtureSet,
        mesh: Mesh,
        scale: float = 1.0,
        max_approx: bool = True,
        var_floor: float = 1e-4,
    ):
        self.mesh = mesh
        self.scale = scale
        self.max_approx = max_approx
        self.num_classes = mixtures.num_mixtures
        st = make_scoring_tensors(mixtures, var_floor)
        self.M, self.K = st.num_mixtures, st.max_densities
        # density axis (last) padded to a multiple of the model axis
        model_n = mesh.shape["model"]
        MK = st.a.shape[1]
        pad = (-MK) % (model_n * self.K)
        if pad:
            a = jnp.pad(st.a, ((0, 0), (0, pad)))
            b = jnp.pad(st.b, ((0, 0), (0, pad)))
            c = jnp.pad(st.c, (0, pad), constant_values=1e30)
        else:
            a, b, c = st.a, st.b, st.c
        tp = NamedSharding(mesh, P(None, "model"))
        tpv = NamedSharding(mesh, P("model"))
        self.a = jax.device_put(a, tp)
        self.b = jax.device_put(b, tp)
        self.c = jax.device_put(c, tpv)
        self._padded = a.shape[1]
        dp = NamedSharding(mesh, P("data"))
        self._jit = jax.jit(
            self._score,
            in_shardings=(dp, tp, tp, tpv),
            out_shardings=dp,
        )

    def _score(self, feats, a, b, c):
        x = feats.astype(jnp.float32)
        dens = (
            jnp.matmul(x * x, a, precision=jax.lax.Precision.HIGHEST)
            + jnp.matmul(x, b, precision=jax.lax.Precision.HIGHEST)
            + c
        )
        shape = (*dens.shape[:-1], self._padded // self.K, self.K)
        dens = dens.reshape(shape)
        if self.max_approx:
            red = jnp.min(dens, axis=-1)
        else:
            red = -jax.scipy.special.logsumexp(-dens, axis=-1)
        return self.scale * red[..., : self.M]

    def score(self, feats) -> jnp.ndarray:
        feats = jnp.asarray(feats)
        dn = self.mesh.shape["data"]
        pad = (-feats.shape[0]) % dn  # batch must divide the data axis
        if pad:
            feats = jnp.pad(feats, [(0, pad)] + [(0, 0)] * (feats.ndim - 1))
        with self.mesh:
            out = self._jit(feats, self.a, self.b, self.c)
        return out[: feats.shape[0] - pad] if pad else out

    __call__ = score


def make_dp_accumulate(mesh: Mesh, num_mixtures: int, max_densities: int):
    """jitted data-parallel EM statistics: [N,D] frames + labels sharded
    over 'data' -> replicated (psum-reduced) (count, sum, sumsq)."""
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def stats(feats, labels, weights, means, variances, log_weights):
        mu = means[labels]
        var = variances[labels]
        lw = log_weights[labels]
        x = feats[:, None, :]
        ll = lw - 0.5 * jnp.sum(jnp.log(var) + (x - mu) ** 2 / var, axis=-1)
        gamma = jax.nn.softmax(ll, axis=-1) * weights[:, None]
        seg = partial(jax.ops.segment_sum, num_segments=num_mixtures)
        count = seg(gamma, labels)
        s1 = seg(gamma[..., None] * feats[:, None, :], labels)
        s2 = seg(gamma[..., None] * (feats**2)[:, None, :], labels)
        return count, s1, s2

    return jax.jit(
        stats,
        in_shardings=(dp, dp, dp, rep, rep, rep),
        out_shardings=(rep, rep, rep),
    )


def dp_accumulate(
    mesh: Mesh,
    model: MixtureSet,
    feats: np.ndarray,  # [N, D] flattened valid frames (N % data divisible)
    labels: np.ndarray,
    weights: Optional[np.ndarray] = None,
    var_floor: float = 1e-4,
):
    """One data-parallel accumulation step; returns host numpy stats."""
    N = feats.shape[0]
    dn = mesh.shape["data"]
    pad = (-N) % dn
    if weights is None:
        weights = np.ones(N, np.float32)
    if pad:
        feats = np.pad(feats, ((0, pad), (0, 0)))
        labels = np.pad(labels, (0, pad))
        weights = np.pad(weights, (0, pad))
    valid = labels >= 0
    weights = np.where(valid, weights, 0.0).astype(np.float32)
    labels = np.where(valid, labels, 0).astype(np.int32)
    M, K, D = model.means.shape
    mask = model.density_mask
    with np.errstate(divide="ignore"):
        lw = np.where(mask, np.log(np.maximum(model.weights, 1e-37)), -1e30)
    fn = make_dp_accumulate(mesh, M, K)
    with mesh:
        count, s1, s2 = fn(
            jnp.asarray(feats, jnp.float32), jnp.asarray(labels),
            jnp.asarray(weights),
            jnp.asarray(model.means),
            jnp.asarray(np.maximum(model.variances, var_floor)),
            jnp.asarray(lw.astype(np.float32)),
        )
    return np.asarray(count, np.float64), np.asarray(s1, np.float64), np.asarray(s2, np.float64)


def psum_counters(mesh: Mesh, values: np.ndarray) -> np.ndarray:
    """Sum per-host counters across the data axis (WER counts etc. —
    the collective replacement for merging per-job logs)."""
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    fn = jax.jit(
        lambda v: jnp.sum(v, axis=0), in_shardings=dp, out_shardings=rep
    )
    with mesh:
        return np.asarray(fn(jnp.asarray(values)))


def dp_decode(decoder, mesh: Mesh, emissions: np.ndarray, n_frames: np.ndarray,
              names=None):
    """Data-parallel beam decode: utterance batch rows shard over the
    ``data`` axis and every chip runs the frame-synchronous scan on its
    shard — the in-process replacement for the reference's independent
    recognition jobs (SURVEY §2.8; BASELINE config #5 "multi-host
    sharded decode"). Tree/LM tables are replicated (they are read-only
    gather tables); outputs come back data-sharded and are assembled on
    host.

    ``decoder`` is a search.decoder.TreeDecoder; batch size must divide
    by the mesh's data axis.
    """
    return decoder.decode_scores(emissions, n_frames, names=names, mesh=mesh)


# ------------------------------------------------- NN tensor parallelism
def conformer_param_specs(params):
    """PartitionSpec pytree for tensor-parallel ConformerEncoderNet
    params over a ``(data, model)`` mesh (SURVEY §2.8 TP row: "NN layers
    sharded with standard pjit annotations").

    Split axes: attention heads over ``model`` (QKV kernels
    [d, H, hd] -> (None,'model',None), out kernel [H, hd, d] ->
    ('model',None,None)); FF/conv pointwise expansions column-split on
    the way in, row-split on the way out (the Megatron pattern — one
    allreduce per block half, inserted by GSPMD); depthwise-conv
    channels over ``model``. Everything else (LayerNorms, projections,
    biases of row-split layers) replicated. GSPMD keeps the math
    identical to the replicated run up to float reduction order.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    specs = {}
    COL_IN = ("ff1_in", "ff2_in", "conv_in")  # [d, 4d]-style column split
    ROW_OUT = ("ff1_out", "ff2_out", "conv_out")  # [4d, d]-style row split
    for path, leaf in flat.items():
        kind = path[-1]
        parent = path[-2] if len(path) >= 2 else ""
        grand = path[-3] if len(path) >= 3 else ""
        s = P()
        if grand == "mhsa" or parent == "mhsa":
            if parent == "out" and kind == "kernel":
                s = P("model", None, None)
            elif kind == "kernel" and leaf.ndim == 3:
                s = P(None, "model", None)
            elif kind == "bias" and leaf.ndim == 2:
                s = P("model", None)
        elif parent in COL_IN:
            s = P(None, "model") if kind == "kernel" else P("model")
        elif parent in ROW_OUT and kind == "kernel":
            s = P("model", None)
        elif parent == "conv_dw" and kind == "kernel":
            s = P(None, None, "model")  # [k, 1, channels]
        elif parent == "conv_dw" and kind == "bias":
            s = P("model")
        specs[path] = s
    return flax.traverse_util.unflatten_dict(specs)


def shard_conformer_params(params, mesh: Mesh):
    """Place conformer params TP-sharded on the mesh (device_put with
    the specs from :func:`conformer_param_specs`)."""
    specs = conformer_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def dp_fmllr_stats(
    mesh: Mesh,
    model: MixtureSet,
    feats: np.ndarray,  # [N, D] flattened valid frames
    mix_ids: np.ndarray,  # [N] aligned mixture per frame
    var_floor: float = 1e-4,
):
    """Data-parallel adaptation statistics: frames shard over 'data',
    (G, k, beta) come back replicated (XLA inserts the psum) — the
    collective form of the reference's accumulator-file merge for the
    adaptation pass (train/fmllr.py; same merge semantics as
    dp_accumulate for the EM statistics)."""
    from ..train.fmllr import FmllrModelTensors, _fmllr_stats_fn

    mt = FmllrModelTensors.from_mixture_set(model, var_floor)
    N = feats.shape[0]
    dn = mesh.shape["data"]
    pad = (-N) % dn
    valid = np.ones(N, bool)
    if pad:
        feats = np.pad(feats, ((0, pad), (0, 0)))
        mix_ids = np.pad(mix_ids, (0, pad))
        valid = np.pad(valid, (0, pad))
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    fn = jax.jit(
        _fmllr_stats_fn,
        in_shardings=(dp, dp, dp, rep),
        out_shardings=(rep, rep, rep),
    )
    G, k, beta = fn(
        jnp.asarray(feats, jnp.float32),
        jnp.asarray(mix_ids.astype(np.int32)),
        jnp.asarray(valid), mt,
    )
    return np.asarray(G, np.float64), np.asarray(k, np.float64), float(beta)
