"""Neural network acoustic models and the hybrid DNN-HMM scorer.

Re-implements the reference's NN layer (ref: src/Nn/NeuralNetwork.*,
NeuralNetworkLayer.* — layered FFNN with linear/bias/activation layers on
CPU/CUDA math) and its hybrid scorer
(ref: src/Nn/*FeatureScorer*, ``feature-scorer-type=nn-precomputed-hybrid``:
emission score = -log p(s|x) + kappa * log p(s), prior-divided, scaled).

TPU-natively the network is a flax module; the CPU/GPU backend switch of
the reference collapses into XLA. The TF/Python bridge modules of the
reference (src/Tensorflow/, src/Nn/Python*) are unnecessary here — JAX
is already the native substrate.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .scorer import FeatureScorer, register_scorer


_ACTS: dict = {
    "sigmoid": jax.nn.sigmoid,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
    "identity": lambda x: x,
}


class FeedForwardNet(nn.Module):
    """Hybrid FFNN over (spliced) frames: [..., D] -> [..., num_classes]
    logits. Mirrors the reference's linear+activation layer stack."""

    num_classes: int
    hidden: Sequence[int] = (512, 512)
    activation: str = "relu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _ACTS[self.activation]
        for i, width in enumerate(self.hidden):
            x = nn.Dense(width, name=f"hidden{i}")(x)
            x = act(x)
            if self.dropout > 0.0 and train:
                x = nn.Dropout(rate=self.dropout, deterministic=False)(x)
        return nn.Dense(self.num_classes, name="output")(x)


class ConvFrontendNet(nn.Module):
    """Small conv+FFNN encoder over feature windows — the "modern
    frontend" alternative (the reference reaches comparable models only
    through its TF bridge)."""

    num_classes: int
    channels: Sequence[int] = (64, 64)
    hidden: Sequence[int] = (512,)
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, T, D] -> treat D as channel-less 1D conv over time
        act = _ACTS[self.activation]
        h = x
        for i, ch in enumerate(self.channels):
            h = nn.Conv(ch, kernel_size=(3,), padding="SAME", name=f"conv{i}")(h)
            h = act(h)
        for i, width in enumerate(self.hidden):
            h = nn.Dense(width, name=f"hidden{i}")(h)
            h = act(h)
        return nn.Dense(self.num_classes, name="output")(h)


class BlstmEncoderNet(nn.Module):
    """Bidirectional-LSTM acoustic encoder over whole utterances
    [B, T, D] -> [B, T, num_classes] logits (the recurrent hybrid
    acoustic model the reference reaches only through its TF bridge,
    ref: src/Tensorflow/ TF-based feature scorers / encoder models).

    TPU-natively each direction is one ``nn.RNN`` (lax.scan over an
    OptimizedLSTMCell — gates batched into single gemms on the MXU);
    the backward direction runs on the time-reversed sequence and
    re-reverses, and directions concatenate per layer like the
    standard BLSTM stack.
    """

    num_classes: int
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, x, lengths=None, train: bool = False):
        h = x
        for i, width in enumerate(self.hidden):
            fwd = nn.RNN(nn.OptimizedLSTMCell(width), name=f"fwd{i}")(
                h, seq_lengths=lengths
            )
            bwd = nn.RNN(
                nn.OptimizedLSTMCell(width), reverse=True, keep_order=True,
                name=f"bwd{i}",
            )(h, seq_lengths=lengths)
            h = jnp.concatenate([fwd, bwd], axis=-1)
        return nn.Dense(self.num_classes, name="output")(h)


@dataclasses.dataclass
class StatePriors:
    """Class priors for hybrid scoring (ref: src/Nn/Prior.* — estimated
    from alignment label counts or model marginals)."""

    log_priors: np.ndarray  # [M] natural-log priors

    @classmethod
    def from_counts(cls, counts: np.ndarray, smoothing: float = 1.0) -> "StatePriors":
        c = np.asarray(counts, np.float64) + smoothing
        return cls(np.log(c / c.sum()).astype(np.float32))

    def save(self, path: str) -> None:
        np.save(path if path.endswith(".npy") else path + ".npy", self.log_priors)

    @classmethod
    def load(cls, path: str) -> "StatePriors":
        return cls(np.load(path if path.endswith(".npy") else path + ".npy"))


class NnHybridScorer(FeatureScorer):
    """DNN posteriors -> emission scores:
    score(s|x) = am_scale * (-log p(s|x) + prior_scale * log p(s)).
    """

    def __init__(
        self,
        model: nn.Module,
        params,
        priors: StatePriors,
        scale: float = 1.0,
        prior_scale: float = 1.0,
    ):
        self.model = model
        self.params = params
        self.log_priors = jnp.asarray(priors.log_priors)
        self.scale = scale
        self.prior_scale = prior_scale
        self.num_classes = priors.log_priors.shape[0]
        self._jit = jax.jit(self._score)

    def _score(self, feats: jnp.ndarray) -> jnp.ndarray:
        logits = self.model.apply({"params": self.params}, feats)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return self.scale * (-(logp - self.prior_scale * self.log_priors))

    def score(self, feats: jnp.ndarray) -> jnp.ndarray:
        return self._jit(jnp.asarray(feats))


register_scorer("nn-precomputed-hybrid")(NnHybridScorer)
register_scorer("nn-hybrid")(NnHybridScorer)
