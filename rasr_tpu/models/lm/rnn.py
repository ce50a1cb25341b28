"""Recurrent neural language model with hidden-state caching.

Re-implements the role of the reference's neural LM integration
(ref: src/Lm/TF* — Lm::TFRecurrentLanguageModel [MODULE_LM_TF]: a
TensorFlow RNN LM driven from C++ with interned histories, per-history
hidden-state caching and batched score requests). JAX is the native
substrate here, so the "bridge" disappears: the model is a flax LSTM,
histories are word-id tuples memoizing their hidden state, and scoring
batches jit-compile.

Primary uses: n-best/lattice rescoring (lattice/flf.rescore_lm accepts
any LanguageModel) and log-linear combination with the n-gram LM.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .interface import History, LanguageModel


class LstmLmModule(nn.Module):
    vocab_size: int
    embed_dim: int = 64
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, tokens, carry=None):
        """tokens [B, T] -> (logits [B, T, V], final carry)."""
        emb = nn.Embed(self.vocab_size, self.embed_dim, name="embed")(tokens)
        cell = nn.OptimizedLSTMCell(self.hidden_dim, name="lstm")
        B = tokens.shape[0]
        if carry is None:
            carry = cell.initialize_carry(jax.random.PRNGKey(0), (B, self.embed_dim))
        outs = []
        for t in range(emb.shape[1]):
            carry, y = cell(carry, emb[:, t])
            outs.append(y)
        h = jnp.stack(outs, axis=1)
        logits = nn.Dense(self.vocab_size, name="proj")(h)
        return logits, carry


class RnnLm(LanguageModel):
    """LSTM LM with per-history hidden-state cache (bounded LRU-ish)."""

    def __init__(self, module: LstmLmModule, params, vocab: Dict[str, int],
                 cache_size: int = 10000):
        self.module = module
        self.params = params
        self.vocab = dict(vocab)
        self.inv_vocab = {i: w for w, i in vocab.items()}
        self._bos = vocab.get("<s>", 0)
        self._cache: Dict[History, Tuple] = {}
        self._cache_size = cache_size
        self._step = jax.jit(self._step_impl)

    def _step_impl(self, params, token, carry):
        emb = self.module.apply(
            {"params": params}, token[None, None], carry,
            method=lambda m, t, c: m(t, c),
        )
        logits, new_carry = emb
        logp = jax.nn.log_softmax(logits[0, 0])
        return logp, new_carry

    def _state_of(self, history: History):
        if history in self._cache:
            return self._cache[history]
        if not history:
            carry = None
            logp = None
            # feed <s>
            logp, carry = self._step(self.params, jnp.asarray(self._bos), self._init_carry())
        else:
            prev_logp, prev_carry = self._state_of(history[:-1])
            logp, carry = self._step(self.params, jnp.asarray(history[-1]), prev_carry)
        if len(self._cache) >= self._cache_size:
            self._cache.pop(next(iter(self._cache)))
        self._cache[history] = (logp, carry)
        return self._cache[history]

    def _init_carry(self):
        cell = nn.OptimizedLSTMCell(self.module.hidden_dim)
        return cell.initialize_carry(jax.random.PRNGKey(0), (1, self.module.embed_dim))

    # ------------------------------------------------------------ LM api
    def start_history(self) -> History:
        return ()

    def extended_history(self, history: History, word: int) -> History:
        if word not in self.inv_vocab:  # OOV: fixed penalty, no context
            return tuple(history)
        return tuple(history) + (word,)

    def score(self, history: History, word: int) -> float:
        if word not in self.inv_vocab:
            return 99.0
        logp, _ = self._state_of(tuple(history))
        return float(-logp[word])

    def word_id(self, token: str) -> int:
        # OOV-safe (there is no trained <unk> embedding): -1 scores as a
        # fixed penalty and leaves the history unchanged, so generic
        # consumers (perplexity, rescoring) never crash on unseen words
        return self.vocab.get(token, -1)

    # ------------------------------------------------------------ artifacts
    def save(self, path: str) -> None:
        """Persist params + vocab (msgpack sidecar to a JSON header),
        the LM-image analog of the n-gram .lmbin (ref: the reference's
        reloadable NN-LM graphs/checkpoints)."""
        import json

        from flax import serialization

        with open(path + ".json", "w") as fh:
            json.dump(
                {
                    "vocab": self.vocab,
                    "embed_dim": self.module.embed_dim,
                    "hidden_dim": self.module.hidden_dim,
                },
                fh,
            )
        with open(path + ".msgpack", "wb") as fh:
            fh.write(serialization.to_bytes(self.params))

    @classmethod
    def load(cls, path: str, cache_size: int = 10000) -> "RnnLm":
        import json

        from flax import serialization

        with open(path + ".json") as fh:
            meta = json.load(fh)
        vocab = {w: int(i) for w, i in meta["vocab"].items()}
        module = LstmLmModule(len(vocab), int(meta["embed_dim"]),
                              int(meta["hidden_dim"]))
        template = module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1), jnp.int32)
        )["params"]
        with open(path + ".msgpack", "rb") as fh:
            params = serialization.from_bytes(template, fh.read())
        return cls(module, params, vocab, cache_size=cache_size)

    # ------------------------------------------------------------ training
    @classmethod
    def train_from_text(
        cls,
        sentences: Sequence[Sequence[str]],
        embed_dim: int = 32,
        hidden_dim: int = 64,
        epochs: int = 10,
        learning_rate: float = 0.05,
        seed: int = 0,
    ) -> "RnnLm":
        vocab = {"<s>": 0, "</s>": 1}
        for sent in sentences:
            for tok in sent:
                vocab.setdefault(tok, len(vocab))
        V = len(vocab)
        seqs = [
            [vocab["<s>"]] + [vocab[t] for t in sent] + [vocab["</s>"]]
            for sent in sentences
        ]
        T = max(len(s) for s in seqs)
        tokens = np.full((len(seqs), T), vocab["</s>"], np.int32)
        mask = np.zeros((len(seqs), T), np.float32)
        for i, s in enumerate(seqs):
            tokens[i, : len(s)] = s
            mask[i, 1 : len(s)] = 1.0  # predict positions 1..len-1
        module = LstmLmModule(V, embed_dim, hidden_dim)
        params = module.init(jax.random.PRNGKey(seed), jnp.asarray(tokens[:, :1]))["params"]
        opt = optax.adam(learning_rate)
        opt_state = opt.init(params)

        @jax.jit
        def train_step(params, opt_state, tokens, mask):
            def loss_fn(p):
                logits, _ = module.apply({"params": p}, tokens[:, :-1])
                targets = tokens[:, 1:]
                ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
                m = mask[:, 1:]
                return (ce * m).sum() / jnp.maximum(m.sum(), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        tk = jnp.asarray(tokens)
        mk = jnp.asarray(mask)
        for _ in range(epochs):
            params, opt_state, loss = train_step(params, opt_state, tk, mk)
        return cls(module, params, vocab)
