"""Higher-order (bigram) LM lookahead tables for the tree decoder.

Re-implements the reference's history-conditioned LM lookahead
(ref: src/Search/AdvancedTreeSearch/* "full-order sparse LM lookahead"
and src/Search/LmLookahead.* — per-history lookahead networks computed
lazily over a condensed tree). The TPU re-design replaces the lazy
per-history tables with a **two-level potential**, chosen so the hot
loop pays (almost) nothing:

* level 1 is the existing exact unigram potential ``la[s]``
  (tree.compute_lookahead), precomposed into per-arc deltas — free;
* level 2 is a history-conditioned **correction** that is CONSTANT
  within each first-phone subtree of the prefix tree::

      phi2(s, l) = corr[class(l), subtree(s)]
      corr[c, g] = min_{w in words(g)} cost(w | anchor_c)
                 - min_{w in words(g)} cost_unigram(w)

  Because the correction never changes along within-word arcs, every
  dense/loop/branch/skip expansion has a ZERO level-2 delta: the
  correction is added once at the root fan-out (where the subtree is
  chosen — one narrow gather over a table that is already being ranked)
  and subtracted once at word ends (riding the word-end gather the
  decoder already pays for). Exact potential shaping: path scores are
  unchanged, pruning becomes history-aware.

* **history classes**: LM automaton states map to ``num_classes``
  classes by their most recent word — the ``num_classes - 1`` most
  probable words (by unigram) anchor their own exact bigram row; all
  other histories share a neutral class with ``corr == 0`` (pure
  unigram shaping — graceful degradation, never worse than level 1).
  ``<s>`` is always an anchor so sentence starts are conditioned.

At the subtree head state h_g the combined potential is
``la[h_g] + corr[c, g] = min_w cost(w | anchor_c)`` — exactly the
bigram lookahead value of the reference's lookahead network at that
node, refined deeper in the tree by the unigram level only.

Supported networks: the within-word prefix tree (every non-root state
belongs to exactly one first-phone subtree). Across-word networks
re-enter at context roots whose fan-out rides the branch CSR, where a
subtree-constant correction would need per-arc deltas — unsupported
(``build_bigram_lookahead`` returns None; callers fall back to
unigram-only shaping).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from ..models.lm.arpa import NgramLm
from ..models.lm.ngram_tpu import state_contexts
from ..ops.viterbi import BIG
from .tree import WORD_NONE, PrefixTree


@dataclasses.dataclass
class BigramLookahead:
    """Host-side bigram lookahead tables (built once, image-cacheable).

    ``sub_state[s]`` is the first-phone-subtree id of state s, with the
    sentinel value ``num_subtrees`` for the root (and any state outside
    every subtree) — the corr table carries a zero column there, so the
    potential of the root is 0 and word-end re-entries need no add-back.
    """

    sub_state: np.ndarray  # [S] int32 in [0, num_subtrees]
    state_class: np.ndarray  # [L] int32 in [0, num_classes)
    corr: np.ndarray  # [num_classes, num_subtrees + 1] f32 (last col 0)
    anchor_words: np.ndarray  # [num_classes - 1] int32 (LM word ids)

    @property
    def num_subtrees(self) -> int:
        return self.corr.shape[1] - 1

    @property
    def num_classes(self) -> int:
        return self.corr.shape[0]


def _state_subtrees(tree: PrefixTree) -> Optional[np.ndarray]:
    """Per-state first-phone subtree id (sentinel G for the root).

    The within-word network is a tree below the root: state ids are
    created parent-before-child, so one forward sweep over the CSR arcs
    propagates each root arc's id down its whole subtree. Returns None
    when the network is not a within-word prefix tree (across-word /
    WFST networks — multiple roots, we_next re-entries)."""
    if tree.num_final_states != 1:
        return None
    if tree.we_next is not None and np.any(tree.we_next != 0):
        return None
    S = tree.num_states
    root_lo, root_hi = int(tree.arc_ptr[0]), int(tree.arc_ptr[1])
    G = root_hi - root_lo
    sub = np.full(S, G, np.int32)
    sub[tree.arc_dst[root_lo:root_hi]] = np.arange(G, dtype=np.int32)
    for s in range(1, S):
        g = sub[s]
        if g == G:
            continue  # unreachable from the root fan-out
        for ai in range(tree.arc_ptr[s], tree.arc_ptr[s + 1]):
            d = tree.arc_dst[ai]
            # in a tree every state has one in-arc chain; skip arcs stay
            # within the word, so all writers agree
            sub[d] = g
    return sub


def build_bigram_lookahead(
    tree: PrefixTree,
    lm: NgramLm,
    num_classes: int = 64,
) -> Optional[BigramLookahead]:
    """Compile bigram lookahead tables for ``tree`` against ``lm``.

    ``num_classes`` bounds the corr table height: ``num_classes - 1``
    anchor words (most probable last words, ``<s>`` always included)
    plus one neutral class. Returns None for unsupported networks."""
    if num_classes < 2:
        return None
    sub = _state_subtrees(tree)
    if sub is None:
        return None
    S = tree.num_states
    root_lo, root_hi = int(tree.arc_ptr[0]), int(tree.arc_ptr[1])
    G = root_hi - root_lo
    if G == 0:
        return None

    # ---- words per subtree (silence/no-LM word ends count as cost 0) ----
    we = tree.we_word  # [S, Wmax]
    st_of = np.repeat(np.arange(S), we.shape[1])
    wflat = we.reshape(-1)
    live = wflat != WORD_NONE
    g_of_end = sub[st_of[live]]
    w_of_end = wflat[live]
    in_tree = g_of_end < G
    g_of_end, w_of_end = g_of_end[in_tree], w_of_end[in_tree]
    if g_of_end.size == 0:
        return None

    # ---- anchor classes -------------------------------------------------
    uni = {wid: lm.score((), wid) for wid in lm.vocab.values()}
    bos = lm.vocab.get("<s>")
    ranked = sorted(uni, key=lambda w: uni[w])
    anchors: List[int] = [] if bos is None else [bos]
    for w in ranked:
        if len(anchors) >= num_classes - 1:
            break
        if w not in anchors:
            anchors.append(w)
    C = len(anchors) + 1  # + neutral "other" class
    other = C - 1

    contexts = state_contexts(lm)
    state_class = np.full(len(contexts), other, np.int32)
    a_of = {u: i for i, u in enumerate(anchors)}
    for i, ctx in enumerate(contexts):
        if ctx:
            state_class[i] = a_of.get(ctx[-1], other)

    # ---- corr[c, g] ------------------------------------------------------
    # base: per-subtree unigram minimum (matches la at the subtree head)
    costs0 = np.where(
        w_of_end >= 0,
        np.array([uni.get(int(w), 99.0) for w in w_of_end], np.float64),
        0.0,
    )
    base = np.full(G, BIG, np.float64)
    np.minimum.at(base, g_of_end, costs0)

    corr = np.zeros((C, G + 1), np.float32)
    words_uniq = np.unique(w_of_end[w_of_end >= 0])
    for ci, u in enumerate(anchors):
        ctx = lm.ngrams.get((u,))
        bo_u = ctx[1] if ctx is not None else 0.0
        big_cost = {
            int(w): (
                lm.ngrams[(u, int(w))][0]
                if (u, int(w)) in lm.ngrams
                else bo_u + uni.get(int(w), 99.0)
            )
            for w in words_uniq
        }
        costs_c = np.where(
            w_of_end >= 0,
            np.array([big_cost.get(int(w), 99.0) for w in w_of_end], np.float64),
            0.0,
        )
        mins = np.full(G, BIG, np.float64)
        np.minimum.at(mins, g_of_end, costs_c)
        row = np.where(mins < BIG / 2, mins - base, 0.0)
        corr[ci, :G] = row.astype(np.float32)

    return BigramLookahead(
        sub_state=sub,
        state_class=state_class,
        corr=corr,
        anchor_words=np.asarray(anchors, np.int32),
    )


# ------------------------------------------------------------- image caching
def save_bigram_lookahead(bla: BigramLookahead, path: str) -> None:
    np.savez_compressed(
        path,
        sub_state=bla.sub_state,
        state_class=bla.state_class,
        corr=bla.corr,
        anchor_words=bla.anchor_words,
    )


def load_bigram_lookahead(path: str) -> BigramLookahead:
    data = np.load(path, allow_pickle=False)
    return BigramLookahead(
        sub_state=data["sub_state"],
        state_class=data["state_class"],
        corr=data["corr"],
        anchor_words=data["anchor_words"],
    )
