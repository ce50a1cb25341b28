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
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..models.lm.arpa import NgramLm
from ..models.lm.ngram_tpu import state_contexts
from ..ops.viterbi import BIG
from .tree import WORD_NONE, PrefixTree


@dataclasses.dataclass
class BigramLookahead:
    """Host-side bigram lookahead tables (built once, image-cacheable).

    ``sub_state[s]`` is the lookahead-node id of state s, with the
    sentinel value ``num_subtrees`` for the root (and any state outside
    every subtree) — the corr table carries a zero column there, so the
    potential of the root is 0 and word-end re-entries need no add-back.

    Two granularities (``build_bigram_lookahead(granularity=...)``):

    * ``"first-phone"``: one node per first-phone subtree. The
      correction never changes along within-word arcs, so the decoder
      pays NO per-expansion gathers (``arc_pair``/``dpair`` are None).
      Coarse: at realistic vocabularies one node covers every word
      sharing a first phone.
    * ``"word-set"``: the reference's condensed lookahead network —
      one node per distinct reachable-word SET (in a prefix tree these
      are DFS intervals, so nodes and range-minima are cheap). The
      correction now refines at every branch point down to single
      words; arcs that cross node boundaries carry a delta
      (``arc_pair[a]`` -> row of ``dpair``), which the decoder gathers
      per dense/branch expansion candidate when enabled.
    """

    sub_state: np.ndarray  # [S] int32 in [0, num_subtrees]
    state_class: np.ndarray  # [L] int32 in [0, num_classes)
    corr: np.ndarray  # [num_classes, num_subtrees + 1] f32 (last col 0)
    anchor_words: np.ndarray  # [num_classes - 1] int32 (LM word ids)
    #: word-set granularity only: per-arc node-crossing pair id (0 = no
    #: crossing; aligned with tree.arc_dst) and the per-(class, pair)
    #: correction delta table (column 0 = zeros)
    arc_pair: Optional[np.ndarray] = None  # [A] int32
    dpair: Optional[np.ndarray] = None  # [num_classes, P + 1] f32

    @property
    def num_subtrees(self) -> int:
        return self.corr.shape[1] - 1

    @property
    def num_classes(self) -> int:
        return self.corr.shape[0]

    @property
    def deep(self) -> bool:
        return self.arc_pair is not None


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


def _spanning_intervals(tree: PrefixTree):
    """DFS word-end intervals over the tree's chain-parent spanning tree.

    Skip arcs give within-word states multiple in-arcs; the CHAIN parent
    is always the in-arc with the largest source id (states are created
    in chain order, and a skip source sits two chain slots back). A DFS
    over chain arcs assigns every word-end INSTANCE a position such that
    the set reachable below any state is the contiguous interval
    [lo[s], hi[s]) — the prefix-tree form of the reference's condensed
    lookahead network nodes. Returns (lo, hi, inst_words) or None when
    the DFS cannot cover the network (non-tree structure)."""
    S = tree.num_states
    ptr = tree.arc_ptr.astype(np.int64)
    dst = tree.arc_dst.astype(np.int64)
    deg = ptr[1:] - ptr[:-1]
    src = np.repeat(np.arange(S, dtype=np.int64), deg)
    parent = np.full(S, -1, np.int64)
    np.maximum.at(parent, dst, src)
    span = src == parent[dst]
    nwe = (tree.we_word != WORD_NONE).sum(axis=1).astype(np.int64)
    lo = np.zeros(S, np.int64)
    hi = np.zeros(S, np.int64)
    visited = np.zeros(S, bool)
    inst_words: List[int] = []
    stack: List[Tuple[int, bool]] = [(0, False)]
    while stack:
        s, done = stack.pop()
        if done:
            hi[s] = len(inst_words)
            continue
        if visited[s]:
            return None  # diamond: not a spanning tree
        visited[s] = True
        lo[s] = len(inst_words)
        for k in range(int(nwe[s])):
            inst_words.append(int(tree.we_word[s, k]))
        stack.append((s, True))
        for ai in range(int(ptr[s + 1]) - 1, int(ptr[s]) - 1, -1):
            if span[ai]:
                stack.append((int(dst[ai]), False))
    return lo, hi, np.asarray(inst_words, np.int64)


def _sparse_min(v: np.ndarray):
    """Sparse range-min table over v (power-of-2 windows)."""
    tables = [v]
    k = 1
    while (1 << k) <= v.shape[0]:
        prev = tables[-1]
        half = 1 << (k - 1)
        n = v.shape[0] - (1 << k) + 1
        tables.append(np.minimum(prev[:n], prev[half : half + n]))
        k += 1
    return tables


def _range_min(tables, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Vectorized min over [lo, hi) per row (requires hi > lo)."""
    width = hi - lo
    j = np.frexp(width.astype(np.float64))[1].astype(np.int64) - 1
    out = np.empty(lo.shape, tables[0].dtype)
    for jj in np.unique(j):
        m = j == jj
        w = 1 << int(jj)
        t = tables[int(jj)]
        out[m] = np.minimum(t[lo[m]], t[hi[m] - w])
    return out


def _anchor_classes(lm: NgramLm, num_classes: int):
    """History classes by most recent word: top-(num_classes-1) unigram
    words anchor their own exact bigram row (always including <s>); the
    rest share a neutral class whose correction is zero."""
    uni = {wid: lm.score((), wid) for wid in lm.vocab.values()}
    bos = lm.vocab.get("<s>")
    ranked = sorted(uni, key=lambda w: uni[w])
    anchors: List[int] = [] if bos is None else [bos]
    for w in ranked:
        if len(anchors) >= num_classes - 1:
            break
        if w not in anchors:
            anchors.append(w)
    C = len(anchors) + 1
    other = C - 1
    contexts = state_contexts(lm)
    state_class = np.full(len(contexts), other, np.int32)
    a_of = {u: i for i, u in enumerate(anchors)}
    for i, ctx in enumerate(contexts):
        if ctx:
            state_class[i] = a_of.get(ctx[-1], other)
    return uni, anchors, state_class


def _class_costs(lm: NgramLm, uni, u: int, words: np.ndarray) -> Dict[int, float]:
    """cost(w | u) with single-level backoff semantics for each word id
    in ``words`` (the host-side bigram row for anchor u)."""
    ctx = lm.ngrams.get((u,))
    bo_u = ctx[1] if ctx is not None else 0.0
    return {
        int(w): (
            lm.ngrams[(u, int(w))][0]
            if (u, int(w)) in lm.ngrams
            else bo_u + uni.get(int(w), 99.0)
        )
        for w in words
    }


def build_bigram_lookahead(
    tree: PrefixTree,
    lm: NgramLm,
    num_classes: int = 64,
    granularity: str = "word-set",
) -> Optional[BigramLookahead]:
    """Compile bigram lookahead tables for ``tree`` against ``lm``.

    ``num_classes`` bounds the corr table height: ``num_classes - 1``
    anchor words (most probable last words, ``<s>`` always included)
    plus one neutral class. ``granularity``: "word-set" (condensed
    lookahead network, per-arc deltas — the reference-faithful
    resolution) or "first-phone" (subtree-constant correction, zero
    per-expansion cost). Returns None for unsupported networks."""
    if num_classes < 2:
        return None
    if granularity not in ("word-set", "first-phone"):
        raise ValueError(f"unknown lookahead granularity {granularity!r}")
    if granularity == "word-set":
        return _build_wordset(tree, lm, num_classes)
    return _build_first_phone(tree, lm, num_classes)


def _build_first_phone(
    tree: PrefixTree, lm: NgramLm, num_classes: int
) -> Optional[BigramLookahead]:
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

    uni, anchors, state_class = _anchor_classes(lm, num_classes)
    C = len(anchors) + 1

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
        big_cost = _class_costs(lm, uni, u, words_uniq)
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


def _build_wordset(
    tree: PrefixTree, lm: NgramLm, num_classes: int
) -> Optional[BigramLookahead]:
    """Condensed-network granularity: nodes = distinct reachable word
    sets (DFS intervals), per-arc crossing deltas."""
    if tree.num_final_states != 1:
        return None
    if tree.we_next is not None and np.any(tree.we_next != 0):
        return None
    spans = _spanning_intervals(tree)
    if spans is None:
        return None
    lo, hi, inst_words = spans
    if inst_words.size == 0:
        return None
    S = tree.num_states

    # ---- intern intervals into nodes (root + empty -> sentinel) ---------
    node_of = np.zeros(S, np.int32)
    node_key: Dict[Tuple[int, int], int] = {}
    node_lo: List[int] = []
    node_hi: List[int] = []
    for s in range(1, S):
        if hi[s] <= lo[s]:
            node_of[s] = -1  # dead end: sentinel later
            continue
        key = (int(lo[s]), int(hi[s]))
        nid = node_key.get(key)
        if nid is None:
            nid = len(node_lo)
            node_key[key] = nid
            node_lo.append(key[0])
            node_hi.append(key[1])
        node_of[s] = nid
    N = len(node_lo)
    if N == 0:
        return None
    node_of[0] = N  # root carries no correction
    node_of[node_of < 0] = N
    nlo = np.asarray(node_lo, np.int64)
    nhi = np.asarray(node_hi, np.int64)

    uni, anchors, state_class = _anchor_classes(lm, num_classes)
    C = len(anchors) + 1
    words_uniq = np.unique(inst_words[inst_words >= 0])

    # ---- corr[c, n] via range-min over the DFS word-instance order ------
    uni_inst = np.where(
        inst_words >= 0,
        np.array([uni.get(int(w), 99.0) for w in inst_words], np.float64),
        0.0,
    )
    base = _range_min(_sparse_min(uni_inst), nlo, nhi)
    corr = np.zeros((C, N + 1), np.float32)
    for ci, u in enumerate(anchors):
        big_cost = _class_costs(lm, uni, u, words_uniq)
        cost_inst = np.where(
            inst_words >= 0,
            np.array([big_cost.get(int(w), 99.0) for w in inst_words], np.float64),
            0.0,
        )
        mins = _range_min(_sparse_min(cost_inst), nlo, nhi)
        corr[ci, :N] = (mins - base).astype(np.float32)

    # ---- per-arc node-crossing pairs ------------------------------------
    ptr = tree.arc_ptr.astype(np.int64)
    deg = ptr[1:] - ptr[:-1]
    src = np.repeat(np.arange(S, dtype=np.int64), deg)
    dst = tree.arc_dst.astype(np.int64)
    A = dst.shape[0]
    ns = node_of[src]
    nd = node_of[dst]
    cross = (src >= 1) & (ns != nd)
    arc_pair = np.zeros(A, np.int32)
    pair_key: Dict[Tuple[int, int], int] = {}
    pairs: List[Tuple[int, int]] = []
    for ai in np.flatnonzero(cross):
        key = (int(ns[ai]), int(nd[ai]))
        pid = pair_key.get(key)
        if pid is None:
            pid = len(pairs) + 1  # 0 = no crossing
            pair_key[key] = pid
            pairs.append(key)
        arc_pair[ai] = pid
    P = len(pairs)
    dpair = np.zeros((C, P + 1), np.float32)
    if P:
        pns = np.asarray([p[0] for p in pairs])
        pnd = np.asarray([p[1] for p in pairs])
        dpair[:, 1:] = corr[:, pnd] - corr[:, pns]

    return BigramLookahead(
        sub_state=node_of,
        state_class=state_class,
        corr=corr,
        anchor_words=np.asarray(anchors, np.int32),
        arc_pair=arc_pair,
        dpair=dpair,
    )


# ------------------------------------------------------------- image caching
def save_bigram_lookahead(bla: BigramLookahead, path: str) -> None:
    np.savez_compressed(
        path,
        sub_state=bla.sub_state,
        state_class=bla.state_class,
        corr=bla.corr,
        anchor_words=bla.anchor_words,
        arc_pair=(
            bla.arc_pair if bla.arc_pair is not None else np.zeros(0, np.int32)
        ),
        dpair=(
            bla.dpair if bla.dpair is not None else np.zeros((0, 0), np.float32)
        ),
    )


def load_bigram_lookahead(path: str) -> BigramLookahead:
    data = np.load(path, allow_pickle=False)
    ap = data["arc_pair"] if "arc_pair" in data else np.zeros(0, np.int32)
    dp = data["dpair"] if "dpair" in data else np.zeros((0, 0), np.float32)
    return BigramLookahead(
        sub_state=data["sub_state"],
        state_class=data["state_class"],
        corr=data["corr"],
        anchor_words=data["anchor_words"],
        arc_pair=ap if ap.size else None,
        dpair=dp if dp.size else None,
    )
