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

Supported networks: the within-word prefix tree and (word-set
granularity) the ACROSS-WORD network — context-conditioned roots carry
the zero sentinel correction, so word-end re-entries need no add-back
and the arcs leaving a context root apply corr[c, head] through the
same per-arc crossing-delta machinery as within-word node boundaries
(the state-0 fan-out keeps the decoder's pre-selected corr_arc path).
General WFST networks (junction states, non-root word-end re-entries,
cyclic dense arcs) go through ``_wordset_general``: reachable word
sets by bitset fixpoint, with the decoder adding the entry node's
correction at each junction re-entry (``BigramLookahead.reentry``) —
bounded to grammar-scale networks, above which callers fall back to
unigram-only shaping. First-phone granularity remains
within-word-only (a context root's fan does not partition into
first-phone subtrees).
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
    #: general-network (WFST) word-set tables: word-end re-entries land
    #: at non-root junction states whose node correction is nonzero, so
    #: the decoder must ADD corr[class, sub_state[entry]] to each
    #: re-entering hypothesis (and carry it as the applied phi2) — the
    #: add-back the root's zero sentinel makes unnecessary elsewhere
    reentry: bool = False

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


def _num_roots(tree: PrefixTree) -> int:
    """Count the network's leading non-emitting root states.

    Both builders (search/tree.py) allocate every root before the first
    emitting state: the within-word tree has exactly one (state 0), the
    across-word network has root/root#/root(f,G) as a contiguous prefix.
    Roots are the only non-emitting states (loop cost BIG)."""
    loops = np.asarray(tree.loop_cost)
    n = 0
    while n < tree.num_states and loops[n] >= BIG / 2:
        n += 1
    n = max(n, 1)
    # guard the inference (ADVICE r3): roots must be EXACTLY the
    # non-emitting prefix. A non-emitting state elsewhere (e.g. a
    # WFST junction, or an emitting state handed a pseudo-infinite
    # loop TDP) means the prefix-root layout assumption is wrong —
    # signal "not a root-prefixed network" instead of silently
    # mis-assigning intervals/sentinels.
    if np.any(loops[n:] >= BIG / 2):
        return -1
    return n


def _forest_intervals(tree: PrefixTree, n_roots: int):
    """DFS word-end-instance intervals over the network's spanning
    forest — VECTORIZED (level sweeps over numpy arrays instead of a
    per-state Python DFS: across-word networks reach millions of
    states; see docs/PERF.md).

    Below the roots both search networks are forests: each state's
    spanning parent is its largest non-root in-arc source (the CHAIN
    parent — states are created in chain order and a skip source sits
    earlier in the chain; shared first-phone arcs have only ROOT
    in-arcs and become forest heads). Word-end instances are numbered
    in DFS pre-order (own instances first, then children by state id),
    so the instances reachable below s form the contiguous interval
    [lo[s], hi[s]) — the dense form of the reference's condensed
    lookahead network nodes. The interval property is VERIFIED post hoc
    for every non-spanning arc (subtree containment) rather than
    assumed; returns None when it fails (general WFST graphs)."""
    S = tree.num_states
    ptr = tree.arc_ptr.astype(np.int64)
    dst = tree.arc_dst.astype(np.int64)
    deg = ptr[1:] - ptr[:-1]
    src = np.repeat(np.arange(S, dtype=np.int64), deg)
    if dst.size and np.any(src >= dst):
        return None  # both builders emit low -> high arcs only
    parent = np.full(S, -1, np.int64)
    nr = src >= n_roots
    np.maximum.at(parent, dst[nr], src[nr])
    parent[:n_roots] = -1
    par0 = np.maximum(parent, 0)

    # depth by fixpoint iteration (depth <= max word-chain length)
    depth = np.zeros(S, np.int64)
    while True:
        d2 = np.where(parent >= 0, depth[par0] + 1, 0)
        if np.array_equal(d2, depth):
            break
        depth = d2
    maxd = int(depth.max()) if S else 0

    # subtree instance counts: reverse level sweep (children complete
    # before their parent accumulates)
    own = (tree.we_word != WORD_NONE).sum(axis=1).astype(np.int64)
    own[:n_roots] = 0
    cnt = own.copy()
    for d in range(maxd, 0, -1):
        m = depth == d  # depth > 0 implies parent >= 0
        np.add.at(cnt, parent[m], cnt[m])

    # sibling exclusive prefix (children grouped by parent, id order)
    order = np.argsort(parent, kind="stable")
    grp = parent[order]
    csum = np.cumsum(cnt[order]) - cnt[order]
    first = np.concatenate([[True], grp[1:] != grp[:-1]])
    base_idx = np.maximum.accumulate(np.where(first, np.arange(S), 0))
    sib = np.zeros(S, np.int64)
    sib[order] = csum - csum[base_idx]

    # lo: heads take consecutive base offsets (id order), children get
    # lo[parent] + own[parent] + sibling prefix — forward level sweep
    lo = np.zeros(S, np.int64)
    heads = (parent < 0) & (np.arange(S) >= n_roots)
    hc = cnt[heads]
    lo[heads] = np.cumsum(hc) - hc
    for d in range(0, maxd):
        m = depth == (d + 1)
        lo[m] = lo[par0[m]] + own[par0[m]] + sib[m]
    hi = lo + cnt
    total = int(hc.sum())
    if total == 0:
        return None

    # instance words in pre-order positions
    we = np.asarray(tree.we_word, np.int64)
    live = we != WORD_NONE
    live[:n_roots] = False
    k_idx = np.cumsum(live, axis=1) - 1
    pos = lo[:, None] + k_idx
    inst_words = np.full(total, WORD_NONE, np.int64)
    inst_words[pos[live]] = we[live]

    # post-hoc interval validation: every non-spanning non-root arc
    # u -> v must keep v's subtree inside u's interval, else the
    # range-min over [lo, hi) would miss reachable words
    nonspan = nr & (src != parent[dst])
    u, v = src[nonspan], dst[nonspan]
    if u.size and np.any((lo[u] > lo[v]) | (hi[v] > hi[u])):
        return None
    return lo, hi, inst_words


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


def _range_softmin(vals, nlo, nhi, tau: float) -> np.ndarray:
    """Smoothed range minimum: -tau * log(sum_{[lo,hi)} exp(-v/tau)).

    The exact min over a node's words is the sharpest admissible
    potential but credits only the SINGLE best continuation; at tight
    beams that over-commits (battery evidence, BASELINE.md). The
    softmin credits probability MASS — many decent continuations rank
    above one great one — which is the reference's smoothed lookahead
    remedy. Any value is still exact shaping. Computed with one prefix
    sum instead of the sparse range-min tables."""
    e = np.exp(-vals / tau)
    p = np.concatenate([[0.0], np.cumsum(e)])
    sums = p[nhi] - p[nlo]
    return -tau * np.log(np.maximum(sums, 1e-300))


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


def _anchor_classes(lm: NgramLm, num_classes: int, order: int = 2):
    """History classes: anchors are CONTEXT TUPLES, states map to the
    most specific anchor their LM context hits.

    ``order=2``: top-(num_classes-1) unigram words anchor their own
    exact bigram row (always including ``<s>``); the rest share a
    neutral class whose correction is zero (pure unigram shaping —
    graceful degradation). ``order=3``: the budget splits between
    last-word anchors and LAST-TWO-WORD pair anchors (the most
    probable bigram histories by uni(u) + cost(v|u)); a state whose
    last two words hit a pair anchor conditions on the exact trigram
    row, else falls back to its last-word bigram row, else neutral —
    a class hierarchy, still exact shaping (corr may be ANY function
    of the class)."""
    uni = {wid: lm.score((), wid) for wid in lm.vocab.values()}
    bos = lm.vocab.get("<s>")
    ranked = sorted(uni, key=lambda w: uni[w])
    word_budget = (
        num_classes - 1 if order < 3 else max((num_classes - 1) // 2, 1)
    )
    anchors: List[Tuple[int, ...]] = [] if bos is None else [(bos,)]
    for w in ranked:
        if len(anchors) >= word_budget:
            break
        if (w,) not in anchors:
            anchors.append((w,))
    if order >= 3:
        pair_rank = {
            key: uni.get(key[0], 99.0) + cost
            for key, (cost, _bo) in lm.ngrams.items()
            if len(key) == 2
        }
        for key in sorted(pair_rank, key=pair_rank.get):
            if len(anchors) >= num_classes - 1:
                break
            anchors.append(key)
    C = len(anchors) + 1
    other = C - 1
    contexts = state_contexts(lm)
    state_class = np.full(len(contexts), other, np.int32)
    a_of = {a: i for i, a in enumerate(anchors)}
    for i, ctx in enumerate(contexts):
        if not ctx:
            continue
        c = a_of.get(tuple(ctx[-2:])) if len(ctx) >= 2 else None
        if c is None:
            c = a_of.get((ctx[-1],), other)
        state_class[i] = c
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


def _class_costs_ctx(
    lm: NgramLm, uni, ctx: Tuple[int, ...], words: np.ndarray
) -> Dict[int, float]:
    """cost(w | ctx) for a 1- or 2-word anchor context (backoff chain
    trigram -> bo(u,v) + bigram -> bo(v) + unigram)."""
    if len(ctx) == 1:
        return _class_costs(lm, uni, ctx[0], words)
    u, v = int(ctx[0]), int(ctx[1])
    e = lm.ngrams.get((u, v))
    bo_uv = e[1] if e is not None else 0.0
    row_v = _class_costs(lm, uni, v, words)
    out = {}
    for w in words:
        w = int(w)
        tri = lm.ngrams.get((u, v, w))
        out[w] = tri[0] if tri is not None else bo_uv + row_v[w]
    return out


def _compile_arc_pairs(tree: PrefixTree, node_of, N: int, corr):
    """Per-arc node-crossing pair ids + the deduped [C, P+1] delta table.

    State-0 arcs are excluded (the decoder's root fan-out applies the
    correction via the trace-time corr_arc table); arcs out of OTHER
    roots (across-word context roots — sentinel node, corr 0) cross
    like any within-word arc and land in dense/branch slots."""
    S = tree.num_states
    C = corr.shape[0]
    ptr = tree.arc_ptr.astype(np.int64)
    deg = ptr[1:] - ptr[:-1]
    src = np.repeat(np.arange(S, dtype=np.int64), deg)
    dst = tree.arc_dst.astype(np.int64)
    A = dst.shape[0]
    ns = node_of[src].astype(np.int64)
    nd = node_of[dst].astype(np.int64)
    cross = (src >= 1) & (ns != nd)
    arc_pair = np.zeros(A, np.int32)
    ci = np.flatnonzero(cross)
    upair, pinv = (
        np.unique(ns[ci] * np.int64(N + 1) + nd[ci], return_inverse=True)
        if ci.size
        else (np.zeros(0, np.int64), np.zeros(0, np.int64))
    )
    arc_pair[ci] = (pinv + 1).astype(np.int32)  # 0 = no crossing
    P = int(upair.size)
    dpair = np.zeros((C, P + 1), np.float32)
    if P:
        pns = upair // np.int64(N + 1)
        pnd = upair % np.int64(N + 1)
        # corr's column N (sentinel) is zero, so root-leaving arcs get
        # the full corr[c, head] as their delta
        dpair[:, 1:] = corr[:, pnd] - corr[:, pns]
        # dedup identical delta COLUMNS: with num_classes anchors most
        # node crossings share a correction pattern and the majority
        # are all-zero (measured on the 5k-word bench network: 4739
        # pair columns -> 1046 unique, 3013 zero), so the hot dpair
        # table shrinks ~4x — under the decoder's ~1.1MB VMEM pin
        # budget, where per-candidate gathers run ~1.5ns/row instead
        # of HBM speed (docs/PERF.md). Values are unchanged: exactness
        # (phi telescoping) is untouched.
        uniq, inv = np.unique(dpair.T, axis=0, return_inverse=True)
        inv = inv.reshape(-1)  # numpy 2.x keeps the extra axis
        # invariant: dpair[:, 0] is the always-zero no-crossing column
        # (arc_pair id 0), so a zero column must exist after dedup
        zcols = np.flatnonzero(np.all(uniq == 0, axis=1))
        assert zcols.size, "dpair lost its zero (no-crossing) column"
        zi = int(zcols[0])
        if zi != 0:
            perm = np.arange(uniq.shape[0])
            perm[0], perm[zi] = zi, 0
            uniq = uniq[perm]
            remap = np.empty_like(perm)
            remap[perm] = np.arange(perm.size)
            inv = remap[inv]
        arc_pair = inv[arc_pair].astype(np.int32)
        dpair = np.ascontiguousarray(uniq.T, dtype=np.float32)
    return arc_pair, dpair


def _wordset_general(
    tree: PrefixTree, lm: NgramLm, num_classes: int, order: int,
    smooth: float,
) -> Optional[BigramLookahead]:
    """Word-set lookahead nodes for GENERAL networks: WFST compilations
    with non-root word-end re-entries (junction states) and arbitrary
    dense-arc topology including cycles (SURVEY §2.5 src/Search/Wfst/ —
    the reference runs its LM lookahead over the condensed network of
    any static search space, not just the prefix tree).

    Reachable word sets are computed by a bitset fixpoint over the
    dense arcs (monotone, so cycles converge) instead of DFS intervals;
    nodes = distinct non-empty sets. Exactness at re-entry comes from
    the decoder ADDING the entry node's correction to each re-entering
    hypothesis (``reentry=True``) — the interval path never needs this
    because every re-entry lands on a zero-sentinel root. Bounded to
    grammar-scale networks (the only producers of this shape); above
    the gates, callers fall back to unigram-only shaping."""
    S = tree.num_states
    A = int(np.asarray(tree.arc_dst).shape[0])
    if S > 200_000 or A > 400_000:
        return None
    we = np.asarray(tree.we_word)
    own = [0] * S
    for s in range(S):
        m = 0
        for w in we[s]:
            if w != WORD_NONE:
                # bit w+2: WORD_SILENCE (-2) and real LM word ids; the
                # interval path scores non-LM instances at cost 0 in
                # every context — mirrored below
                m |= 1 << int(w + 2)
        own[s] = m
    ptr = np.asarray(tree.arc_ptr)
    dst = np.asarray(tree.arc_dst)
    masks = list(own)
    for _ in range(S + 1):
        changed = False
        for s in range(S - 1, -1, -1):
            m = masks[s]
            for ai in range(int(ptr[s]), int(ptr[s + 1])):
                m |= masks[int(dst[ai])]
            if m != masks[s]:
                masks[s] = m
                changed = True
        if not changed:
            break
    # intern non-empty sets; state 0 keeps the sentinel so phi(root)=0
    # (the decoder's root fan-out applies corr via corr_arc instead)
    uniq_masks: Dict[int, int] = {}
    node_raw = np.full(S, -1, np.int64)
    node_sets: List[int] = []
    for s in range(1, S):
        m = masks[s]
        if m == 0:
            continue
        if m not in uniq_masks:
            uniq_masks[m] = len(node_sets)
            node_sets.append(m)
        node_raw[s] = uniq_masks[m]
    N = len(node_sets)
    if N == 0:
        return None
    node_of = np.where(node_raw < 0, N, node_raw).astype(np.int32)

    uni, anchors, state_class = _anchor_classes(lm, num_classes, order)
    C = len(anchors) + 1
    node_words: List[List[int]] = []
    all_words = set()
    for m in node_sets:
        ws = []
        while m:
            b = (m & -m).bit_length() - 1
            ws.append(b - 2)
            m &= m - 1
        node_words.append(ws)
        all_words.update(w for w in ws if w >= 0)
    words_uniq = np.asarray(sorted(all_words), np.int64)

    def agg(vals):
        v = np.asarray(vals, np.float64)
        if smooth > 0.0:
            return -smooth * np.log(
                max(np.exp(-v / smooth).sum(), 1e-300)
            )
        return v.min()

    corr = np.zeros((C, N + 1), np.float32)
    base = np.empty(N, np.float64)
    for n, ws in enumerate(node_words):
        base[n] = agg([0.0 if w < 0 else uni.get(w, 99.0) for w in ws])
    for ci, u in enumerate(anchors):
        big_cost = _class_costs_ctx(lm, uni, u, words_uniq)
        for n, ws in enumerate(node_words):
            vals = [0.0 if w < 0 else big_cost.get(w, 99.0) for w in ws]
            corr[ci, n] = np.float32(agg(vals) - base[n])

    arc_pair, dpair = _compile_arc_pairs(tree, node_of, N, corr)
    return BigramLookahead(
        sub_state=node_of,
        state_class=state_class,
        corr=corr,
        anchor_words=_anchors_array(anchors),
        arc_pair=arc_pair,
        dpair=dpair,
        reentry=True,
    )


def build_bigram_lookahead(
    tree: PrefixTree,
    lm: NgramLm,
    num_classes: int = 64,
    granularity: str = "word-set",
    order: int = 2,
    smooth: float = 0.0,
) -> Optional[BigramLookahead]:
    """Compile higher-order lookahead tables for ``tree`` against ``lm``.

    ``num_classes`` bounds the corr table height: ``num_classes - 1``
    anchor contexts (most probable last words, ``<s>`` always included;
    ``order=3`` adds last-two-word pair anchors with exact TRIGRAM rows
    — SURVEY §2.5 "full-order sparse" reach, hierarchically backed off
    to the bigram/neutral classes) plus one neutral class.
    ``granularity``: "word-set" (condensed lookahead network, per-arc
    deltas — the reference-faithful resolution) or "first-phone"
    (subtree-constant correction, zero per-expansion cost). Returns
    None for unsupported networks."""
    if num_classes < 2:
        return None
    if granularity not in ("word-set", "first-phone"):
        raise ValueError(f"unknown lookahead granularity {granularity!r}")
    if order not in (2, 3):
        raise ValueError(f"lookahead order must be 2 or 3, got {order}")
    if order == 3 and not any(len(k) >= 3 for k in lm.ngrams):
        # no trigrams in the LM: pair anchors would collapse to their
        # bigram fallbacks while HALVING the word-anchor budget
        order = 2
    if granularity == "word-set":
        return _build_wordset(tree, lm, num_classes, order, smooth)
    return _build_first_phone(tree, lm, num_classes, order)


def _anchors_array(anchors) -> "np.ndarray":
    """Anchor context tuples -> padded [C-1, max_len] int32 (-1 pad,
    context in the trailing columns)."""
    ml = max((len(a) for a in anchors), default=1)
    aw = np.full((len(anchors), ml), -1, np.int32)
    for i, a in enumerate(anchors):
        aw[i, ml - len(a):] = a
    return aw


def _build_first_phone(
    tree: PrefixTree, lm: NgramLm, num_classes: int, order: int = 2
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

    uni, anchors, state_class = _anchor_classes(lm, num_classes, order)
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
        big_cost = _class_costs_ctx(lm, uni, u, words_uniq)
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
        anchor_words=_anchors_array(anchors),
    )


def _build_wordset(
    tree: PrefixTree, lm: NgramLm, num_classes: int, order: int = 2,
    smooth: float = 0.0,
) -> Optional[BigramLookahead]:
    """Condensed-network granularity: nodes = distinct reachable word
    sets (DFS intervals over the spanning forest), per-arc crossing
    deltas. Handles BOTH the within-word prefix tree and the
    across-word network (context-conditioned roots + grouped word-end
    re-entries): every root carries the zero sentinel correction, so
    re-entry needs no add-back, arcs LEAVING a context root cross
    (sentinel -> head) and apply corr[c, head] via the same dpair
    machinery the within-word crossings use — the state-0 fan-out
    stays on the decoder's pre-selected corr_arc path."""
    n_roots = _num_roots(tree)
    if n_roots < 0 or (
        tree.we_next is not None and np.any(tree.we_next >= n_roots)
    ):
        # WFST shape (junction states / non-root re-entries): the
        # general bitset path with decoder re-entry add-back
        return _wordset_general(tree, lm, num_classes, order, smooth)
    spans = _forest_intervals(tree, n_roots)
    if spans is None:
        return _wordset_general(tree, lm, num_classes, order, smooth)
    lo, hi, inst_words = spans
    if inst_words.size == 0:
        return None
    S = tree.num_states

    # ---- intern intervals into nodes (roots + dead ends -> sentinel) ----
    total = int(inst_words.shape[0])
    valid = hi > lo
    valid[:n_roots] = False
    key = lo * np.int64(total + 1) + hi
    uniq, inv = np.unique(key[valid], return_inverse=True)
    N = int(uniq.size)
    if N == 0:
        return None
    node_of = np.full(S, N, np.int32)  # roots/dead ends: sentinel
    node_of[valid] = inv.astype(np.int32)
    nlo = uniq // np.int64(total + 1)
    nhi = uniq % np.int64(total + 1)

    uni, anchors, state_class = _anchor_classes(lm, num_classes, order)
    C = len(anchors) + 1
    words_uniq = np.unique(inst_words[inst_words >= 0])

    # ---- corr[c, n] via range-min over the DFS word-instance order ------
    # per-word cost tables are dense [Vmax+1] arrays so the per-INSTANCE
    # expansion is one vectorized gather (across-word networks stack
    # millions of word-end instances; a per-instance Python dict probe
    # per anchor class does not scale)
    v_max = int(words_uniq.max()) if words_uniq.size else 0
    uni_tab = np.full(v_max + 1, 99.0, np.float64)
    for w in words_uniq:
        uni_tab[int(w)] = uni.get(int(w), 99.0)
    inst_c = np.maximum(inst_words, 0)
    is_word = inst_words >= 0
    uni_inst = np.where(is_word, uni_tab[inst_c], 0.0)
    if smooth > 0.0:
        base = _range_softmin(uni_inst, nlo, nhi, smooth)
    else:
        base = _range_min(_sparse_min(uni_inst), nlo, nhi)
    corr = np.zeros((C, N + 1), np.float32)
    for ci, u in enumerate(anchors):
        big_cost = _class_costs_ctx(lm, uni, u, words_uniq)
        cost_tab = np.full(v_max + 1, 99.0, np.float64)
        for w, cst in big_cost.items():
            cost_tab[w] = cst
        cost_inst = np.where(is_word, cost_tab[inst_c], 0.0)
        if smooth > 0.0:
            mins = _range_softmin(cost_inst, nlo, nhi, smooth)
        else:
            mins = _range_min(_sparse_min(cost_inst), nlo, nhi)
        corr[ci, :N] = (mins - base).astype(np.float32)

    arc_pair, dpair = _compile_arc_pairs(tree, node_of, N, corr)
    return BigramLookahead(
        sub_state=node_of,
        state_class=state_class,
        corr=corr,
        anchor_words=_anchors_array(anchors),
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
        reentry=np.asarray(bla.reentry),
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
        reentry=bool(data["reentry"]) if "reentry" in data else False,
    )
