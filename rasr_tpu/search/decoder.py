"""Vectorized frame-synchronous beam search over the prefix tree.

The TPU re-design of the reference's word-conditioned tree search
(ref: src/Search/WordConditionedTreeSearch.* and
src/Search/AdvancedTreeSearch/SearchSpace.cc — time-synchronous Viterbi
over the lexical prefix tree with tree copies conditioned on the LM
history, acoustic beam + histogram pruning, word-end LM application with
history recombination, ref-counted tracebacks).

TPU formulation (BASELINE.json: "vectorized frame-synchronous token
passing with top-k pruning on-chip"):

* a hypothesis is a dense slot ``(tree_state, lm_state, score, bp)``;
  ``lm_state`` is a compiled n-gram automaton state (models/lm/ngram_tpu),
  so the reference's interned-history recombination becomes integer key
  equality — no interning, no pointers;
* per frame (one ``lax.scan`` step, batched over utterances):
  expansion → emission → acoustic beam → exact recombination by sort on
  (tree_state, lm_state, score) keeping group minima → histogram top-K →
  word-end processing (pre-LM top-R, hash-table LM lookup, traceback
  record emission, root re-entry) merged back into the beam;
* tracebacks are fixed-shape per-frame record buffers (word, score,
  predecessor record), assembled on the host after the scan — replacing
  the reference's ref-counted Trace garbage collection.

Performance shape (measured on v5e, HLO-profiled): the cost driver is
GATHER INDICES — a random gather costs ~7 cycles per index for single
elements and ~1.5-2 cycles per index when each index fetches a packed
ROW of columns; row width is nearly free, and sorts/top-k are
secondary. The decoder is therefore organized around "one gather, many
columns":

* **dense slots**: each state's first two out-arcs + loop/class columns
  live in one packed ``[S+1, 9]`` table — a single row gather per hyp;
* **branch overflow**: remaining arcs (phone-boundary fan-out) in a CSR
  expanded only for the top ``branch_hyps`` hypotheses that actually sit
  at fan-out states (packed 3-column arc rows);
* **root re-entry**: root-arc emission scores come from a static one-hot
  MATMUL (MXU streams beat the gather unit for fixed index sets);
  per-history candidates are pure broadcasts;
* every beam/sort/merge selection gathers packed rows (``rowsel``), and
  ``take_along_axis`` is never used on the hot path (its batched-gather
  lowering measures ~5x slower than flat gathers);
* optional ``expansion_limit`` ranks candidates BEFORE the emission
  gather so only E survivors pay emission-gather indices at all;
* ``root_select``: the root fan-out (word starts — half the candidate
  width at production settings) is pre-selected by a narrow
  (value, index) sort OUTSIDE the main recombination sorts;
* ``deferred_emission``: emission is a function of the destination
  state (= recombination key), so it is added once for the K+R3
  survivors after top-K instead of per expansion candidate;
* **sort widths budget to powers of 2**: XLA's TPU sort pads the sorted
  dimension to the next power of 2 (HLO-profiled: a 4864-wide sort
  costs the same as 8192), so pruning caps are chosen to land every
  per-frame sort at or under a pad boundary (see bench.py).
"""

from __future__ import annotations

import os
import dataclasses
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.lm.ngram_tpu import NgramTables, lookup_prepared, prepare_lookup
from ..ops.viterbi import BIG
from .tree import WORD_NONE, PrefixTree


@dataclasses.dataclass(frozen=True)
class TreeTables:
    """Device pytree of the compiled prefix tree (+1 sentinel state S)."""

    emission_class: jnp.ndarray  # [S+1]
    loop_cost: jnp.ndarray  # [S+1]
    # dense 2-slot arcs (chain transitions; SENT/BIG when absent)
    dense1_dst: jnp.ndarray  # [S+1]
    dense1_cost: jnp.ndarray
    dense1_cls: jnp.ndarray
    dense2_dst: jnp.ndarray
    dense2_cost: jnp.ndarray
    dense2_cls: jnp.ndarray
    # branch overflow CSR (arcs beyond the two dense slots)
    branch_ptr: jnp.ndarray  # [S+2]
    branch_deg: jnp.ndarray  # [S+1]
    branch_dst: jnp.ndarray  # [A']
    branch_cost: jnp.ndarray
    branch_cls: jnp.ndarray
    # root fan-out
    root_dst: jnp.ndarray  # [G]
    root_cost: jnp.ndarray
    root_cls: jnp.ndarray
    # word ends
    we_word: jnp.ndarray  # [S+1, W]
    we_cost: jnp.ndarray
    we_lemma: jnp.ndarray
    we_next: jnp.ndarray  # [S+1, W] re-entry state (0 = root)
    # LM lookahead potentials (all-zero when disabled): per-arc deltas
    # la[dst]-la[src] precomposed so shaping costs no extra gathers
    la: jnp.ndarray  # [S+1]
    dense1_dla: jnp.ndarray  # [S+1]
    dense2_dla: jnp.ndarray  # [S+1]
    branch_dla: jnp.ndarray  # [A']
    root_dla: jnp.ndarray  # [G]
    num_states: int
    branch_degree: int  # max overflow degree
    root_degree: int
    has_lookahead: bool

    @property
    def sentinel(self) -> int:
        return self.num_states


jax.tree_util.register_pytree_node(
    TreeTables,
    lambda t: (
        (t.emission_class, t.loop_cost,
         t.dense1_dst, t.dense1_cost, t.dense1_cls,
         t.dense2_dst, t.dense2_cost, t.dense2_cls,
         t.branch_ptr, t.branch_deg, t.branch_dst, t.branch_cost, t.branch_cls,
         t.root_dst, t.root_cost, t.root_cls,
         t.we_word, t.we_cost, t.we_lemma, t.we_next,
         t.la, t.dense1_dla, t.dense2_dla, t.branch_dla, t.root_dla),
        (t.num_states, t.branch_degree, t.root_degree, t.has_lookahead),
    ),
    lambda aux, ch: TreeTables(*ch, *aux),
)


def tree_to_device(tree: PrefixTree) -> TreeTables:
    S = tree.num_states
    SENT = S
    ecls = np.concatenate([tree.emission_class, [0]]).astype(np.int32)
    root_lo, root_hi = int(tree.arc_ptr[0]), int(tree.arc_ptr[1])
    root_dst = tree.arc_dst[root_lo:root_hi].astype(np.int32)
    root_cost = tree.arc_cost[root_lo:root_hi].astype(np.float32)
    if root_dst.size == 0:
        root_dst = np.array([SENT], np.int32)
        root_cost = np.array([BIG], np.float32)

    # vectorized slot split (the python per-state loop took ~1s per 100k
    # states and runs on EVERY decoder construction, image-cached or not):
    # arc i belongs to state src[i] at within-state position pos[i];
    # pos 0 -> dense slot 1, pos 1 -> dense slot 2, pos >= 2 -> branch CSR
    # (root state 0 excluded — its arcs are the root fan-out).
    d1_dst = np.full(S + 1, SENT, np.int32)
    d1_cost = np.full(S + 1, BIG, np.float32)
    d2_dst = np.full(S + 1, SENT, np.int32)
    d2_cost = np.full(S + 1, BIG, np.float32)
    ptr = tree.arc_ptr.astype(np.int64)
    deg = ptr[1:] - ptr[:-1]  # [S]
    src, m1, m2, mbr = _arc_slot_split(tree)
    d1_dst[src[m1]] = tree.arc_dst[m1]
    d1_cost[src[m1]] = tree.arc_cost[m1]
    d2_dst[src[m2]] = tree.arc_dst[m2]
    d2_cost[src[m2]] = tree.arc_cost[m2]
    # mbr: CSR order preserved (arcs sorted by (src, pos))
    br_deg = np.zeros(S + 1, np.int32)
    nr_deg = np.where(np.arange(S) >= 1, np.maximum(deg - 2, 0), 0)
    br_deg[:S] = nr_deg
    br_ptr = np.zeros(S + 2, np.int32)
    np.cumsum(br_deg, out=br_ptr[1 : S + 2][: S + 1])
    br_dst_a = tree.arc_dst[mbr].astype(np.int32)
    br_cost_a = tree.arc_cost[mbr].astype(np.float32)
    if br_dst_a.size == 0:
        br_dst_a = np.array([SENT], np.int32)
        br_cost_a = np.array([BIG], np.float32)

    def cls_of(dst):
        return ecls[np.minimum(dst, SENT)].astype(np.int32)

    la_src = tree.lookahead
    has_la = la_src is not None and np.any(la_src != 0)
    la = np.zeros(S + 1, np.float32)
    if la_src is not None:
        la[:S] = la_src

    # static promise order for the root fan-out (cost + lookahead), so a
    # root_arc_limit slice keeps the most promising word starts
    root_rank = root_cost + (la[np.minimum(root_dst, SENT)] - la[0] if has_la else 0.0)
    root_order = np.argsort(root_rank, kind="stable")
    root_dst = root_dst[root_order]
    root_cost = root_cost[root_order]

    def dla_of(src_idx, dst):
        if not has_la:
            return np.zeros_like(dst, np.float32)
        return (la[np.minimum(dst, SENT)] - la[src_idx]).astype(np.float32)

    all_states = np.arange(S + 1)
    return TreeTables(
        emission_class=jnp.asarray(ecls),
        loop_cost=jnp.asarray(
            np.concatenate([tree.loop_cost, [BIG]]).astype(np.float32)
        ),
        dense1_dst=jnp.asarray(d1_dst),
        dense1_cost=jnp.asarray(d1_cost),
        dense1_cls=jnp.asarray(cls_of(d1_dst)),
        dense2_dst=jnp.asarray(d2_dst),
        dense2_cost=jnp.asarray(d2_cost),
        dense2_cls=jnp.asarray(cls_of(d2_dst)),
        branch_ptr=jnp.asarray(br_ptr),
        branch_deg=jnp.asarray(br_deg),
        branch_dst=jnp.asarray(br_dst_a),
        branch_cost=jnp.asarray(br_cost_a),
        branch_cls=jnp.asarray(cls_of(br_dst_a)),
        root_dst=jnp.asarray(root_dst),
        root_cost=jnp.asarray(root_cost),
        root_cls=jnp.asarray(cls_of(root_dst)),
        we_word=jnp.asarray(
            np.concatenate(
                [tree.we_word, np.full((1, tree.max_word_ends), WORD_NONE, np.int32)]
            )
        ),
        we_cost=jnp.asarray(
            np.concatenate(
                [tree.we_cost, np.full((1, tree.max_word_ends), BIG, np.float32)]
            )
        ),
        we_lemma=jnp.asarray(
            np.concatenate(
                [tree.we_lemma, np.full((1, tree.max_word_ends), -1, np.int32)]
            )
        ),
        we_next=jnp.asarray(
            np.concatenate(
                [
                    tree.we_next if tree.we_next is not None
                    else np.zeros_like(tree.we_word),
                    np.zeros((1, tree.max_word_ends), np.int32),
                ]
            )
        ),
        la=jnp.asarray(la),
        dense1_dla=jnp.asarray(dla_of(all_states, d1_dst)),
        dense2_dla=jnp.asarray(dla_of(all_states, d2_dst)),
        branch_dla=jnp.asarray(
            dla_of(_branch_src_of(br_ptr, S, len(br_dst_a)), br_dst_a)
        ),
        root_dla=jnp.asarray(
            (la[np.minimum(root_dst, SENT)] - la[0]).astype(np.float32)
            if has_la else np.zeros(root_dst.shape[0], np.float32)
        ),
        num_states=S,
        branch_degree=max(int(br_deg.max()), 1),
        root_degree=int(root_dst.shape[0]),
        has_lookahead=bool(has_la),
    )


def _branch_src_of(br_ptr: np.ndarray, S: int, num_arcs: int) -> np.ndarray:
    """Source state of each branch arc (from the CSR ptr)."""
    deg = np.asarray(br_ptr[1 : S + 2]) - np.asarray(br_ptr[: S + 1])
    src = np.repeat(np.arange(S + 1, dtype=np.int64), deg)
    if src.size < num_arcs:  # placeholder row when there are no branch arcs
        src = np.concatenate([src, np.zeros(num_arcs - src.size, np.int64)])
    return src


@dataclasses.dataclass(frozen=True)
class BeamConfig:
    """Pruning parameters (ref: the *-pruning / *-pruning-limit params of
    the tree searches: acoustic beam, histogram limit, word-end limit)."""

    max_hyps: int = 1024  # histogram pruning cap (K)
    beam: float = 1e9  # acoustic beam width
    word_end_limit: int = 128  # R: word-end survivors / records per frame
    #: relative beam over the R word-end records AFTER the exact LM cost
    #: is applied: records worse than the best word end by more than this
    #: are dropped (ref: word-end pruning / lm-pruning — the reference
    #: prunes word ends after LM application, not only by count).
    word_end_beam: float = 1e9
    #: LM-aware word-end SELECTION: rank word-end candidates for the
    #: top-R by path score + the word's STATIC unigram LM estimate
    #: (rides the word-end gather as one precomputed column; slots are
    #: re-sorted under the biased rank so the two-stage top-R stays
    #: exact). The bias is undone after selection and replaced by the
    #: exact LM lookup, so surviving scores are unchanged — only WHICH R
    #: candidates survive differs (the reference applies LM before
    #: word-end pruning; a pre-LM rank is blind to cheap-vs-rare words
    #: at tight R). Exact when R covers all candidates.
    word_end_rank_lm: bool = False
    root_hyps: int = 32  # H: root (re-entry) hyps expanded per frame
    branch_hyps: int = 0  # Kb: hyps expanded through branch arcs (0 = K)
    #: Wb: compact branch expansion — pack the selected branch hyps'
    #: overflow arcs CONTIGUOUSLY into a static [B, Wb] slot budget
    #: (CSR offsets via cumsum + rank) instead of the dense
    #: [branch_hyps, max_degree] fan. The dense fan is mostly padding on
    #: realistic networks (mean overflow degree ~2-4 vs max 16-45 on the
    #: word-scope / across-word benches), and its width multiplies the
    #: dominant recombination sorts (which XLA pads to the next power of
    #: 2). Slots fill best-hypothesis-first (the branch top-Kb order), so
    #: overflow truncates the WORST selected hyps' arcs — a principled
    #: prune; with Wb >= branch_hyps * max_degree the candidate set is
    #: identical to the dense fan (fuzz-tested). 0 = dense fan.
    branch_width: int = 0
    #: E: pre-emission expansion pruning — keep only the E most promising
    #: candidates (ranked BEFORE adding the current frame's emission)
    #: ahead of the emission gather + recombination sort. 0 = off
    #: (exact expansion). The emission gather indices and the sort width
    #: are the decoder's dominant costs; E >= 2*max_hyps keeps the
    #: search-quality risk negligible (a dropped candidate must overcome
    #: its pre-emission rank deficit within one frame's emission).
    expansion_limit: int = 0
    #: word-start fan-out cap: non-best histories expand only the
    #: root_arc_limit most promising root arcs (static lookahead order);
    #: the best history always expands all of them. 0 = no cap (exact).
    #: (ref: the anticipated/lookahead pruning at word starts)
    root_arc_limit: int = 0
    #: R3: word-start survivors per frame. When > 0 the root fan-out
    #: (G + (root_hyps-1)*root_arc_limit candidates — HALF the
    #: recombination sort width at production settings) leaves the main
    #: recombination sorts entirely: candidates are ranked PRE-emission
    #: (score + TDP + lookahead), the top R3 get the emission gather and
    #: join the beam at the merge stage like word-end re-entries. This
    #: shrinks the dominant per-frame sorts superlinearly (bitonic
    #: W log^2 W). Semantics: word starts are capped at R3/frame and
    #: selected before the first frame's emission (the reference's
    #: anticipated word-start pruning), and a root arrival is no longer
    #: recombined against a same-state loop hypothesis in its first
    #: frame (bounded beam waste, exact scores). 0 = off (root arcs ride
    #: the main sorts; exact). Ignored under beam partitioning.
    root_select: int = 0
    #: add the current frame's emission score AFTER recombination +
    #: histogram top-K instead of per candidate. A candidate's emission
    #: depends only on its destination state (= its recombination key),
    #: so the per-key winner is IDENTICAL either way and with pruning
    #: off the search stays exact; under pruning, the acoustic beam and
    #: histogram cuts rank by path score WITHOUT the current frame's
    #: emission (one frame of acoustic delay in the pruning decision,
    #: like the reference's anticipated pruning). Cuts the emission
    #: gather from every expansion candidate (~6x beam width) to the
    #: K+R3 survivors. Subsumes expansion_limit (ignored when set).
    deferred_emission: bool = False
    lm_scale: float = 1.0
    #: weight of the unigram lookahead potential (x lm_scale); exact
    #: potential shaping — path scores are unchanged, pruning becomes
    #: LM-aware (ref: LM lookahead fold-in). 0 disables.
    lookahead_scale: float = 1.0
    #: EXTRA weight on the bigram/trigram CORRECTION level only (level
    #: 2 of the two-level potential, x lm_scale x lookahead_scale).
    #: The battery showed the full-strength history-conditioned min
    #: over-commits TIGHT beams while the unigram level helps at full
    #: strength — the reference's separate (smaller) lookahead-LM
    #: scale is exactly this knob (src/Search/LmLookahead.*). Still
    #: exact shaping at any value.
    lookahead_corr_scale: float = 1.0
    #: when the word-set correction level updates (word-set granularity,
    #: single device):
    #: * "arc" (default, EXACT): every dense/branch candidate gathers
    #:   its node-crossing delta, so same-key candidates always carry
    #:   identical phi2 and recombination is exact potential shaping;
    #: * "survivor" (the reference's LAZY lookahead activation,
    #:   src/Search/LmLookahead.* — lookahead values update when a
    #:   tree copy's node is entered, not per expansion): candidates
    #:   expand with their SOURCE node's correction and phi2 refreshes
    #:   once for the K+R3 survivors after top-K. Kills the dominant
    #:   per-candidate delta gathers (~0.3ms/frame at bench shape);
    #:   recombination of paths from different lookahead nodes may
    #:   keep a path whose shaped (not true) score wins — quality
    #:   measured on the battery, NOT exact (opt-in).
    lookahead_update: str = "arc"
    #: lax.scan unroll factor for the frame loop. >1 duplicates the step
    #: body, letting XLA fuse/overlap across consecutive frames
    #: (dispatch + layout-copy slop); results are identical. Costs
    #: compile time and HLO size.
    scan_unroll: int = 1
    #: force the two-key (state, lm) recombination sort even when the
    #: packed int32 key would fit — the path production 4-gram decodes
    #: take ((S+1)*L >= 2^31). Results must be identical either way;
    #: exists so tests can exercise the big-LM path on small setups.
    force_unpacked_keys: bool = False


def _row_offsets(idx, stride):
    """Per-element batch-row offsets (batch_index * stride) for flat
    global-index gathers, in the flat iota//W form: ANY [B]-shaped
    offset (in-body arange, trace-time np constant, factored
    broadcasted_iota) gets strength-reduced by XLA into one shared [B]
    iota fusion that is then shuttled VMEM->HBM->VMEM between its
    distant consumers (~34us/frame at the headline shape, more at
    large vocab — docs/PERF.md "[B] row-offset shuttle"). The flat
    iota(B*W)//W at the index shape resists the refactor and fuses
    into each gather's own index fusion."""
    B = idx.shape[0]
    W = int(np.prod(idx.shape[1:])) if idx.ndim > 1 else 1
    row = (jax.lax.iota(jnp.int32, B * W) // jnp.int32(W)).reshape(idx.shape)
    return row * jnp.int32(stride)


def _bc_f(a):  # int32 -> f32 bits
    return jax.lax.bitcast_convert_type(a, jnp.float32)


def _bc_i(a):  # f32 bits -> int32
    return jax.lax.bitcast_convert_type(a, jnp.int32)


def _ride_flags(cfg: "BeamConfig", bla, partitioned: bool):
    """Bigram-lookahead carry-riding gates (shared by _make_step,
    init_carry and the streaming restart — they must agree on the carry
    layout).

    ``ride_phi``: each beam slot carries its APPLIED correction phi2 as
    a sort-payload column, so the word-end undo is a subtract instead
    of a [B,KW] class lookup + corr gather. ``ride_cls`` (word-set
    granularity only): the slot also carries its history class, feeding
    the dense/branch node-crossing delta gathers without the per-frame
    [B,K]/[B,Wbr] class lookups. Both are functions of the
    recombination key (class of lm state x lookahead node of state), so
    per-key winners carry the right values through the dedup sorts —
    docs/PERF.md "Bigram-lookahead hot-loop cost" fix 2. Partitioned
    beams keep the gather path (the all_gather merge strips payload)."""
    use_bla = (
        bla is not None
        and cfg.lm_scale * cfg.lookahead_scale * cfg.lookahead_corr_scale
        != 0.0
    )
    ride_phi = use_bla and not partitioned
    ride_cls = ride_phi and bla.deep
    return ride_cls, ride_phi


@dataclasses.dataclass(frozen=True)
class BigramTables:
    """Device pytree of the bigram-lookahead tables (search/lookahead.py).

    ``sub[s]`` in [0, num_subtrees] (sentinel = num_subtrees, whose corr
    column is zero — roots and the padding state carry no correction);
    ``corr`` is UNSCALED (the decoder folds lm_scale * lookahead_scale
    in at trace time).

    Word-set granularity additionally ships the per-arc node-crossing
    delta machinery: ``pair1/pair2`` (dense arc slots, per state),
    ``pair_br`` (branch CSR order) index rows of ``dpair`` (column 0 is
    zeros = "no crossing"); all None at first-phone granularity where
    every within-word delta is zero by construction."""

    sub: jnp.ndarray  # [S+1] int32
    cls_of_lm: jnp.ndarray  # [L] int32
    corr: jnp.ndarray  # [C, num_subtrees + 1] f32
    pair1: Optional[jnp.ndarray]  # [S+1] int32
    pair2: Optional[jnp.ndarray]  # [S+1] int32
    pair_br: Optional[jnp.ndarray]  # [A'] int32
    dpair: Optional[jnp.ndarray]  # [C, P + 1] f32
    num_subtrees: int
    num_classes: int
    #: general (WFST) networks: word-end re-entries land on non-root
    #: junction states — the decoder must add corr[class, sub[entry]]
    #: to each re-entering hypothesis (see lookahead._wordset_general)
    reentry: bool = False

    @property
    def deep(self) -> bool:
        return self.dpair is not None


jax.tree_util.register_pytree_node(
    BigramTables,
    lambda t: (
        (t.sub, t.cls_of_lm, t.corr, t.pair1, t.pair2, t.pair_br, t.dpair),
        (t.num_subtrees, t.num_classes, t.reentry),
    ),
    lambda aux, ch: BigramTables(*ch, *aux),
)


def _arc_slot_split(tree: PrefixTree):
    """Per-arc slot assignment shared by tree_to_device and
    bigram_to_device: arc i of state src[i] at within-state position
    pos[i]; pos 0 -> dense slot 1, pos 1 -> dense slot 2, pos >= 2 ->
    branch CSR (root state 0 excluded)."""
    S = tree.num_states
    ptr = tree.arc_ptr.astype(np.int64)
    deg = ptr[1:] - ptr[:-1]
    A = int(ptr[-1])
    src = np.repeat(np.arange(S, dtype=np.int64), deg)
    pos = np.arange(A, dtype=np.int64) - ptr[:-1][src]
    nonroot = src >= 1
    return src, nonroot & (pos == 0), nonroot & (pos == 1), nonroot & (pos >= 2)


def bigram_to_device(bla, tree: PrefixTree) -> BigramTables:
    """Host BigramLookahead -> device tables (+ sentinel state row; arc
    pair ids split into the decoder's dense/branch slots)."""
    G = bla.corr.shape[1] - 1
    num_states = tree.num_states
    sub = np.concatenate([bla.sub_state, [G]]).astype(np.int32)
    assert sub.shape[0] == num_states + 1
    pair1 = pair2 = pair_br = dpair = None
    if bla.deep:
        src, m1, m2, mbr = _arc_slot_split(tree)
        p1 = np.zeros(num_states + 1, np.int32)
        p2 = np.zeros(num_states + 1, np.int32)
        p1[src[m1]] = bla.arc_pair[m1]
        p2[src[m2]] = bla.arc_pair[m2]
        br = bla.arc_pair[mbr].astype(np.int32)
        if br.size == 0:
            br = np.zeros(1, np.int32)  # placeholder row (see tree_to_device)
        pair1 = jnp.asarray(p1)
        pair2 = jnp.asarray(p2)
        pair_br = jnp.asarray(br)
        dpair = jnp.asarray(bla.dpair)
    return BigramTables(
        sub=jnp.asarray(sub),
        cls_of_lm=jnp.asarray(bla.state_class),
        corr=jnp.asarray(bla.corr),
        pair1=pair1,
        pair2=pair2,
        pair_br=pair_br,
        dpair=dpair,
        num_subtrees=G,
        num_classes=int(bla.corr.shape[0]),
        reentry=bool(getattr(bla, "reentry", False)),
    )


def _pad4(flat):
    """Pad a flat 1-D table to a multiple of 4 and view it [N/4, 4]."""
    n = flat.shape[0]
    pad = (-n) % 4
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    return flat.reshape(-1, 4)


def _gsel(tab4, idx):
    """Global quarter-row gather: element selection from a SHARED
    (non-batched) flat table viewed [N/4, 4] — the TPU lowers 1-D
    element gathers to a ~12ns/index serial path while row gathers run
    ~1.8ns/row (see fsel, which is the batched-table variant)."""
    rows = tab4[idx >> 2]
    lo = jnp.where((idx & 1) == 0, rows[..., 0], rows[..., 1])
    hi = jnp.where((idx & 1) == 0, rows[..., 2], rows[..., 3])
    return jnp.where((idx & 2) == 0, lo, hi)


def _build_state_pack(tree: TreeTables, cfg: BeamConfig, bla=None):
    """Packed per-state row table for the beam's per-hyp gather.

    Returns ``(state_pack [S+1, 8|9(+2)] int32, fold_bh, deg_bits)``.
    Shared by ``_make_step`` (trace-time constant) and ``init_carry``
    (the beam carry rides the selected rows across frames — see step()).
    With a deep (word-set) bigram lookahead the dense arcs' node-
    crossing pair ids ride as two extra columns.

    CARRIER DTYPE: int32, with the f32 cost columns BITCAST IN (ids
    native). The TPU vector unit flushes denormals and canonicalizes
    NaNs whenever an f32 tensor passes through a fused copy/relayout/
    select, so f32 tensors DESTROY int bit patterns smuggled in by
    bitcast (small ids are denormal patterns, -1 is a NaN pattern) —
    measured on hardware, see docs/PERF.md "bit-pattern transport".
    Int tensors are bit-exact carriers (same convention as the LM
    tables, models/lm/ngram_tpu.py), and bitcasts cost no ALU.
    """
    bc_i = _bc_i
    use_la = tree.has_lookahead and cfg.lookahead_scale != 0.0
    la_coeff = cfg.lm_scale * cfg.lookahead_scale
    # own class (loop emission) with the has-branch flag folded into its
    # sign (~cls when the state has overflow arcs)
    ecls_flag = jnp.where(
        tree.branch_deg > 0, -tree.emission_class - 1, tree.emission_class
    )
    # one packed 8-column row per state (a split into two 3-col tables
    # with bit-packed dst/cls measured SLOWER on v5e: 114 vs 129
    # audio-s/s — two dependent gathers beat one wide row only if both
    # land in VMEM, which the allocator did not do here)
    state_pack = jnp.stack(
        [
            bc_i(tree.loop_cost),  # 0 (f32 bits)
            tree.dense1_dst,  # 1
            bc_i(tree.dense1_cost + (la_coeff * tree.dense1_dla if use_la else 0.0)),  # 2
            tree.dense1_cls,  # 3
            tree.dense2_dst,  # 4
            bc_i(tree.dense2_cost + (la_coeff * tree.dense2_dla if use_la else 0.0)),  # 5
            tree.dense2_cls,  # 6
            ecls_flag,  # 7 (sign bit = has branch arcs)
        ],
        axis=1,
    )  # [S+1, 8] int32
    # branch CSR head (ptr, deg) folded into the state row when it fits
    # one int32: the separate [S+1,2] table gathers from HBM at
    # ~15ns/row (251us/frame profiled) while state_pack rides along
    # VMEM-pinned — the 9th column is effectively free
    Db = tree.branch_degree
    deg_bits = max(int(Db).bit_length(), 1)
    A_br = int(tree.branch_dst.shape[0])
    fold_bh = (A_br + 1) < (1 << (31 - deg_bits))
    if fold_bh:
        state_pack = jnp.concatenate(
            [
                state_pack,
                ((tree.branch_ptr[:-1] << deg_bits) | tree.branch_deg)[
                    :, None
                ],
            ],
            axis=1,
        )  # [S+1, 9]
    if (
        bla is not None
        and bla.deep
        and cfg.lm_scale * cfg.lookahead_scale * cfg.lookahead_corr_scale
        != 0.0
        and cfg.lookahead_update != "survivor"
    ):
        # same gate as _make_step's deep_arc — the carry must agree
        state_pack = jnp.concatenate(
            [state_pack, bla.pair1[:, None], bla.pair2[:, None]], axis=1
        )  # [..., +2]: dense-arc node-crossing pair ids
    return state_pack, fold_bh, deg_bits


def _make_step(
    tree: TreeTables,
    lm: NgramTables,
    lm_prep,
    n_frames: jnp.ndarray,  # [B]
    cfg: BeamConfig,
    B: int,
    M: int,
    wmax: int,
    hroot: int,
    kbranch: int,
    beam_axis: Optional[str] = None,
    beam_par: int = 1,
    bla: Optional[BigramTables] = None,
    rnn=None,  # Optional[RnnFusionTables]
    rec_cap: int = 0,  # traceback record-id bound (R * T) when known:
    # enables packing (bp, class) into ONE sort-payload operand
    rnn_pool: int = 0,  # state-pool rows the scan will write into
    rnn_off=0,  # row of the first record written at frame t=0:
    # row(t, r) = rnn_off + t*R + r (offline: 0; streaming blocks:
    # base past the compacted rows, minus t0*R — traced scalar)
):
    """Build the per-frame scan step + initial carry (shared by the
    offline whole-utterance scan and the streaming block feed).

    With ``beam_axis`` the K hypothesis slots PARTITION over that mesh
    axis (TP for search — SURVEY §5: "shard hypotheses across chips,
    local top-k then collective pruning"): the beam carry stays
    replicated, each device expands only its K/P slice (splitting the
    dominant per-frame cost — expansion + emission gather indices — P
    ways), recombines/top-Ks locally, and one all_gather + replicated
    merge per frame restores the exact global beam. With pruning limits
    off this equals the single-device scan exactly."""
    K = cfg.max_hyps
    Pn = beam_par if beam_axis is not None else 1
    K_loc = K // Pn
    assert K_loc * Pn == K, "max_hyps must divide the beam axis"
    my = jax.lax.axis_index(beam_axis) if Pn > 1 else 0
    R = cfg.word_end_limit
    SENT = tree.sentinel
    Db = tree.branch_degree
    G = tree.root_degree
    use_la = tree.has_lookahead and cfg.lookahead_scale != 0.0
    la_coeff = cfg.lm_scale * cfg.lookahead_scale
    la0 = tree.la[0]
    # bigram lookahead (search/lookahead.py): a history-class-conditioned
    # correction potential, CONSTANT within each first-phone subtree —
    # so every dense/loop/branch/skip delta is zero; the correction is
    # added at the root fan-out (subtree choice) and undone at word ends
    corr_coeff = la_coeff * cfg.lookahead_corr_scale
    use_bla = bla is not None and corr_coeff != 0.0
    use_deep = use_bla and bla.deep
    # survivor (lazy) correction updates: refresh phi2 once per frame
    # for the K+R3 survivors instead of per expansion candidate — the
    # reference's lazy lookahead activation; NOT exact (see BeamConfig).
    # Does NOT compose with beam partitioning: the refresh rides the
    # phi payload (single-device only), and _build_state_pack already
    # dropped the pair columns the arc-exact fallback would need —
    # falling back silently would read garbage columns, so refuse.
    lazy_phi = use_deep and cfg.lookahead_update == "survivor"
    if lazy_phi and Pn > 1:
        raise ValueError(
            "lookahead-update=survivor does not compose with beam "
            "partitioning (use the exact 'arc' updates there)"
        )
    deep_arc = use_deep and not lazy_phi
    # carry-riding of (class, applied phi2): kills the per-frame
    # [B,K]/[B,Wbr]/[B,KW] class lookups + the word-end undo gather at
    # the cost of extra sort-payload operands (docs/PERF.md fix 2)
    ride_cls, ride_phi = _ride_flags(cfg, bla, Pn > 1)
    # (bp, class) pack into one int32 payload operand when the record
    # cap is known and fits: each extra variadic-sort operand measured
    # ~+30us/sort/frame at the bench width (HLO profile 2026-08-21:
    # 148us @3 operands -> 209us @5), so halving the LA payload width
    # buys back most of the sort overhead for free vector pack/unpack
    Cn = bla.num_classes if use_bla else 1
    pack_pc = bool(
        ride_cls and rec_cap > 0 and (rec_cap + 1) * Cn < 2**31
    )
    # class rides its own payload column only when it can't pack
    ride_cls_col = ride_cls and not pack_pc
    gcap = min(cfg.root_arc_limit or G, G)
    if use_bla:
        Gla1 = bla.num_subtrees + 1
        cls4 = _pad4(bla.cls_of_lm)
        corr4 = _pad4((corr_coeff * bla.corr).reshape(-1))
        sub4 = _pad4(bla.sub)
        sub_arc = bla.sub[tree.root_dst]  # [G] subtree of each root arc
        # root corrections PRE-SELECTED per class at trace time: the
        # root arcs' subtree ids are a STATIC index set, so the per-
        # (class, arc) correction collapses to a tiny [C, G] table and
        # the per-frame cost to H row gathers (width is nearly free) —
        # HLO-profiled, the root-fan corr gathers were the largest
        # bigram-lookahead hot-loop term (~0.4ms/frame at B=64, G=1537,
        # gcap=160: 250k quarter-row gather indices -> ~1k rows)
        corr_arc = (corr_coeff * bla.corr)[:, sub_arc]  # [C, G]
        corr_arc_cap = corr_arc[:, :gcap] if gcap < G else corr_arc
        # flat quarter-row view for the root-select survivors' phi
        # payload ([B,R3] indices — tiny next to the fan it replaces)
        corr_arc4 = _pad4(corr_arc.reshape(-1))
    if deep_arc:
        # word-set granularity: within-word node-crossing deltas, one
        # quarter-row gather per dense/branch candidate section
        dpair4 = _pad4((corr_coeff * bla.dpair).reshape(-1))
        P1 = bla.dpair.shape[1]
    # root-selection (cfg.root_select): pre-emission top-R3 over the
    # root fan-out instead of carrying it through the main sorts
    Wr = G + max(hroot - 1, 0) * gcap
    use_rsel = cfg.root_select > 0 and Pn == 1
    R3 = min(cfg.root_select, Wr) if use_rsel else 0
    # packed (state, lm) recombination key when it fits int32; sentinel
    # state included so pruned slots pack too
    L = lm.num_states
    pack_keys = (SENT + 1) * L < 2**31 and not cfg.force_unpacked_keys
    # compact branch expansion (cfg.branch_width): candidate width is the
    # static slot budget Wb instead of the padded kbranch * Db fan
    use_cw = cfg.branch_width > 0
    Wbr = cfg.branch_width if use_cw else kbranch * Db
    cand_width = 3 * K_loc + Wbr + (0 if use_rsel else Wr)
    use_defer = cfg.deferred_emission
    E = cfg.expansion_limit
    if E and Pn > 1:
        E = max(E // Pn, 1)  # per-slice share of the global expansion cap
    use_exp = 0 < E < cand_width and not use_defer
    topn = min(K, cand_width)  # local top-K may be limited by slice width

    # ---- packed gather tables (trace-time; loop-invariant, hoisted) ----
    # every scan-body gather is an op dispatch on a small core: packing
    # per-state columns into one table turns 10 gathers into 1.
    bc_f = _bc_f
    bc_i = _bc_i

    # first-pass RNN-LM fusion (search/rnn_fusion.py): hidden states in
    # a bounded pool riding the carry; each hypothesis carries its
    # state's POOL ROW as a sort-payload column (like the bigram-
    # lookahead class/phi), so rows need no record-id keying and the
    # pool compacts to the live set between streaming blocks. One
    # batched LSTM step + vocab projection per frame over the R
    # word-end records.
    use_rnn = rnn is not None
    # RNN fusion composes with beam partitioning (r3 verdict item 4):
    # each hypothesis's pool ROW rides the local sorts AND the
    # all_gather merge as one more int32 payload column; the word-end
    # phase (LSTM step + pool writes) runs REPLICATED after the merge,
    # so every device holds an identical pool — no collective needed
    # beyond the beam merge itself.

    state_pack, fold_bh, deg_bits = _build_state_pack(tree, cfg, bla)
    carry0 = init_carry(
        B, cfg, lm, state_pack, bla=bla, partitioned=Pn > 1,
        rnn=rnn, rnn_pool=rnn_pool,
    )
    if not fold_bh:
        branch_head = jnp.stack(
            [tree.branch_ptr[:-1], tree.branch_deg], axis=1
        )  # [S+1, 2]: one row gather replaces two element gathers
    # int32 carrier rows (cost columns bitcast in): see _build_state_pack
    # — f32 tensors destroy smuggled int bit patterns on the TPU VPU
    branch_cols = [
        tree.branch_dst,
        bc_i(tree.branch_cost + (la_coeff * tree.branch_dla if use_la else 0.0)),
        tree.branch_cls,
    ]
    if deep_arc:
        branch_cols.append(bla.pair_br)  # node-crossing pair per branch arc
    branch_pack = jnp.stack(branch_cols, axis=1)  # [A', 3(+1)] int32
    # dense-fan branch gather in WIDE-ROW form: the padded fan reads Db
    # CONSECUTIVE arcs per selected hypothesis (bi = bptr + d), so the
    # per-(hyp, slot) gather of Kb*Db short rows collapses to ONE
    # Kb-row gather from a pre-widened [A', Db*C] table whose row p is
    # branch_pack[p:p+Db] flattened (row-gather cost is per INDEX, width
    # nearly free — HLO profile 2026-08-21: the [B*Kb*Db, 3] form ran
    # 89us/frame + a 25us relayout at B=64/Kb=146/Db=7; this is ~7x
    # fewer gather indices). Budgeted: skipped for huge-fan networks
    # where A'*Db*C would blow memory (those use branch_width anyway).
    Cb = branch_pack.shape[1]
    A_arcs = branch_pack.shape[0]
    use_wide_br = (
        not use_cw and Db > 1
        and (A_arcs + Db) * Db * Cb * 4 <= 16 * 2**20
    )
    if use_wide_br:
        bp_pad = jnp.concatenate(
            [branch_pack, jnp.zeros((Db - 1, Cb), jnp.int32)], axis=0
        )
        branch_wide = jnp.concatenate(
            [bp_pad[d : A_arcs + d] for d in range(Db)], axis=1
        )  # [A', Db*Cb]: row p = arcs p..p+Db-1
    use_werank = cfg.word_end_rank_lm
    # the unigram-lookahead undo at word ends is a PER-STATE STATIC term
    # (-la_coeff * (la[s] - la[root])): fold it into the word-end cost
    # column at table build instead of carrying a separate la column +
    # a per-frame vector subtract (intra-state slot order is unchanged
    # by a per-state constant, so the two-stage top-R invariant holds)
    we_adj = tree.we_cost
    if use_la:
        we_adj = we_adj - la_coeff * (tree.la - la0)[:, None]
    we_cols = [
        tree.we_word,
        bc_i(we_adj),
        tree.we_lemma,
        tree.we_next,
        # own emission class (per state, broadcast over word slots):
        # lets deferred_emission fetch the survivors' emission index
        # on the word-end gather it already pays for
        jnp.broadcast_to(
            tree.emission_class[:, None], tree.we_word.shape
        ),
    ]
    if use_werank:
        # static unigram LM estimate per word-end slot (cfg semantics:
        # LM-aware top-R selection; undone after selection). The dense
        # final-level table of prepare_lookup IS the unigram cost table.
        uni_cost = bc_f(lm_prep[3][:, 0])  # [V+1]
        we_bias = jnp.where(
            tree.we_word >= 0,
            cfg.lm_scale * uni_cost[jnp.maximum(tree.we_word, 0)],
            0.0,
        )  # [S+1, W]
        we_cols.append(bc_i(we_bias))
        if wmax > 1:
            # the two-stage top-R needs slots sorted under the SELECTION
            # metric (slot 0 must lower-bound its state's slots); re-sort
            # by biased rank once at table-build time (BIG padding slots
            # keep bias 0 and stay last)
            ordr = jnp.argsort(tree.we_cost + we_bias, axis=1)
            we_cols = [
                jnp.take_along_axis(c, ordr, axis=1) for c in we_cols
            ]
    C_we = len(we_cols)  # 5 (+1 with LM-aware ranking)
    we_pack = jnp.stack(we_cols, axis=2)  # [S+1, W, C_we] int32

    # ride-along state rows (single-device only): the word-end gather
    # fetches the we columns AND the state_pack row in ONE row gather;
    # the merge then carries the selected rows into the next frame's
    # carry, eliminating the per-frame [B,K] state_pack gather entirely
    # (HLO-profiled 102us/frame at B=64, K=1024; a [S+1,15] row gathers
    # at the same ~1.5ns/row as the 6-col one)
    ride_pk = Pn == 1
    C_sp = state_pack.shape[1]
    S1 = state_pack.shape[0]
    if ride_pk:
        # (ride_pk implies Pn == 1, so use_bla implies ride_phi: the
        # word-end undo subtracts the CARRIED phi2 — no sub column
        # unless survivor-mode refreshes need the node id per survivor)
        combo_cols = [we_pack.reshape(S1, wmax * C_we)]
        if lazy_phi:
            combo_cols.append(bla.sub[:, None])
        combo_cols.append(state_pack)
        combo_pack = jnp.concatenate(combo_cols, axis=1)
        # [S+1, W*C_we (+1) + C_sp]
        # Packed-row layout for LARGE tables (the 100k-vocab residency
        # story, r3 verdict item 2): TPU tiles a narrow row-major [S,C]
        # i32 table as (8,128) — C pads to 128 lanes, ~128/C x physical
        # memory — so above ~64MB physical XLA flips the table to
        # COLUMN-major and the hot word-end row gather degrades to a
        # strided path (HLO 2026-08-21 at 891k states: 4.5 ns/row vs
        # 1.5 at 56k states, 445us/frame). Packing ``pack_f`` states
        # per row restores dense row-major tiles at ~1x memory; the
        # gather fetches one wide row and log2(pack_f) int32 vector
        # selects unpack it (int selects are bit-safe for the smuggled
        # f32 cost columns; an f32 relayout would flush denormals).
        Ccmb = combo_pack.shape[1]
        S_rows = combo_pack.shape[0]
        pack_f = 1
        # test hook: RASR_TPU_PACK_THRESHOLD (bytes) forces the packed
        # path on small tables so CPU exactness tests can cover it
        _thr = int(os.environ.get("RASR_TPU_PACK_THRESHOLD", str(64 * 2**20)))
        # pack only NARROW tables: the column-major flip this works
        # around is driven by the 128-lane tile pad (128/C x physical
        # waste); wide tables (across-word wmax stacks: C~119) pad
        # ~1x, stay row-major on their own, and packing them would
        # multiply gather bytes 8x (measured: across-word ctx4
        # 193 -> 125 au-s/s with the width-blind gate, 2026-08-21)
        if Ccmb * 2 <= 128 and S_rows * 128 * 4 > _thr:
            while Ccmb * pack_f * 2 <= 128 and pack_f < 8:
                pack_f *= 2
        if pack_f > 1:
            pad_r = (-S_rows) % pack_f
            cp = (
                jnp.concatenate(
                    [combo_pack, jnp.zeros((pad_r, Ccmb), jnp.int32)]
                )
                if pad_r
                else combo_pack
            )
            # strided slices + axis-1 concat, NOT reshape: a reshape
            # forces a row-major relayout of the UNPACKED [S,C] table
            # first, whose 128-lane padding is ~9x physical (12.3GB HLO
            # temp at 25.8M states — OOMed the across-word worst-case
            # bench). Slice d picks rows d, f+d, 2f+d, ... so
            # concat(axis=1) row p = rows p*f .. p*f+f-1, identical to
            # the reshape result, with only the ~1x packed table as the
            # materialized output.
            combo_pack = jnp.concatenate(
                [cp[d::pack_f, :] for d in range(pack_f)], axis=1
            )  # [ceil(S/f), f*C]

    if use_rsel:
        # root-selection path: (dst, cls) rows for the R3 survivors
        # only. Kept int32 (NOT bitcast to f32): XLA lowers small-table
        # gathers through arithmetic f32 paths on TPU that flush the
        # denormal bit patterns of small ints to zero.
        root_pack = jnp.stack(
            [tree.root_dst, tree.root_cls], axis=1
        )  # [G, 2] int32
    else:
        # root emission selection as a static one-hot matmul: a [B,G]
        # gather costs ~7 cycles/index on the TPU gather unit; the MXU
        # streams the same selection in ~no time (one-hot rows select
        # exactly, and HIGHEST precision keeps f32 values intact)
        root_sel = jax.nn.one_hot(
            tree.root_cls, M, dtype=jnp.float32, axis=0
        )  # [M, G]

    def fsel(x, idx):
        """Batched element selection in ROW-GATHER form: TPU lowers 1-D
        element gathers to a ~12 ns/index serial path, while 2-D row
        gathers run ~1.8 ns/row (HLO-profiled on v5e: the emission
        selection dropped 467us -> ~70us per frame at B=16, E=4096 when
        rewritten this way). QUARTER-ROW form: view the flat table as
        [B*N/4, 4] (a free reshape — no duplicated-table materialization,
        which profiled at ~46us/frame in layout copies), row-gather at
        idx>>2, then pick the lane with two vector selects. Also halves
        the gather source vs the old 2x-duplicated table (better VMEM
        pin odds). Microbenched 19.6us vs 26.2us at B=64/1536 idx."""
        Bx, N = x.shape
        flat = x.reshape(Bx * N)
        pad = (-(Bx * N)) % 4
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad,), flat.dtype)], axis=0
            )
        xr = flat.reshape((Bx * N + pad) // 4, 4)
        g = idx + _row_offsets(idx, N)
        rows = xr[g >> 2]
        lo = jnp.where((g & 1) == 0, rows[..., 0], rows[..., 1])
        hi = jnp.where((g & 1) == 0, rows[..., 2], rows[..., 3])
        return jnp.where((g & 2) == 0, lo, hi)

    def combo_sel(idx):
        """Word-end/state row gather with the packed-row big-table
        layout transparently unpacked (see the combo_pack build)."""
        if not ride_pk:
            raise AssertionError("combo_sel requires ride_pk")
        if pack_f == 1:
            return combo_pack[idx]
        shift = pack_f.bit_length() - 1
        rw = combo_pack[idx >> shift]
        rw = rw.reshape(rw.shape[:-1] + (pack_f, Ccmb))
        sub_b = idx & (pack_f - 1)
        while rw.shape[-2] > 1:
            bsel = (sub_b & 1)[..., None, None]
            rw = jnp.where(
                bsel == 1, rw[..., 1::2, :], rw[..., 0::2, :]
            )
            sub_b = sub_b >> 1
        return rw[..., 0, :]

    def rowsel(rows, idx):
        """Batched ROW selection: one gather fetches all C columns per
        index (measured ~1.5-2 cycles/index vs ~7 for element gathers:
        pack columns, gather once)."""
        Bx, N, C = rows.shape
        return rows.reshape(Bx * N, C)[idx + _row_offsets(idx, N)]

    def step(carry, inputs):
        state, lms, score, bp, pk_c, fstate, flm, fscore, fbp = carry[:9]
        ci = 9
        if ride_cls:
            cls_c = carry[ci]
            ci += 1
        if ride_phi:
            phi_c = carry[ci]
            ci += 1
        if use_rnn:
            rnn_row_c, f_rnnrow, rnn_cs, rnn_hs = carry[ci : ci + 4]
        emis_t, t = inputs
        active = (t < n_frames)[:, None]

        # partitioned beam: this device expands only its K/P slice; the
        # full K beam is restored by the all_gather merge below
        if Pn > 1:
            off = my * K_loc
            state_e = jax.lax.dynamic_slice_in_dim(state, off, K_loc, 1)
            lms_e = jax.lax.dynamic_slice_in_dim(lms, off, K_loc, 1)
            score_e = jax.lax.dynamic_slice_in_dim(score, off, K_loc, 1)
            bp_e = jax.lax.dynamic_slice_in_dim(bp, off, K_loc, 1)
            if use_rnn:
                rnn_row_e = jax.lax.dynamic_slice_in_dim(
                    rnn_row_c, off, K_loc, 1
                )
        else:
            state_e, lms_e, score_e, bp_e = state, lms, score, bp
            if use_rnn:
                rnn_row_e = rnn_row_c

        # ------------------------------- per-hyp state columns
        # single-device: the carry rides each slot's packed row (picked
        # up by the word-end gather + merge below), so no per-frame
        # [B,K] state_pack gather at all; partitioned beams re-gather
        # (the all_gather merge strips payload columns)
        if ride_pk:
            pk = pk_c
        else:
            pk = state_pack[state_e]  # [B,K_loc,8|9] int32
        cls_raw = pk[..., 7]
        p_loop = score_e + bc_f(pk[..., 0])
        d1 = pk[..., 1]
        d1_cls = pk[..., 3]
        p_d1 = score_e + bc_f(pk[..., 2])
        d2 = pk[..., 4]
        d2_cls = pk[..., 6]
        p_d2 = score_e + bc_f(pk[..., 5])
        own_cls = jnp.where(cls_raw < 0, -cls_raw - 1, cls_raw)
        if deep_arc:
            # word-set lookahead: node-crossing delta per dense arc
            # (pair id 0 = within-node = zero row; loops never cross).
            # d1+d2 deltas ride ONE gather dispatch ([B, 2K] indices)
            Csp = state_pack.shape[1]
            # history class per hyp: carried (ride_cls) or gathered
            c_e = cls_c if ride_cls else _gsel(cls4, lms_e)
            cp = c_e * P1
            dd = _gsel(
                dpair4,
                jnp.concatenate(
                    [cp + pk[..., Csp - 2], cp + pk[..., Csp - 1]], axis=1
                ),
            )
            Kl = pk.shape[1]
            d1_dphi = dd[:, :Kl]
            d2_dphi = dd[:, Kl:]
            p_d1 = p_d1 + d1_dphi
            p_d2 = p_d2 + d2_dphi
        if ride_phi:
            # applied-correction payload per dense candidate (loops
            # never cross lookahead nodes; first-phone granularity has
            # zero within-word deltas by construction; survivor mode
            # carries the SOURCE node's correction until the refresh)
            phi_loop = phi_c
            phi_d1 = phi_c + d1_dphi if deep_arc else phi_c
            phi_d2 = phi_c + d2_dphi if deep_arc else phi_c

        # packed beam rows (int32 carrier; score bits bitcast in): every
        # downstream selection gathers all four beam columns (+ folded
        # branch head, + carried class/phi) with ONE row gather
        bp_pay = (bp_e + 1) * Cn + cls_c if pack_pc else bp_e
        beam_cols = [state_e, lms_e, bc_i(score_e), bp_pay]
        if fold_bh:
            beam_cols.append(pk[..., 8])
        i_cls = i_phi = i_rnn = None
        if ride_cls and not pack_pc:
            i_cls = len(beam_cols)
            beam_cols.append(cls_c)
        if ride_phi:
            i_phi = len(beam_cols)
            beam_cols.append(bc_i(phi_c))
        if use_rnn:
            i_rnn = len(beam_cols)
            beam_cols.append(rnn_row_e)
        beam_rows = jnp.stack(beam_cols, axis=-1)  # [B,K_loc,4..8] int32

        # branch overflow: only hyps at fan-out states, top-Kb by score
        has_branch = cls_raw < 0
        br_sel_score = jnp.where(has_branch, score_e, BIG)
        negb, bidx = jax.lax.top_k(-br_sel_score, kbranch)
        b_score = -negb
        b_rows = rowsel(beam_rows, bidx)  # [B,Kb,4(+1)]
        b_state = b_rows[..., 0]
        b_lm = b_rows[..., 1]
        b_bp = b_rows[..., 3]
        if fold_bh:
            bhp = b_rows[..., 4]
            bptr = bhp >> deg_bits
            deg = bhp & ((1 << deg_bits) - 1)
        else:
            bh = branch_head[b_state]  # [B,Kb,2] (ptr, deg) in one gather
            bptr = bh[..., 0]
            deg = bh[..., 1]
        if use_cw:
            # ---- compact branch expansion: pack the selected hyps'
            # arcs contiguously into Wbr slots (CSR offsets by cumsum;
            # slot -> hyp rank by a broadcast compare — cheap vector
            # work next to the padded-fan gather + sort width it saves).
            # Pruned (BIG) hyps consume no slots; slots beyond the last
            # arc are masked to the sentinel.
            deg_sel = jnp.where(b_score < BIG / 2, deg, 0)  # [B,Kb]
            off = jnp.cumsum(deg_sel, axis=1) - deg_sel  # exclusive
            s_iota = jnp.asarray(np.arange(Wbr, dtype=np.int32))
            cnt = jnp.sum(
                (off[:, :, None] <= s_iota[None, None, :]).astype(jnp.int32),
                axis=1,
            )  # [B,Wbr]: #hyps whose slot range starts at or before s
            hh = jnp.clip(cnt - 1, 0, kbranch - 1)
            # one row gather delivers every per-slot hyp column
            hp_cols = [b_lm, b_bp, bc_i(b_score), bptr, off, deg_sel]
            j_cls = j_phi = j_rnn = None
            if ride_cls and not pack_pc:
                j_cls = len(hp_cols)
                hp_cols.append(b_rows[..., i_cls])
            if ride_phi:
                j_phi = len(hp_cols)
                hp_cols.append(b_rows[..., i_phi])
            if use_rnn:
                j_rnn = len(hp_cols)
                hp_cols.append(b_rows[..., i_rnn])
            hp = rowsel(
                jnp.stack(hp_cols, axis=-1), hh
            )  # [B,Wbr,6(+3)] int32 carrier
            pos = s_iota[None, :] - hp[..., 4]
            okc = (pos >= 0) & (pos < hp[..., 5])
            a_idx = jnp.where(okc, hp[..., 3] + pos, 0)
            bpk = branch_pack[a_idx]  # [B,Wbr,3(+1)]
            br_state = jnp.where(okc, bpk[..., 0], SENT)
            br_cls = jnp.where(okc, bpk[..., 2], 0)
            b_cost = jnp.where(okc, bc_f(bpk[..., 1]), BIG)
            if deep_arc:
                if pack_pc:
                    c_b = hp[..., 1] % Cn  # class rides inside bp
                elif ride_cls:
                    c_b = hp[..., j_cls]
                else:
                    c_b = _gsel(cls4, hp[..., 0])
                br_dphi = _gsel(
                    dpair4, c_b * P1 + jnp.where(okc, bpk[..., 3], 0)
                )
                b_cost = b_cost + br_dphi
            br_pre = bc_f(hp[..., 2]) + b_cost  # [B,Wbr]
            br_lm = hp[..., 0]
            br_bp = hp[..., 1]
            if ride_phi:
                br_phi = bc_f(hp[..., j_phi])
                if deep_arc:
                    br_phi = br_phi + br_dphi
            if ride_cls_col:
                c_b_flat = c_b  # [B,Wbr] already per slot
            if use_rnn:
                br_rnn = hp[..., j_rnn]
        else:
            dslots = jnp.arange(Db, dtype=jnp.int32)
            ok = dslots < deg[..., None]
            if use_wide_br:
                # one Kb-row gather of pre-widened rows (see table build)
                bpk = branch_wide[jnp.where(deg > 0, bptr, 0)].reshape(
                    B, kbranch, Db, Cb
                )
            else:
                bi = bptr[..., None] + dslots
                bi = jnp.where(ok, bi, 0)
                bpk = branch_pack[bi]  # [B,Kb,Db,3(+1)] (1 gather)
            b_dst = jnp.where(ok, bpk[..., 0], SENT)
            b_cls = jnp.where(ok, bpk[..., 2], 0)
            b_cost = jnp.where(ok, bc_f(bpk[..., 1]), BIG)
            if deep_arc:
                if pack_pc:
                    c_b = b_rows[..., 3] % Cn
                elif ride_cls:
                    c_b = b_rows[..., i_cls]
                else:
                    c_b = _gsel(cls4, b_lm)
                # [B,Kb]
                br_dphi = _gsel(
                    dpair4, c_b[..., None] * P1 + jnp.where(ok, bpk[..., 3], 0)
                )  # [B,Kb,Db]
                b_cost = b_cost + br_dphi
            p_br = b_score[..., None] + b_cost  # [B,Kb,Db]
            br_state = b_dst.reshape(B, Wbr)
            br_cls = b_cls.reshape(B, Wbr)
            br_pre = p_br.reshape(B, Wbr)
            br_lm = jnp.repeat(b_lm, Db, axis=1)
            br_bp = jnp.repeat(b_bp, Db, axis=1)
            if ride_phi:
                br_phi = jnp.repeat(bc_f(b_rows[..., i_phi]), Db, axis=1)
                if deep_arc:
                    br_phi = br_phi + br_dphi.reshape(B, Wbr)
            if ride_cls_col:
                c_b_flat = jnp.repeat(c_b, Db, axis=1)  # [B,Wbr]
            if use_rnn:
                br_rnn = jnp.repeat(b_rows[..., i_rnn], Db, axis=1)

        # root re-entry: top-H root hyps. The best history expands every
        # root arc; the others only the Gcap most promising (arrays are
        # in static promise order).
        root_score = jnp.where(state_e == 0, score_e, BIG)
        negH, hidx = jax.lax.top_k(-root_score, hroot)
        h_score = -negH  # ascending: h=0 is the best root hypothesis
        h_rows = rowsel(beam_rows, hidx)  # [B,H,4] int32
        h_lm = h_rows[..., 1]
        h_bp = h_rows[..., 3]
        root_arc_cost = tree.root_cost
        if use_la:
            root_arc_cost = root_arc_cost + la_coeff * tree.root_dla
        if use_bla:
            # history-conditioned correction per (root hyp, root arc):
            # class of the hyp's lm state x the arc's subtree (quarter-
            # row gathers on the shared corr table); class rides the
            # beam rows when carried
            if pack_pc:
                c_h = h_rows[..., 3] % Cn
            elif ride_cls:
                c_h = h_rows[..., i_cls]
            else:
                c_h = _gsel(cls4, h_lm)
            bcorr0 = corr_arc[c_h[:, 0]]  # [B,G]: one row per batch
            if hroot > 1:
                bcorr_rest = corr_arc_cap[c_h[:, 1:]]  # [B,H-1,gcap] rows
        if use_rsel:
            # pre-emission top-R3 over the whole root fan-out: ONE
            # narrow (value, index) sort replaces Wr slots in BOTH main
            # recombination sorts; only the R3 survivors pay the
            # emission gather and they join the beam at the merge stage
            # (like word-end re-entries). Keys are unique by
            # construction: beam slots with state==0 have distinct lm
            # (post-recombination), arcs have distinct dst.
            part0 = h_score[:, :1] + root_arc_cost[None, :]
            if use_bla:
                part0 = part0 + bcorr0
            parts = [part0]
            if hroot > 1:
                rest = h_score[:, 1:, None] + root_arc_cost[None, None, :gcap]
                if use_bla:
                    rest = rest + bcorr_rest
                parts.append(rest.reshape(B, (hroot - 1) * gcap))
            rpre = jnp.concatenate(parts, axis=1)  # [B, Wr]
            iota = jnp.broadcast_to(
                jnp.arange(Wr, dtype=jnp.int32)[None, :], (B, Wr)
            )
            rs_sorted = jax.lax.sort(
                (rpre, iota), dimension=1, num_keys=1, is_stable=False
            )
            rs_pre = rs_sorted[0][:, :R3]
            rs_idx = rs_sorted[1][:, :R3]
            rs_h = jnp.where(rs_idx < G, 0, 1 + (rs_idx - G) // gcap)
            rs_g = jnp.where(rs_idx < G, rs_idx, (rs_idx - G) % gcap)
            # source-hyp columns via one-hot MXU matmul: rs_h indexes a
            # [B,H] table (H=16) — a [B,R3,H]@[B,H,2] batched matmul
            # streams through the MXU in ~us while the equivalent row
            # gather profiled 50us/frame (32768 rows). Ids must be exact
            # in f32 (< 2^24): bp ids are bounded by T*R << 2^24, so the
            # guard is on the LM state count only.
            # ids must be exact in f32 (< 2^24) for the one-hot matmul
            # (h_bp may carry the packed (bp+1)*C + class payload)
            need_cls_col = ride_phi and not pack_pc
            if (
                L < (1 << 24)
                and (not use_rnn or rnn_pool < (1 << 24))
                and (not pack_pc or (rec_cap + 1) * Cn < (1 << 24))
            ):
                hsel = jax.nn.one_hot(rs_h, hroot, dtype=jnp.float32)
                hcol_list = [
                    h_lm.astype(jnp.float32), h_bp.astype(jnp.float32)
                ]
                if need_cls_col:
                    hcol_list.append(c_h.astype(jnp.float32))
                if use_rnn:
                    hcol_list.append(h_rows[..., i_rnn].astype(jnp.float32))
                hcols = jnp.stack(hcol_list, axis=-1)  # [B,H,2..4]
                hr = jnp.matmul(
                    hsel, hcols, precision=jax.lax.Precision.HIGHEST
                )
                hr = hr.astype(jnp.int32)
            else:
                hcol_list = [h_lm, h_bp]
                if need_cls_col:
                    hcol_list.append(c_h)
                if use_rnn:
                    hcol_list.append(h_rows[..., i_rnn])
                hr = rowsel(jnp.stack(hcol_list, axis=-1), rs_h)
            rs_lm = hr[..., 0]
            rs_bp = hr[..., 1]
            if ride_phi:
                # HISTORY class of the source hyp — deliberately named
                # apart from rs_cls below, which is the destination
                # state's EMISSION class (a same-name clobber here once
                # corrupted the packed (bp, class) payload: emission
                # classes >= num_classes overflowed into the bp field —
                # caught by the 24-seed deep fuzz, 2026-08-21)
                rs_lcls = (rs_bp % Cn) if pack_pc else hr[..., 2]
            if use_rnn:
                rs_rnn = hr[..., 3 if need_cls_col else 2]
            if ride_phi:
                # the survivor's applied correction = exactly the
                # corr_arc term inside rs_pre (gcap arcs are a prefix
                # slice of the same [C, G] table)
                rs_phi = _gsel(corr_arc4, rs_lcls * G + rs_g)
            rp = root_pack[rs_g]  # [B,R3,2] (dst, cls) row gather
            rs_state = rp[..., 0]
            rs_cls = rp[..., 1]
            if use_defer:
                # emission joins with the other survivors' at the
                # word-end gather
                rs_score = jnp.minimum(rs_pre, BIG)
            else:
                rs_score = jnp.where(
                    rs_pre < BIG / 2, rs_pre + fsel(emis_t, rs_cls), BIG
                )
            root_states = []
            root_pres = []
            root_lms = []
            root_bps = []
            root_clss = []
            root_phis = []
            root_lcls = []
            root_rnns = []
        else:
            p_root_best = h_score[:, :1, None] + root_arc_cost[None, None, :]
            if use_bla:
                p_root_best = p_root_best + bcorr0[:, None, :]
            root_states = [jnp.broadcast_to(tree.root_dst, (B, G))]
            root_pres = [p_root_best.reshape(B, G)]
            root_lms = [jnp.repeat(h_lm[:, :1], G, axis=1)]
            root_bps = [jnp.repeat(h_bp[:, :1], G, axis=1)]
            root_clss = [jnp.broadcast_to(tree.root_cls[None, :], (B, G))]
            # payload sections: applied phi2 = the bcorr term just
            # added (phi at the root itself is 0); class is inherited
            root_phis = [bcorr0] if ride_phi else []
            root_lcls = (
                [jnp.repeat(c_h[:, :1], G, axis=1)] if ride_cls_col else []
            )
            root_rnns = (
                [jnp.repeat(h_rows[:, :1, i_rnn], G, axis=1)]
                if use_rnn else []
            )
            if hroot > 1:
                p_root_rest = h_score[:, 1:, None] + root_arc_cost[None, None, :gcap]
                if use_bla:
                    p_root_rest = p_root_rest + bcorr_rest
                root_states.append(
                    jnp.broadcast_to(tree.root_dst[:gcap], (B, hroot - 1, gcap))
                    .reshape(B, (hroot - 1) * gcap)
                )
                root_pres.append(p_root_rest.reshape(B, (hroot - 1) * gcap))
                root_lms.append(jnp.repeat(h_lm[:, 1:], gcap, axis=1))
                root_bps.append(jnp.repeat(h_bp[:, 1:], gcap, axis=1))
                root_clss.append(
                    jnp.broadcast_to(
                        tree.root_cls[None, None, :gcap], (B, hroot - 1, gcap)
                    ).reshape(B, (hroot - 1) * gcap)
                )
                if ride_phi:
                    root_phis.append(
                        bcorr_rest.reshape(B, (hroot - 1) * gcap)
                    )
                if ride_cls_col:
                    root_lcls.append(jnp.repeat(c_h[:, 1:], gcap, axis=1))
                if use_rnn:
                    root_rnns.append(
                        jnp.repeat(h_rows[:, 1:, i_rnn], gcap, axis=1)
                    )

        # ------------------------------------------- assemble candidates
        if pack_keys and not use_exp:
            # sectionwise packed keys: the recombination consumes ONLY
            # state*L+lm, so compute the key per section BEFORE the
            # branch fan's (Kb,Db)->Wbr flatten and skip the full-width
            # cand_state/cand_lm concats. On-chip: bench drew +1.5%
            # but the HLO profile is width-neutral — XLA rematerializes
            # the `ok` mask flat in place of the state/lm retiles, so
            # the [B,Kb,Db]->[B,Wbr] retile count stays ~5; truly
            # killing them needs per-(slot,arc) flat gathers, which is
            # the compact-branch path and LOSES at small Db (361 vs 406
            # at the headline shape, 2026-08-21)
            Lc = jnp.int32(L)
            if use_cw:
                br_key = br_state * Lc + br_lm  # already flat
            else:
                br_key = (b_dst * Lc + b_lm[:, :, None]).reshape(B, Wbr)
            cand_key_sections = jnp.concatenate(
                [state_e * Lc + lms_e, d1 * Lc + lms_e, d2 * Lc + lms_e,
                 br_key]
                + [s * Lc + l for s, l in zip(root_states, root_lms)],
                axis=1,
            )
        else:
            cand_state = jnp.concatenate(
                [state_e, d1, d2, br_state, *root_states], axis=1
            )
            cand_lm = jnp.concatenate(
                [lms_e, lms_e, lms_e, br_lm, *root_lms], axis=1
            )
        cand_bp = jnp.concatenate(
            [bp_pay, bp_pay, bp_pay, br_bp, *root_bps], axis=1
        )
        if ride_phi:
            cand_phi = jnp.concatenate(
                [phi_loop, phi_d1, phi_d2, br_phi, *root_phis], axis=1
            )
        if ride_cls_col:
            cand_lcls = jnp.concatenate(
                [cls_c, cls_c, cls_c, c_b_flat, *root_lcls], axis=1
            )
        if use_rnn:
            rr = rnn_row_e
            cand_rnn = jnp.concatenate(
                [rr, rr, rr, br_rnn, *root_rnns], axis=1
            )

        if use_defer:
            # deferred emission: candidates carry pre-emission path
            # scores through recombination + top-K; the survivors'
            # emission is added at the word-end stage (emission is a
            # function of the destination state == the recombination
            # key, so per-key winners are unchanged)
            cand_score = jnp.minimum(
                jnp.concatenate(
                    [p_loop, p_d1, p_d2, br_pre, *root_pres], axis=1
                ),
                BIG,
            )
        elif use_exp:
            # ---- pre-emission expansion pruning: rank candidates before
            # the emission gather, keep top-E, then gather emission for
            # the survivors only (E indices instead of the full width)
            cand_pre = jnp.minimum(
                jnp.concatenate(
                    [p_loop, p_d1, p_d2, br_pre, *root_pres], axis=1
                ),
                BIG,
            )
            cand_cls = jnp.concatenate(
                [own_cls, d1_cls, d2_cls, br_cls, *root_clss], axis=1
            )
            nege, eidx = jax.lax.top_k(-cand_pre, E)
            e_pre = -nege
            e_cols = [cand_state, cand_lm, cand_bp, cand_cls]
            k_cls = k_phi = k_rnn = None
            if ride_cls_col:
                k_cls = len(e_cols)
                e_cols.append(cand_lcls)
            if ride_phi:
                k_phi = len(e_cols)
                e_cols.append(bc_i(cand_phi))  # int32 carrier
            if use_rnn:
                k_rnn = len(e_cols)
                e_cols.append(cand_rnn)
            erows = rowsel(
                jnp.stack(e_cols, axis=-1), eidx
            )  # [B,E,4(+3)]
            cand_state = erows[..., 0]
            cand_lm = erows[..., 1]
            cand_bp = erows[..., 2]
            if ride_cls_col:
                cand_lcls = erows[..., k_cls]
            if ride_phi:
                cand_phi = bc_f(erows[..., k_phi])
            if use_rnn:
                cand_rnn = erows[..., k_rnn]
            cand_score = jnp.where(
                e_pre < BIG / 2, e_pre + fsel(emis_t, erows[..., 3]), BIG
            )
        else:
            # exact expansion: emission added per section
            c_loop = p_loop + fsel(emis_t, own_cls)
            c_d1 = p_d1 + fsel(emis_t, d1_cls)
            c_d2 = p_d2 + fsel(emis_t, d2_cls)
            c_br = br_pre + fsel(emis_t, br_cls)
            if use_rsel:
                root_scores = []
            else:
                emis_root = jnp.matmul(
                    emis_t, root_sel, precision=jax.lax.Precision.HIGHEST
                )  # [B,G]
                root_scores = [
                    (root_pres[0] + emis_root).reshape(B, G)
                ]
                if hroot > 1:
                    root_scores.append(
                        (
                            p_root_rest + emis_root[:, None, :gcap]
                        ).reshape(B, (hroot - 1) * gcap)
                    )
            cand_score = jnp.minimum(
                jnp.concatenate(
                    [c_loop, c_d1, c_d2, c_br, *root_scores], axis=1
                ),
                BIG,
            )

        # ------------------------------------------------- beam prune
        best = jnp.min(cand_score, axis=1, keepdims=True)
        if use_rsel:
            best = jnp.minimum(best, jnp.min(rs_score, axis=1, keepdims=True))
        if Pn > 1:
            best = jax.lax.pmin(best, beam_axis)  # global beam offset
        cand_score = jnp.where(cand_score > best + cfg.beam, BIG, cand_score)
        if use_rsel:
            rs_score = jnp.where(rs_score > best + cfg.beam, BIG, rs_score)

        # --------------------- recombination (sort+dedup) + histogram top-K
        # Two UNSTABLE variadic sorts carry the payload through directly:
        # stability adds an iota operand + tie compares we never need
        # (ties beyond (key, score) pick an arbitrary equal-score path),
        # and sorting values instead of top_k-then-gather skips the
        # index stack, its layout copy, and the row gather (HLO-profiled:
        # ~150us/frame at B=16, width 10241).
        def recombine_topk(key_parts, score, pays, k):
            """Dedup by key (keep per-key min score) then top-k by score.

            key_parts: (packed_key,) or (state, lm); ``pays`` is a tuple
            of payload operands (bp, and the carried class/phi2 when
            bigram-lookahead riding is on — both functions of the key,
            so per-key winners carry the right values). Returns key
            parts, score [B, k], payload tuple."""
            nk = len(key_parts)
            s = jax.lax.sort(
                (*key_parts, score, *pays), dimension=1,
                num_keys=nk + 1, is_stable=False,
            )
            if nk == 1:
                diff = s[0][:, 1:] != s[0][:, :-1]
            else:
                diff = (s[0][:, 1:] != s[0][:, :-1]) | (s[1][:, 1:] != s[1][:, :-1])
            first = jnp.concatenate([jnp.ones((B, 1), bool), diff], axis=1)
            dscore = jnp.where(first, s[nk], BIG)
            out = jax.lax.sort(
                (dscore, *s[:nk], *s[nk + 1 :]), dimension=1,
                num_keys=1, is_stable=False,
            )
            return (
                out[1 : 1 + nk],
                out[0][:, :k],
                tuple(p[:, :k] for p in out[1 + nk :]),
            )

        cand_pays = (cand_bp,)
        if ride_cls_col:
            cand_pays += (cand_lcls,)
        if ride_phi:
            cand_pays += (cand_phi,)  # genuine f32 (not smuggled bits)
        if use_rnn:
            # rnn state row per candidate: NOT a function of the key —
            # the per-key min-score winner's row survives, which IS the
            # truncated-history recombination semantics (rnn_fusion.py)
            cand_pays += (cand_rnn,)
        if pack_keys:
            # (state, lm) packed into one int32 key (computed per
            # section before the branch flatten unless the expansion
            # path regathered the columns — see assembly above)
            if use_exp:
                cand_key = cand_state * jnp.int32(L) + cand_lm
            else:
                cand_key = cand_key_sections
            keys, n_score, n_pays = recombine_topk(
                (cand_key,), cand_score, cand_pays, topn
            )
            n_key = keys[0][:, :topn]
        else:
            keys, n_score, n_pays = recombine_topk(
                (cand_state, cand_lm), cand_score, cand_pays, topn
            )
            n_state, n_lm = keys[0][:, :topn], keys[1][:, :topn]
        pi = 1
        if pack_pc:
            n_bp = n_pays[0] // Cn - 1
            n_lcls = n_pays[0] % Cn
        else:
            n_bp = n_pays[0]
            if ride_cls:
                n_lcls = n_pays[pi]
                pi += 1
        if ride_phi:
            n_phi = n_pays[pi]
            pi += 1
        if use_rnn:
            n_rnn = n_pays[pi]

        if Pn > 1:
            # ---- collective beam merge: gather every device's deduped
            # local top-K, re-sort + dedup (a hypothesis reachable on two
            # slices recombines here), keep the global top-K — replicated,
            # so word-end/LM processing below runs identically everywhere
            # int32 carrier for the collective payload (score bits
            # bitcast in): f32 relayouts flush smuggled int patterns
            key_cols = [n_key] if pack_keys else [n_state, n_lm]
            pay_cols = key_cols + [bc_i(n_score), n_bp]
            if use_rnn:
                # the pool ROW is one more int32 payload column; the
                # pool itself stays replicated (word ends run after the
                # merge, identically on every device)
                pay_cols.append(n_rnn)
            pay = jnp.stack(pay_cols, axis=-1)
            gath = jax.lax.all_gather(pay, beam_axis, axis=1, tiled=True)
            nk = len(key_cols)
            g_score = bc_f(gath[..., nk])
            g_pays = tuple(
                gath[..., nk + 1 + j] for j in range(len(pay_cols) - nk - 1)
            )
            keys, n_score, g_out = recombine_topk(
                tuple(gath[..., j] for j in range(nk)), g_score, g_pays, K
            )
            n_bp = g_out[0]
            if use_rnn:
                n_rnn = g_out[1]
            if pack_keys:
                n_key = keys[0][:, :K]
            else:
                n_state, n_lm = keys[0][:, :K], keys[1][:, :K]
        if pack_keys:
            n_state = n_key // jnp.int32(L)
            n_lm = n_key - n_state * jnp.int32(L)
        n_state = jnp.where(n_score >= BIG / 2, SENT, n_state)

        # word-end scan runs over the beam PLUS this frame's root-select
        # arrivals (so first-phone word ends fire the frame the word is
        # entered, exactly as when root arcs ride the main sort)
        if use_rsel:
            rs_state = jnp.where(rs_score >= BIG / 2, SENT, rs_state)
            w_state = jnp.concatenate([n_state, rs_state], axis=1)
            w_lm = jnp.concatenate([n_lm, rs_lm], axis=1)
            w_score = jnp.concatenate([n_score, rs_score], axis=1)
            w_bp = jnp.concatenate(
                [n_bp, (rs_bp // Cn - 1) if pack_pc else rs_bp], axis=1
            )
            if ride_cls:
                w_lcls = jnp.concatenate([n_lcls, rs_lcls], axis=1)
            if ride_phi:
                w_phi = jnp.concatenate([n_phi, rs_phi], axis=1)
            if use_rnn:
                w_rnnrow = jnp.concatenate([n_rnn, rs_rnn], axis=1)
        else:
            w_state, w_lm, w_score, w_bp = n_state, n_lm, n_score, n_bp
            if ride_cls:
                w_lcls = n_lcls
            if ride_phi:
                w_phi = n_phi
            if use_rnn:
                w_rnnrow = n_rnn
        KW = K + R3

        # ------------------------------------------------- word ends
        if ride_pk:
            # one row gather for we columns AND next frame's state rows
            combo = combo_sel(w_state)  # [B,KW,W*C_we(+1)+C_sp] int32
            wpk = combo[..., : wmax * C_we].reshape(B, KW, wmax, C_we)
            coff = wmax * C_we
            if lazy_phi:
                sub_w = combo[..., coff]  # [B,KW] lookahead-node ids
                coff += 1
            spk_w = combo[..., coff:]  # [B,KW,C_sp]
        else:
            wpk = we_pack[w_state]  # [B,KW,W,6] (1 gather, all we cols)
            if use_bla:
                sub_w = _gsel(sub4, w_state)
        if lazy_phi:
            # survivor refresh (the lazy lookahead activation): the
            # K+R3 survivors pull their CURRENT node's correction in
            # ONE [B,KW] gather, replacing the per-candidate crossing
            # deltas; scores move by (fresh - carried)
            phi_fresh = _gsel(corr4, w_lcls * Gla1 + sub_w)
            w_score = jnp.where(
                w_score < BIG / 2, w_score + (phi_fresh - w_phi), w_score
            )
            w_phi = phi_fresh
        if use_defer:
            # survivors' current-frame emission (cls rides the word-end
            # gather; one KW-row fsel replaces the candidate-wide ones)
            w_cls = wpk[..., 0, 4]
            w_score = jnp.where(
                w_score < BIG / 2, w_score + fsel(emis_t, w_cls), BIG
            )
        ww = wpk[..., 0]
        # the unigram-potential undo is FOLDED into the we-cost column
        # (see the table build above); only the bigram phi undo remains
        we_base = w_score
        if ride_phi:
            # undo the bigram correction: the applied phi2 rides each
            # slot (sort payload) — a subtract instead of the [B,KW]
            # class lookup + corr gather (the re-entry root's phi2 is 0
            # so no add-back is ever needed)
            we_base = we_base - w_phi
        elif use_bla:
            # partitioned beams: gather form (payload doesn't ride the
            # all_gather merge)
            c_w = _gsel(cls4, w_lm)  # [B,KW]
            we_base = we_base - _gsel(corr4, c_w * Gla1 + sub_w)
        # source-hypothesis columns (lm state, backpointer, rnn row)
        # RIDE the selection sorts as payload operands instead of a
        # post-hoc stack + row gather: the [B*KW, 2] (lm, bp) interleave
        # relayout feeding that gather was the single most expensive op
        # in the frame (HLO profile 2026-08-21: 154us copy + 38us gather
        # per frame at B=64/KW=1536; an extra sort operand at this width
        # costs ~12-15us). The variadic sort replaces top_k with the
        # slot iota as a SECOND sort key, reproducing top_k's
        # deterministic by-index tie-break exactly (equal-score
        # homophone records must keep the same winner as before —
        # test_word_end_pruning pins this).
        kw_iota = jnp.broadcast_to(
            jnp.arange(KW, dtype=jnp.int32)[None, :], (B, KW)
        )
        # operand packing: each extra variadic-sort operand costs
        # ~13us/frame at this width — pack (bp, lm) and (word, next)
        # pairs into single int32 columns when their static bounds fit
        # (bp < rec_cap = R*T, lm < L, word < V+1 from the dense
        # unigram table, next < S1; all trace-time constants)
        V1 = lm_prep[3].shape[0]  # V + 1
        g_src = rec_cap > 0 and (rec_cap + 2) * L < 2**31
        if g_src:
            src_ops = [(w_bp + 1) * jnp.int32(L) + w_lm]
        else:
            src_ops = [w_lm, w_bp]
        if use_rnn:
            src_ops.append(w_rnnrow)
        if wmax > 1:
            # two-stage EXACT top-R. Per-state word-end slots are
            # COST-SORTED at flatten time (slot j >= slot 0 for the same
            # hypothesis), so any hypothesis whose slot-0 candidate
            # misses the top R of the slot-0 column bounds ALL its slots
            # above the column's R-th best — which itself bounds the
            # global R-th best. Stage 1 ranks the [B, KW] slot-0 column;
            # stage 2 ranks the survivors' [B, R*wmax] slot fan:
            # KW + R*wmax sorted instead of KW*wmax. Word-end-slot
            # stacking (homophones, grouped across-word re-entries)
            # otherwise multiplies the dominant selection width
            # (docs/PERF.md across-word table: 119 -> see bench).
            pre0 = jnp.where(
                ww[..., 0] != WORD_NONE,
                we_base + bc_f(wpk[..., 0, 1])
                + (bc_f(wpk[..., 0, 5]) if use_werank else 0.0),
                BIG,
            )
            Rh = min(R, KW)
            s1 = jax.lax.sort(
                (pre0, kw_iota, bc_i(we_base), *src_ops),
                dimension=1, num_keys=2, is_stable=False,
            )
            hsel = s1[1][:, :Rh]
            base_r = bc_f(s1[2][:, :Rh])  # [B, Rh]
            src_r = [o[:, :Rh] for o in s1[3:]]
            wpk_r = rowsel(wpk.reshape(B, KW, wmax * C_we), hsel).reshape(
                B, Rh, wmax, C_we
            )
            pre = jnp.where(
                wpk_r[..., 0] != WORD_NONE,
                base_r[..., None] + bc_f(wpk_r[..., 1])
                + (bc_f(wpk_r[..., 5]) if use_werank else 0.0),
                BIG,
            ).reshape(B, Rh * wmax)
            rw_iota = jnp.broadcast_to(
                jnp.arange(Rh * wmax, dtype=jnp.int32)[None, :],
                (B, Rh * wmax),
            )
            s2 = jax.lax.sort(
                (pre, rw_iota, *[jnp.repeat(o, wmax, axis=1) for o in src_r]),
                dimension=1, num_keys=2, is_stable=False,
            )
            r_pre = s2[0][:, :R]
            ridx = s2[1][:, :R]
            src_sel = [o[:, :R] for o in s2[2:]]
            rsel = wpk_r.reshape(B * Rh * wmax, C_we)[
                ridx + _row_offsets(ridx, Rh * wmax)
            ]  # [B,R,C_we]
        else:
            wc = bc_f(wpk[..., 1])
            if use_werank:
                wc = wc + bc_f(wpk[..., 5])
            pre = jnp.where(
                ww != WORD_NONE, we_base[..., None] + wc, BIG
            ).reshape(B, KW)
            # the survivors' we RECORD columns (word, lemma, next state,
            # + selection bias to undo) also ride as payload: nothing
            # gathers rows of wpk afterwards, so the [B,KW,C_we]
            # row-major relayout + flat record gather disappear (HLO
            # profile 2026-08-21: 153us copy + 39us gather vs ~13us
            # per extra operand at this width). (word, next) pack into
            # one column when the bounds fit (see g_wn).
            wcol = lambda c: wpk[..., c].reshape(B, KW)
            g_wn = (V1 + 2) * (S1 + 1) < 2**31
            if g_wn:
                we_ops = [
                    (wcol(0) + 2) * jnp.int32(S1 + 1) + wcol(3), wcol(2)
                ]
            else:
                we_ops = [wcol(0), wcol(2), wcol(3)]
            if use_werank:
                we_ops.append(wcol(5))
            s1 = jax.lax.sort(
                (pre, kw_iota, *src_ops, *we_ops),
                dimension=1, num_keys=2, is_stable=False,
            )
            r_pre = s1[0][:, :R]
            src_sel = [o[:, :R] for o in s1[2 : 2 + len(src_ops)]]
            we_sel = [o[:, :R] for o in s1[2 + len(src_ops) :]]
            if g_wn:
                r_word = we_sel[0] // jnp.int32(S1 + 1) - 2
                r_next = we_sel[0] % jnp.int32(S1 + 1)
                r_lemma = we_sel[1]
                r_bias = bc_f(we_sel[2]) if use_werank else None
            else:
                r_word, r_lemma, r_next = we_sel[0], we_sel[1], we_sel[2]
                r_bias = bc_f(we_sel[3]) if use_werank else None
        if wmax > 1:
            if use_werank:
                r_bias = bc_f(rsel[..., 5])
            r_word = rsel[..., 0]
            r_lemma = rsel[..., 2]
            r_next = rsel[..., 3]
        if use_werank:
            # undo the unigram selection bias: survivors carry their true
            # pre-LM path score; the exact LM cost replaces the estimate
            r_pre = jnp.where(r_pre < BIG / 2, r_pre - r_bias, r_pre)
        if g_src:
            r_srcbp = src_sel[0] // jnp.int32(L) - 1
            r_srclm = src_sel[0] % jnp.int32(L)
        else:
            r_srclm = src_sel[0]
            r_srcbp = src_sel[1]

        is_lm_word = r_word >= 0
        lm_cost, lm_next = lookup_prepared(
            lm, lm_prep, r_srclm.reshape(-1), jnp.maximum(r_word, 0).reshape(-1)
        )
        lm_cost = lm_cost.reshape(B, R)
        lm_next = lm_next.reshape(B, R)
        r_lmcost = jnp.where(is_lm_word, cfg.lm_scale * lm_cost, 0.0)
        r_newlm = jnp.where(is_lm_word, lm_next, r_srclm)
        if use_rnn:
            # fused RNN-LM score + state update for the R records. The
            # source hypothesis's hidden state sits at its CARRIED pool
            # row (r_srcrow — payload column, no record-id keying).
            from .rnn_fusion import cell_step, word_scores

            r_srcrow = src_sel[1 if g_src else 2]  # [B,R]
            h_src = rowsel(rnn_hs, r_srcrow)  # [B,R,H]
            c_src = rowsel(rnn_cs, r_srcrow)
            wid = rnn.word_map[jnp.maximum(r_word, 0)]  # [B,R]
            scored = is_lm_word & (wid >= 0)
            wcost = word_scores(rnn, h_src, jnp.maximum(wid, 0))
            rnn_cost = jnp.where(
                scored,
                rnn.weight * wcost,
                jnp.where(is_lm_word, rnn.weight * rnn.oov_cost, 0.0),
            )
            r_lmcost = r_lmcost + rnn_cost
            x = rnn.emb[jnp.maximum(wid, 0)]  # [B,R,E]
            c_new, h_new = cell_step(rnn, x, c_src, h_src)
            # silence/OOV keep the state; frozen rows keep old contents
            adv = (scored & active)[..., None]
            c_new = jnp.where(adv, c_new, c_src)
            h_new = jnp.where(adv, h_new, h_src)
            keep = active[..., None]
            row0 = rnn_off + t * R  # this frame's fresh pool rows
            old_c = jax.lax.dynamic_slice(
                rnn_cs, (0, row0, 0), (B, R, rnn_cs.shape[2])
            )
            old_h = jax.lax.dynamic_slice(
                rnn_hs, (0, row0, 0), (B, R, rnn_hs.shape[2])
            )
            rnn_cs = jax.lax.dynamic_update_slice(
                rnn_cs, jnp.where(keep, c_new, old_c), (0, row0, 0)
            )
            rnn_hs = jax.lax.dynamic_update_slice(
                rnn_hs, jnp.where(keep, h_new, old_h), (0, row0, 0)
            )
            # re-entry hyps point at this frame's rows
            new_rnnrow = row0 + jnp.arange(R, dtype=jnp.int32)[None, :]
            new_rnnrow = jnp.broadcast_to(new_rnnrow, (B, R))
        r_score = jnp.where(r_pre < BIG / 2, r_pre + r_lmcost, BIG)
        if cfg.word_end_beam < 1e8:
            # word-end beam AFTER the exact LM cost (ref: word-end
            # pruning prunes LM-scored word ends, not the pre-LM rank)
            we_best = jnp.min(r_score, axis=1, keepdims=True)
            r_score = jnp.where(
                r_score > we_best + cfg.word_end_beam, BIG, r_score
            )
        r_valid = (r_score < BIG / 2) & active

        rec_id = jnp.broadcast_to(
            t * R + jnp.arange(R, dtype=jnp.int32)[None, :], (B, R)
        )
        root_state = jnp.where(r_valid, r_next, SENT)
        root_score = jnp.where(r_valid, r_score, BIG)
        root_bp = rec_id
        if use_bla and bla.reentry:
            # general (WFST) networks: word-end re-entries land on
            # junction states with non-sentinel lookahead nodes — add
            # the entry node's correction to the re-entering score
            # (exact shaping: the within-word machinery undoes the
            # carried phi at the next word end; on tree/across-word
            # networks every re-entry hits a zero-sentinel root and
            # this path is never compiled in)
            c_re = _gsel(cls4, r_newlm)
            phi_re = _gsel(corr4, c_re * Gla1 + _gsel(sub4, root_state))
            root_score = jnp.where(r_valid, root_score + phi_re, BIG)

        # --------------- merge word-end re-entries (+ root-select arrivals)
        m_score = jnp.concatenate([w_score, root_score], axis=1)
        # top_k + row gather beats a payload value-sort at this width
        # (K+R: 168 vs 158 audio-s/s at B=64; re-measured at KW+R=1600:
        # 333 vs 283 — the 4-operand sort loses MORE than the op-count
        # model predicts, don't redo); re-sorting the carry by state id
        # for gather locality also measured slower
        if ride_cls:
            # re-entry hyps take the class of their NEW lm state (a
            # [B,R] lookup — the only per-frame class gather left)
            cls_new = _gsel(cls4, r_newlm)
        if pack_pc:
            m_bp_col = jnp.concatenate(
                [(w_bp + 1) * Cn + w_lcls, (root_bp + 1) * Cn + cls_new],
                axis=1,
            )
        else:
            m_bp_col = jnp.concatenate([w_bp, root_bp], axis=1)
        m_cols = [
            jnp.concatenate([w_state, root_state], axis=1),
            jnp.concatenate([w_lm, r_newlm], axis=1),
            m_bp_col,
        ]
        if ride_cls_col:
            m_cols.append(jnp.concatenate([w_lcls, cls_new], axis=1))
        if ride_phi:
            # re-entry hyps restart at a root: phi2 = 0 — except on
            # general (WFST) networks, where the applied correction of
            # the junction entry rides along for the next word-end undo
            re_phi_col = (
                bc_i(jnp.where(r_valid, phi_re, 0.0))
                if (use_bla and bla.reentry)
                else jnp.zeros((B, R), jnp.int32)
            )
            m_cols.append(
                jnp.concatenate([bc_i(w_phi), re_phi_col], axis=1)
            )
        if use_rnn:
            m_cols.append(jnp.concatenate([w_rnnrow, new_rnnrow], axis=1))
        m_core = jnp.stack(m_cols, axis=-1)  # [B,KW+R,3(+3)] int32
        if ride_pk:
            # append the state rows so the merge delivers next frame's
            # pk directly (word-end re-entries get a tiny [B,R] gather);
            # everything is an int32 carrier — this relayout is exactly
            # where an f32 carrier got its smuggled ids flushed on TPU
            if pack_f > 1:
                # the packed combo row already carries the state-pack
                # columns — avoids a second strided gather from the
                # column-major [S,C_sp] table (HLO: 30ns/row at 891k)
                spk_root = combo_sel(root_state)[..., Ccmb - C_sp :]
            else:
                spk_root = state_pack[root_state]  # [B,R,C_sp] int32
            m_rows = jnp.concatenate(
                [
                    m_core,
                    jnp.concatenate([spk_w, spk_root], axis=1),
                ],
                axis=2,
            )  # [B,KW+R,3+C_sp] int32
        else:
            m_rows = m_core
        neg2, idx2 = jax.lax.top_k(-m_score, K)
        f2 = rowsel(m_rows, idx2)
        f2_score = -neg2
        f2_state = jnp.where(f2_score >= BIG / 2, SENT, f2[..., 0])
        f2_lm = f2[..., 1]
        if pack_pc:
            f2_bp = f2[..., 2] // Cn - 1
            f2_cls = f2[..., 2] % Cn
        else:
            f2_bp = f2[..., 2]
        mcol = 3
        if ride_cls_col:
            f2_cls = f2[..., mcol]
            mcol += 1
        if ride_phi:
            f2_phi = bc_f(f2[..., mcol])
            mcol += 1
        if use_rnn:
            f2_rnn = f2[..., mcol]
            mcol += 1
        if ride_pk:
            # a SENT-forced slot keeps whatever row rode along: its
            # score is BIG, so every expansion it seeds stays BIG and
            # loses recombination — same guarantees as the sentinel row
            f2_pk = f2[..., mcol:]
        else:
            f2_pk = pk_c

        # ----------------------------------------------- freeze inactive
        state = jnp.where(active, f2_state, state)
        lms = jnp.where(active, f2_lm, lms)
        score = jnp.where(active, f2_score, score)
        bp = jnp.where(active, f2_bp, bp)
        pk_n = jnp.where(active[:, :, None], f2_pk, pk_c)
        if ride_cls:
            cls_n = jnp.where(active, f2_cls, cls_c)
        if ride_phi:
            phi_n = jnp.where(active, f2_phi, phi_c)
        if use_rnn:
            rnn_row_n = jnp.where(active, f2_rnn, rnn_row_c)

        is_last = (t == n_frames - 1)[:, None]
        fstate = jnp.where(is_last, state, fstate)
        flm = jnp.where(is_last, lms, flm)
        fscore = jnp.where(is_last, score, fscore)
        fbp = jnp.where(is_last, bp, fbp)
        if use_rnn:
            f_rnnrow = jnp.where(is_last, rnn_row_n, f_rnnrow)

        recs = (
            jnp.where(r_valid, r_lemma, -1),
            jnp.where(r_valid, r_score, BIG),
            jnp.where(r_valid, r_srcbp, -1),
            r_lmcost,
            jnp.where(r_valid, r_word, WORD_NONE),
            jnp.where(r_valid, r_newlm, -1),
        )
        core = (state, lms, score, bp, pk_n, fstate, flm, fscore, fbp)
        if ride_cls:
            core = core + (cls_n,)
        if ride_phi:
            core = core + (phi_n,)
        if use_rnn:
            return core + (rnn_row_n, f_rnnrow, rnn_cs, rnn_hs), recs
        return core, recs

    return step, carry0


def init_carry(
    B: int, cfg: BeamConfig, lm: NgramTables, state_pack,
    bla=None, partitioned: bool = False, rnn=None, rnn_pool: int = 0,
):
    """Initial beam carry: one live hypothesis at the tree root in the
    LM start state (shared by offline scan and streaming restart).

    ``state_pack`` is ``_build_state_pack(tree, cfg)[0]``: the carry
    rides each beam slot's packed state row across frames (all slots
    start at the tree root = row 0), saving the per-frame [B,K] row
    re-gather (102us/frame HLO-profiled at B=64, K=1024). With bigram
    lookahead (single-device) the carry also rides each slot's applied
    correction phi2 (+ its history class at word-set granularity) —
    see _ride_flags. With RNN fusion it additionally holds the
    record-keyed hidden-state ring buffers (row ``rnn_pool`` = <s>)."""
    K = cfg.max_hyps
    state0 = jnp.full((B, K), 0, jnp.int32)
    lm0 = jnp.full((B, K), lm.start_state, jnp.int32)
    score0 = jnp.full((B, K), BIG, jnp.float32).at[:, 0].set(0.0)
    bp0 = jnp.full((B, K), -1, jnp.int32)
    pk0 = jnp.broadcast_to(
        state_pack[0][None, None, :], (B, K, state_pack.shape[1])
    )
    core = (state0, lm0, score0, bp0, pk0, state0, lm0, score0, bp0)
    ride_cls, ride_phi = _ride_flags(cfg, bla, partitioned)
    if ride_cls:
        # every slot starts at the tree root in the LM start state
        core = core + (
            jnp.broadcast_to(bla.cls_of_lm[lm.start_state], (B, K)).astype(jnp.int32),
        )
    if ride_phi:
        core = core + (jnp.zeros((B, K), jnp.float32),)  # phi(root) = 0
    if rnn is None:
        return core
    # bounded state pool: rnn_pool writable rows + the <s> init row at
    # index rnn_pool; every slot starts pointing at the init row (the
    # per-hyp row is a sort-payload column — see _make_step)
    H = rnn.hidden
    cs = jnp.zeros((B, rnn_pool + 1, H), jnp.float32)
    hs = jnp.zeros((B, rnn_pool + 1, H), jnp.float32)
    cs = cs.at[:, rnn_pool].set(rnn.init_c)
    hs = hs.at[:, rnn_pool].set(rnn.init_h)
    row0 = jnp.full((B, K), rnn_pool, jnp.int32)
    return core + (row0, row0, cs, hs)


def _best_and_records(
    lm, lm_prep, recs, finals, cfg: BeamConfig, T: int, nfinal: int = 1,
    rnn=None, rnn_pools=None, f_rnnrow=None,
):
    """Final best-hypothesis selection + device traceback walk (the tail
    shared by the offline scan and the streaming finalize).

    ``nfinal``: states [0, nfinal) accept complete hypotheses (the
    within-word tree has one root; the across-word network two)."""
    fstate, flm, fscore, fbp = finals
    B = fstate.shape[0]
    R = cfg.word_end_limit

    # sentence-end LM scores for final root hyps
    end_cost, _ = lookup_prepared(
        lm, lm_prep,
        flm.reshape(-1),
        jnp.full((B * fstate.shape[1],), max(lm.end_word, 0), jnp.int32),
    )
    end_cost = jnp.where(lm.end_word >= 0, cfg.lm_scale * end_cost.reshape(fstate.shape), 0.0)
    if rnn is not None and rnn.end_wid >= 0:
        # fused RNN </s> cost from the final hyps' carried pool rows
        from .rnn_fusion import word_scores

        _, rnn_hs = rnn_pools
        Pp = rnn_hs.shape[1]
        off = jnp.asarray(
            (np.arange(B, dtype=np.int32) * Pp).reshape(B, 1)
        )
        h = rnn_hs.reshape(B * Pp, -1)[f_rnnrow + off]  # [B,K,H]
        end_cost = end_cost + rnn.weight * word_scores(
            rnn, h, jnp.full(fstate.shape, rnn.end_wid, jnp.int32)
        )
    # ---- best-complete-hypothesis selection + traceback ON DEVICE ----
    # host transfers through the tunnel run at MB/s; the full record
    # tensors ship only when lattices are requested (lazy), while the
    # best path walks here and returns [MAXW, B] words/times.
    r_lemma, r_score, r_prev, r_lmcost, r_word, r_lm = recs
    final_total = jnp.where(fstate < nfinal, fscore + end_cost, BIG)
    best_idx = jnp.argmin(final_total, axis=1)
    best_score = jnp.take_along_axis(final_total, best_idx[:, None], axis=1)[:, 0]
    best_bp = jnp.take_along_axis(fbp, best_idx[:, None], axis=1)[:, 0]
    # fallback for utterances with no complete hypothesis
    fb_idx = jnp.argmin(fscore, axis=1)
    incomplete = best_score >= BIG / 2
    best_score = jnp.where(
        incomplete, jnp.take_along_axis(fscore, fb_idx[:, None], axis=1)[:, 0],
        best_score,
    )
    best_bp = jnp.where(
        incomplete, jnp.take_along_axis(fbp, fb_idx[:, None], axis=1)[:, 0], best_bp
    )

    MAXW = min(T, 512)
    barange = jnp.arange(B)

    def walk(bp, _):
        valid = bp >= 0
        t = jnp.maximum(bp, 0) // R
        r = jnp.maximum(bp, 0) % R
        lem = r_lemma[t, barange, r]
        prev = r_prev[t, barange, r]
        out = (
            jnp.where(valid, lem, -1),
            jnp.where(valid, t, -1),
            jnp.where(valid, bp, -1),
        )
        return jnp.where(valid, prev, -1), out

    _, (w_lemma, w_time, w_rec) = jax.lax.scan(walk, best_bp, None, length=MAXW)

    rec_int = jnp.stack([r_lemma, r_prev, r_word, r_lm], axis=-1)  # [T,B,R,4]
    rec_f = jnp.stack([r_score, r_lmcost], axis=-1)  # [T,B,R,2]
    fin_int = jnp.stack([fstate, flm, fbp], axis=-1)  # [B,K,3]
    fin_f = jnp.stack([fscore, end_cost], axis=-1)  # [B,K,2]
    # single host-transfer payload: walk rows + one trailer row holding
    # the bitcast best score (the tunnel charges ~70ms per transfer
    # regardless of size, so everything rides one array)
    score_row = jnp.broadcast_to(
        jax.lax.bitcast_convert_type(best_score, jnp.int32)[None, :, None],
        (1, B, 3),
    )
    best = jnp.concatenate(
        [jnp.stack([w_lemma, w_time, w_rec], axis=-1), score_row], axis=0
    )  # [MAXW+1, B, 3]
    return best, (rec_int, rec_f, fin_int, fin_f)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "wmax", "hroot", "kbranch", "beam_axis", "beam_par", "nfinal",
    ),
)
def _decode_scan(
    tree: TreeTables,
    lm: NgramTables,
    lm_prep,  # prepare_lookup(lm) tables, built once per decoder
    emissions: jnp.ndarray,  # [B, T, M]
    n_frames: jnp.ndarray,  # [B]
    bla,  # Optional[BigramTables] (None = unigram-only shaping)
    rnn,  # Optional[RnnFusionTables] (None = n-gram only)
    cfg: BeamConfig,
    wmax: int,
    hroot: int,
    kbranch: int,
    beam_axis: Optional[str] = None,
    beam_par: int = 1,
    nfinal: int = 1,
):
    """Whole-utterance batched decode: scan + final selection/traceback."""
    B, T, M = emissions.shape
    rnn_pool = cfg.word_end_limit * T if rnn is not None else 0
    step, carry0 = _make_step(
        tree, lm, lm_prep, n_frames, cfg, B, M, wmax, hroot, kbranch,
        beam_axis, beam_par, bla, rnn,
        rec_cap=cfg.word_end_limit * T, rnn_pool=rnn_pool,
    )
    ts = jnp.arange(T, dtype=jnp.int32)
    carry, recs = jax.lax.scan(
        step, carry0, (jnp.swapaxes(emissions, 0, 1), ts),
        unroll=cfg.scan_unroll,
    )
    fstate, flm, fscore, fbp = carry[5:9]
    # rnn entries sit LAST: (rnn_row, f_rnnrow, cs, hs)
    rnn_pools = carry[-2:] if rnn is not None else None
    f_rnnrow = carry[-3] if rnn is not None else None
    return _best_and_records(
        lm, lm_prep, recs, (fstate, flm, fscore, fbp), cfg, T, nfinal,
        rnn, rnn_pools, f_rnnrow,
    )


@partial(
    jax.jit, static_argnames=("cfg", "wmax", "hroot", "kbranch", "rnn_base")
)
def _decode_block(
    tree: TreeTables,
    lm: NgramTables,
    lm_prep,
    emissions: jnp.ndarray,  # [B, Tb, M] one block of frames
    t0: jnp.ndarray,  # scalar: global index of the block's first frame
    n_frames: jnp.ndarray,  # [B] total frames (may exceed what's fed)
    bla,  # Optional[BigramTables]
    rnn,  # Optional[RnnFusionTables]
    carry,
    cfg: BeamConfig,
    wmax: int,
    hroot: int,
    kbranch: int,
    rnn_base: int = 0,  # first pool row this block writes (2K after
    # the streaming compaction; see streaming.py)
):
    """One streaming feed: advance the beam over a block of frames.
    ``t0`` is traced, so every same-shaped block reuses one executable.
    With RNN fusion the carry's state pool must hold rnn_base + R * Tb
    rows (the streaming compaction sizes it per feed)."""
    B, Tb, M = emissions.shape
    rnn_pool = int(carry[-2].shape[1]) if rnn is not None else 0
    step, _ = _make_step(
        tree, lm, lm_prep, n_frames, cfg, B, M, wmax, hroot, kbranch,
        bla=bla, rnn=rnn, rnn_pool=rnn_pool,
        rnn_off=rnn_base - t0 * cfg.word_end_limit,
    )
    ts = t0 + jnp.arange(Tb, dtype=jnp.int32)
    return jax.lax.scan(step, carry, (jnp.swapaxes(emissions, 0, 1), ts))


@partial(jax.jit, static_argnames=("tb_rows",))
def _compact_rnn_carry(carry, tb_rows: int):
    """Streaming RNN-fusion pool compaction (between feeds): the only
    rows any FUTURE read can touch are those referenced by the live
    beam (rnn_row) and by frozen finals (f_rnnrow) — at most 2K per
    batch row. Gather them into slots [0, 2K), rewrite the row payload
    columns, and size the pool for the next block's writes: fixed
    memory 2K + R*Tb rows regardless of utterance length (the r2
    verdict's bounded-pool ask; the reference caches per-history
    states with quantized/compressed storage, src/Lm/TF*)."""
    rnn_row, f_rnnrow, cs, hs = carry[-4:]
    B, K = rnn_row.shape
    Pp, H = cs.shape[1], cs.shape[2]
    off = jnp.asarray((np.arange(B, dtype=np.int32) * Pp).reshape(B, 1))

    def compact(pool):
        flat = pool.reshape(B * Pp, H)
        new = jnp.zeros((B, 2 * K + tb_rows, H), pool.dtype)
        new = new.at[:, :K].set(flat[rnn_row + off])
        return new.at[:, K : 2 * K].set(flat[f_rnnrow + off])

    new_row = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None, :], (B, K)
    )
    return carry[:-4] + (
        new_row, new_row + K, compact(cs), compact(hs)
    )


@partial(jax.jit, static_argnames=("cfg", "nfinal"))
def _finalize_stream(
    lm: NgramTables,
    lm_prep,
    recs,  # concatenated (bucket-padded) [T_cap, B, R] record arrays
    carry,
    captured: jnp.ndarray,  # [B] bool: n_frames was reached during feeds
    cfg: BeamConfig,
    nfinal: int = 1,
    rnn=None,
):
    """Streaming finalize: utterances whose declared length was reached
    use the frozen finals captured in the scan; still-live utterances
    are finalized at the current frontier (the reference's
    getCurrentBestSentence semantics for partial hypotheses)."""
    # carry may hold trailing bigram-lookahead / rnn payload entries
    state, lms, score, bp, _pk, fstate, flm, fscore, fbp = carry[:9]
    c = captured[:, None]
    finals = (
        jnp.where(c, fstate, state),
        jnp.where(c, flm, lms),
        jnp.where(c, fscore, score),
        jnp.where(c, fbp, bp),
    )
    rnn_pools = f_rnnrow = None
    if rnn is not None:
        rnn_row, f_rnnrow_c = carry[-4], carry[-3]
        rnn_pools = carry[-2:]
        f_rnnrow = jnp.where(c, f_rnnrow_c, rnn_row)
    return _best_and_records(
        lm, lm_prep, recs, finals, cfg, recs[0].shape[0], nfinal,
        rnn, rnn_pools, f_rnnrow,
    )


@dataclasses.dataclass
class DecodeResult:
    """Best-sentence output (ref: Speech::Recognizer's <recognized> data)."""

    segment_name: str
    lemmas: List  # lemma objects in order (incl. silence entries)
    words: List[str]  # eval-relevant orth sequence
    word_ends: List[int]  # frame index of each lemma's end
    score: float
    record_ids: List[int]  # traceback record chain (for lattices)

    @property
    def orth(self) -> str:
        return " ".join(self.words)


class TreeDecoder:
    """Batched offline decoder (ref seam: Search::SearchAlgorithm —
    restart / feed frames / get best sentence)."""

    def __init__(
        self,
        tree: PrefixTree,
        lm_tables: NgramTables,
        cfg: BeamConfig = BeamConfig(),
        bigram_la=None,  # Optional[lookahead.BigramLookahead]
        rnn_fusion=None,  # Optional[rnn_fusion.RnnFusionTables]
    ):
        self.tree = tree
        self.tables = tree_to_device(tree)
        self.lm = lm_tables
        #: bigram lookahead device tables (search/lookahead.py); None =
        #: unigram-only shaping. Exact either way (potential shaping).
        self.bla = (
            bigram_to_device(bigram_la, tree)
            if bigram_la is not None
            else None
        )
        #: first-pass RNN-LM fusion tables (search/rnn_fusion.py);
        #: None = pure n-gram decoding
        self.rnn = rnn_fusion
        # LM gather tables (incl. the replicated probe-chain) built ONCE
        # per decoder — rebuilding per decode call wastes ~10ms+ each,
        # rebuilding per FRAME collapses throughput (92 -> 3 audio-s/s)
        # NOT jitted: builds the dense unigram table host-side
        self.lm_prep = prepare_lookup(lm_tables)
        # word-end selection cannot exceed the number of candidates
        self.cfg = dataclasses.replace(
            cfg,
            word_end_limit=min(cfg.word_end_limit, cfg.max_hyps * tree.max_word_ends),
        )

    def decode_scores(
        self,
        emissions: np.ndarray,  # [B, T, M] acoustic -log scores (scaled)
        n_frames: np.ndarray,
        names: Optional[Sequence[str]] = None,
        mesh=None,
        beam_axis: Optional[str] = None,
    ) -> List[DecodeResult]:
        best = self.decode_scores_device(
            emissions, n_frames, mesh=mesh, beam_axis=beam_axis
        )
        names = names or [f"utt{i}" for i in range(emissions.shape[0])]
        return self._results_from(best, names)

    def decode_scores_device(
        self,
        emissions,  # [B, T, M] acoustic -log scores; host OR device array
        n_frames,  # [B] frame counts; host OR device array
        mesh=None,
        beam_axis: Optional[str] = None,
    ):
        """Batched decode. With ``mesh``, the utterance batch shards
        over the mesh's ``data`` axis and each device runs the scan on
        its shard via shard_map — embarrassingly-parallel DP decode with
        zero collectives (the in-process form of the reference's
        independent recognition jobs; tree/LM tables are replicated).
        With ``beam_axis`` (e.g. ``"model"``), the K hypothesis slots
        additionally PARTITION over that axis — each device expands its
        K/P slice and one all_gather per frame merges the beams (TP for
        search; composes with the data axis for a 2-D decode mesh).

        Pruning-limit semantics under partitioning: finite limits
        (root_hyps, branch_hyps, expansion_limit) apply PER SLICE
        (min(limit, K/P), expansion_limit/P), so a partitioned decode
        can expand a (super)set of the single-device candidates —
        results are bit-identical to single-device exactly when the
        limits are effectively off (each slice's caps cover every
        candidate it holds, as in the exactness tests); under tight
        limits it is a different, equally principled pruning of the
        same search space.

        This half only DISPATCHES: it returns the packed device result
        array without blocking on the ~70ms device->host tunnel pull, so
        a driver can overlap the next batch's dispatch with this batch's
        on-chip scan; pair with ``results_from_device``. Device-resident
        ``emissions``/``n_frames`` are consumed in place (no host
        round-trip — ``jnp.asarray`` on a committed device array is a
        no-op)."""
        beam_par = int(mesh.shape[beam_axis]) if beam_axis is not None else 1
        K_loc = max(self.cfg.max_hyps // beam_par, 1)
        kbranch = self.cfg.branch_hyps or self.cfg.max_hyps
        args = (
            self.cfg,
            self.tree.max_word_ends,
            min(self.cfg.root_hyps, K_loc),
            min(kbranch, K_loc),
            beam_axis,
            beam_par,
            self.tree.num_final_states,
        )
        if mesh is None:
            assert beam_axis is None, "beam_axis requires a mesh"
            best, records = _decode_scan(
                self.tables,
                self.lm,
                self.lm_prep,
                jnp.asarray(emissions),
                jnp.asarray(n_frames, jnp.int32),
                self.bla,
                self.rnn,
                *args,
            )
        else:
            from jax import shard_map
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep, dp = P(), P("data")
            bla_local = self.bla
            rnn_local = self.rnn  # replicated; pool updates run
            # identically on every device (the pool row rides the beam
            # merge as payload — see _make_step)
            fn = shard_map(
                lambda tb, lmt, lp, e, nf: _decode_scan(
                    tb, lmt, lp, e, nf, bla_local, rnn_local, *args
                ),
                mesh=mesh,
                in_specs=(rep, rep, rep, dp, dp),
                out_specs=(
                    P(None, "data", None),
                    (
                        P(None, "data", None, None),
                        P(None, "data", None, None),
                        P("data", None, None),
                        P("data", None, None),
                    ),
                ),
                check_vma=False,
            )
            emis_s = jax.device_put(
                jnp.asarray(emissions), NamedSharding(mesh, dp)
            )
            nf_s = jax.device_put(
                jnp.asarray(n_frames, jnp.int32), NamedSharding(mesh, dp)
            )
            with mesh:
                best, records = fn(self.tables, self.lm, self.lm_prep, emis_s, nf_s)
        # records stay on device; decoder_lattice pulls them lazily
        self._last_device_records = records
        self._last_n_frames_dev = n_frames
        return best

    def results_from_device(
        self, best, names: Optional[Sequence[str]] = None
    ) -> List[DecodeResult]:
        """Pull a ``decode_scores_device`` result to host and assemble
        DecodeResults (the one blocking device->host transfer)."""
        names = names or [f"utt{i}" for i in range(int(best.shape[1]))]
        return self._results_from(best, names)

    def _results_from(self, best, names: Sequence[str]) -> List[DecodeResult]:
        """Assemble DecodeResults from the packed device walk array."""
        packed = np.asarray(best)  # ONE host transfer: walk + score row
        walk = packed[:-1]  # [MAXW, B, 3] (lemma, time, rec_id)
        best_score = packed[-1, :, 0].view(np.float32)
        results = []
        for b in range(walk.shape[1]):
            lemmas, words, ends, rec_ids = [], [], [], []
            for i in range(walk.shape[0] - 1, -1, -1):  # walk is end-first
                li, t, rid = (int(x) for x in walk[i, b])
                if rid < 0 or li < 0:
                    continue
                lemma = self.tree.lemmas[li]
                lemmas.append(lemma)
                ends.append(t)
                rec_ids.append(rid)
                words.extend(lemma.eval_tokens())
            results.append(
                DecodeResult(
                    segment_name=names[b],
                    lemmas=lemmas,
                    words=words,
                    word_ends=ends,
                    score=float(best_score[b]),
                    record_ids=rec_ids,
                )
            )
        return results

    # -------------------------------------------------- lattice record pull
    @property
    def _last_records(self):
        """Host copies of the last decode's traceback records (lazy)."""
        rec_int, rec_f, _, _ = self._last_device_records
        rec_int = np.asarray(rec_int)
        rec_f = np.asarray(rec_f)
        return (
            rec_int[..., 0], rec_f[..., 0], rec_int[..., 1],
            rec_f[..., 1], rec_int[..., 2], rec_int[..., 3],
        )

    @property
    def _last_finals(self):
        _, _, fin_int, fin_f = self._last_device_records
        fin_int = np.asarray(fin_int)
        fin_f = np.asarray(fin_f)
        return (
            fin_int[..., 0], fin_int[..., 1], fin_f[..., 0],
            fin_int[..., 2], fin_f[..., 1],
        )
