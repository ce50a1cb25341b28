"""Lattice processing: best/n-best, posteriors, pruning, rescoring, CN.

Re-implements the core of the reference's FLF lattice toolkit
(ref: src/Flf/ — Best.cc, Prune.cc, FwdBwd.cc, Rescore.cc, Compose.cc,
ConfusionNetwork*.cc, NBest [K]): config-driven networks of lattice
processors there; direct functions over :class:`Lattice` here (the
pipeline drivers compose them). Scores are -log costs with separate
am/lm dimensions and per-call scales, matching the reference's multi-
dimensional semiring with per-dim scales.

All algorithms are host-side numpy/python: lattices are small (hundreds
of arcs); the TPU is for the frame-synchronous stages.
"""

from __future__ import annotations

import dataclasses
import heapq
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .lattice import BIG, Lattice, LatticeArc


def _arc_score(a: LatticeArc, am_scale: float, lm_scale: float) -> float:
    return am_scale * a.am_score + lm_scale * a.lm_score


# ------------------------------------------------------------------ best path
def best_path(
    lat: Lattice, am_scale: float = 1.0, lm_scale: float = 1.0
) -> Tuple[float, List[LatticeArc]]:
    """Min-cost path (ref: Flf::Best, SSSP over the tropical semiring)."""
    order = lat.topological_order()
    dist = np.full(lat.num_nodes, BIG)
    back: List[Optional[int]] = [None] * lat.num_nodes
    dist[0] = 0.0
    out = lat.out_arcs()
    for n in order:
        if dist[n] >= BIG / 2:
            continue
        for ai in out[n]:
            a = lat.arcs[ai]
            nd = dist[n] + _arc_score(a, am_scale, lm_scale)
            if nd < dist[a.to_node]:
                dist[a.to_node] = nd
                back[a.to_node] = ai
    best = (BIG, None)
    for node, final in lat.final_scores.items():
        total = dist[node] + final
        if total < best[0]:
            best = (total, node)
    if best[1] is None:
        return BIG, []
    path = []
    node = best[1]
    while back[node] is not None:
        a = lat.arcs[back[node]]
        path.append(a)
        node = a.from_node
    path.reverse()
    return float(best[0]), path


def n_best(
    lat: Lattice, n: int, am_scale: float = 1.0, lm_scale: float = 1.0
) -> List[Tuple[float, List[LatticeArc]]]:
    """N shortest distinct paths (ref: Flf n-best extraction)."""
    out = lat.out_arcs()
    results: List[Tuple[float, List[LatticeArc]]] = []
    seen: set = set()
    # uniform-cost search over (cost, node, path)
    counter = 0
    heap = [(0.0, counter, 0, [])]
    while heap and len(results) < n:
        cost, _, node, path = heapq.heappop(heap)
        if node in lat.final_scores:
            total = cost + lat.final_scores[node]
            key = tuple(a.lemma for a in path)
            if key not in seen:
                seen.add(key)
                results.append((total, path))
        for ai in out[node]:
            a = lat.arcs[ai]
            counter += 1
            heapq.heappush(
                heap,
                (cost + _arc_score(a, am_scale, lm_scale), counter, a.to_node, path + [a]),
            )
    return results


# ----------------------------------------------------------- forward-backward
def forward_backward(
    lat: Lattice, am_scale: float = 1.0, lm_scale: float = 1.0
) -> Tuple[float, np.ndarray]:
    """Arc posteriors (ref: Flf::FwdBwd).

    Returns (total -log mass, arc posterior p in [0,1] per arc)."""
    order = lat.topological_order()
    out = lat.out_arcs()
    inn = lat.in_arcs()

    def nlse(a, b):
        m = min(a, b)
        if m >= BIG / 2:
            return BIG
        return m - math.log1p(math.exp(-(max(a, b) - m)))

    alpha = np.full(lat.num_nodes, BIG)
    alpha[0] = 0.0
    for node in order:
        if alpha[node] >= BIG / 2:
            continue
        for ai in out[node]:
            a = lat.arcs[ai]
            alpha[a.to_node] = nlse(
                alpha[a.to_node], alpha[node] + _arc_score(a, am_scale, lm_scale)
            )
    beta = np.full(lat.num_nodes, BIG)
    for node, final in lat.final_scores.items():
        beta[node] = final
    for node in reversed(order):
        for ai in out[node]:
            a = lat.arcs[ai]
            if beta[a.to_node] < BIG / 2:
                beta[node] = nlse(
                    beta[node], _arc_score(a, am_scale, lm_scale) + beta[a.to_node]
                )
    total = BIG
    for node, final in lat.final_scores.items():
        total = nlse(total, alpha[node] + final)
    post = np.zeros(len(lat.arcs))
    for ai, a in enumerate(lat.arcs):
        c = alpha[a.from_node] + _arc_score(a, am_scale, lm_scale) + beta[a.to_node]
        post[ai] = math.exp(-(c - total)) if c < BIG / 2 else 0.0
    return float(total), post


def posterior_prune(
    lat: Lattice, threshold: float, am_scale: float = 1.0, lm_scale: float = 1.0
) -> Lattice:
    """Drop arcs with posterior < exp(-threshold) (ref: Flf::Prune fwd/bwd
    pruning). Keeps at least the best path."""
    total, post = forward_backward(lat, am_scale, lm_scale)
    _, best = best_path(lat, am_scale, lm_scale)
    keep_arcs = set(id(a) for a in best)
    arcs = [
        a
        for ai, a in enumerate(lat.arcs)
        if post[ai] >= math.exp(-threshold) or id(a) in keep_arcs
    ]
    return _trim(
        Lattice(
            lat.num_nodes, arcs, lat.node_time.copy(), dict(lat.final_scores),
            list(lat.lemma_orths),
        )
    )


def _trim(lat: Lattice) -> Lattice:
    """Remove unreachable/non-coaccessible nodes, renumber."""
    out = lat.out_arcs()
    reach = np.zeros(lat.num_nodes, bool)
    stack = [0]
    while stack:
        n = stack.pop()
        if reach[n]:
            continue
        reach[n] = True
        for ai in out[n]:
            stack.append(lat.arcs[ai].to_node)
    co = np.zeros(lat.num_nodes, bool)
    inn = lat.in_arcs()
    stack = [n for n in lat.final_scores if reach[n]]
    for n in stack:
        co[n] = True
    while stack:
        n = stack.pop()
        for ai in inn[n]:
            f = lat.arcs[ai].from_node
            if not co[f] and reach[f]:
                co[f] = True
                stack.append(f)
    keep = reach & co
    keep[0] = True
    remap = -np.ones(lat.num_nodes, np.int64)
    remap[keep] = np.arange(keep.sum())
    arcs = [
        LatticeArc(int(remap[a.from_node]), int(remap[a.to_node]), a.lemma, a.am_score, a.lm_score)
        for a in lat.arcs
        if keep[a.from_node] and keep[a.to_node]
    ]
    return Lattice(
        int(keep.sum()),
        arcs,
        lat.node_time[keep],
        {int(remap[n]): s for n, s in lat.final_scores.items() if keep[n]},
        list(lat.lemma_orths),
    )


# --------------------------------------------------------------- LM rescoring
def rescore_lm(
    lat: Lattice,
    lm,
    lemma_synt: Dict[int, Optional[int]],
    keep_old: bool = False,
) -> Lattice:
    """Replace the lm score dimension with a (different) LM
    (ref: Flf compose-with-LM / rescore — the lattice expands so every
    path carries exact LM context: nodes become (node, lm history)).

    lemma_synt: lattice lemma index -> LM word id (None = no-LM word).
    """
    out = lat.out_arcs()
    # expanded nodes: (lattice node, history) -> new id
    node_map: Dict[Tuple[int, Tuple[int, ...]], int] = {}
    new_time: List[int] = []
    new_final: Dict[int, float] = {}
    arcs: List[LatticeArc] = []

    def get_node(n: int, h: Tuple[int, ...]) -> int:
        key = (n, h)
        if key not in node_map:
            node_map[key] = len(new_time)
            new_time.append(int(lat.node_time[n]))
        return node_map[key]

    start = get_node(0, lm.start_history())
    stack = [(0, lm.start_history())]
    seen = {(0, lm.start_history())}
    while stack:
        n, h = stack.pop()
        src = get_node(n, h)
        if n in lat.final_scores:
            end = lm.sentence_end_score(h)
            if keep_old:
                end += lat.final_scores[n]
            new_final[src] = min(new_final.get(src, BIG), end)
        for ai in out[n]:
            a = lat.arcs[ai]
            wid = lemma_synt.get(a.lemma)
            if wid is None:
                nh = h
                lm_score = 0.0
            else:
                lm_score = lm.score(h, wid)
                nh = lm.extended_history(h, wid)
            dst = get_node(a.to_node, nh)
            old = a.lm_score if keep_old else 0.0
            arcs.append(LatticeArc(src, dst, a.lemma, a.am_score, old + lm_score))
            if (a.to_node, nh) not in seen:
                seen.add((a.to_node, nh))
                stack.append((a.to_node, nh))
    return Lattice(len(new_time), arcs, np.asarray(new_time, np.int32), new_final, list(lat.lemma_orths))


# --------------------------------------------------------- confusion networks
@dataclasses.dataclass
class ConfusionSlot:
    start: int
    end: int
    hypotheses: List[Tuple[str, float]]  # (orth or "", posterior), sorted desc

    @property
    def best(self) -> Tuple[str, float]:
        return self.hypotheses[0]


def confusion_network(
    lat: Lattice, am_scale: float = 1.0, lm_scale: float = 1.0
) -> List[ConfusionSlot]:
    """Pivot-style CN construction (ref: Flf::ConfusionNetwork* — arc
    clustering along the best path by time overlap)."""
    total, post = forward_backward(lat, am_scale, lm_scale)
    _, pivot = best_path(lat, am_scale, lm_scale)
    if not pivot:
        return []
    slots: List[Dict[str, float]] = [dict() for _ in pivot]
    spans = [
        (int(lat.node_time[a.from_node]), int(lat.node_time[a.to_node]))
        for a in pivot
    ]

    def overlap(s1, e1, s2, e2):
        inter = max(0, min(e1, e2) - max(s1, s2))
        denom = max(1, min(e1 - s1, e2 - s2))
        return inter / denom

    for ai, a in enumerate(lat.arcs):
        if post[ai] <= 0.0:
            continue
        s, e = int(lat.node_time[a.from_node]), int(lat.node_time[a.to_node])
        # best-overlapping pivot slot
        best_k, best_ov = 0, -1.0
        for k, (ps, pe) in enumerate(spans):
            ov = overlap(s, e, ps, pe)
            if ov > best_ov:
                best_k, best_ov = k, ov
        orth = lat.lemma_orths[a.lemma] if a.lemma >= 0 else ""
        slots[best_k][orth] = slots[best_k].get(orth, 0.0) + post[ai]

    out = []
    for k, d in enumerate(slots):
        mass = sum(d.values())
        if mass < 1.0:
            d[""] = d.get("", 0.0) + (1.0 - mass)  # epsilon/deletion mass
        hyps = sorted(d.items(), key=lambda kv: -kv[1])
        out.append(ConfusionSlot(spans[k][0], spans[k][1], hyps))
    return out


def cn_decode(slots: Sequence[ConfusionSlot]) -> List[str]:
    """MAP decoding over the CN (ref: Flf CN/MAP decoding)."""
    words = []
    for slot in slots:
        w, p = slot.best
        if w:
            words.append(w)
    return words


# ------------------------------------------------------- time-frame CN


def time_frame_cn(
    lat: Lattice, am_scale: float = 1.0, lm_scale: float = 1.0
) -> List[Dict[str, float]]:
    """Time-frame confusion network (ref: Flf time-frame CN — per-FRAME
    word posterior distributions; the basis of min-fWER decoding and
    frame-level confidence).

    Returns one dict {orth: posterior} per frame; "" collects epsilon
    (silence/no-word) mass. Each arc spreads its posterior uniformly
    over the frames it covers.
    """
    _, post = forward_backward(lat, am_scale, lm_scale)
    T = int(lat.node_time.max()) if lat.num_nodes else 0
    frames: List[Dict[str, float]] = [dict() for _ in range(T)]
    for ai, a in enumerate(lat.arcs):
        if post[ai] <= 0.0:
            continue
        s, e = int(lat.node_time[a.from_node]), int(lat.node_time[a.to_node])
        orth = lat.lemma_orths[a.lemma] if a.lemma >= 0 else ""
        for t in range(max(s, 0), min(e, T)):
            frames[t][orth] = frames[t].get(orth, 0.0) + post[ai]
    for d in frames:
        mass = sum(d.values())
        if mass < 1.0:
            d[""] = d.get("", 0.0) + (1.0 - mass)
    return frames


def word_confidence(
    lat: Lattice,
    am_scale: float = 1.0,
    lm_scale: float = 1.0,
) -> List[Tuple[str, float]]:
    """Frame-CN confidence for the best path's words (ref: the
    fCN-confidence used by the reference's CN tooling): each best-path
    word's confidence = mean over its frames of that word's frame
    posterior."""
    frames = time_frame_cn(lat, am_scale, lm_scale)
    _, best = best_path(lat, am_scale, lm_scale)
    out: List[Tuple[str, float]] = []
    for a in best:
        if a.lemma < 0:
            continue
        orth = lat.lemma_orths[a.lemma]
        s, e = int(lat.node_time[a.from_node]), int(lat.node_time[a.to_node])
        span = [frames[t].get(orth, 0.0) for t in range(max(s, 0), min(e, len(frames)))]
        conf = float(np.mean(span)) if span else 0.0
        out.append((orth, conf))
    return out


# --------------------------------------------------- structural lattice ops
def scale_scores(lat: Lattice, am_scale: float, lm_scale: float) -> Lattice:
    """Semiring rescale (ref: Flf semiring rescale nodes): bake the
    per-dimension scales into the score dims so downstream consumers can
    run with unit scales. Final scores are already in the total
    dimension (the decoder emits them pre-scaled — see
    search/decoder._best_and_records) and pass through unchanged."""
    arcs = [
        LatticeArc(a.from_node, a.to_node, a.lemma,
                   am_scale * a.am_score, lm_scale * a.lm_score)
        for a in lat.arcs
    ]
    return Lattice(lat.num_nodes, arcs, lat.node_time.copy(),
                   dict(lat.final_scores), list(lat.lemma_orths))


def map_lemmas(lat: Lattice, orth_map: Dict[str, str]) -> Lattice:
    """Alphabet mapping (ref: Flf map-alphabet nodes): rewrite arc
    labels through an orthography map; unmapped orths pass through.
    Lemmas merging onto the same orth share one output label."""
    new_orths: List[str] = []
    index: Dict[str, int] = {}
    remap: List[int] = []
    for orth in lat.lemma_orths:
        target = orth_map.get(orth, orth)
        if target not in index:
            index[target] = len(new_orths)
            new_orths.append(target)
        remap.append(index[target])
    arcs = [
        LatticeArc(a.from_node, a.to_node,
                   remap[a.lemma] if a.lemma >= 0 else -1,
                   a.am_score, a.lm_score)
        for a in lat.arcs
    ]
    return Lattice(lat.num_nodes, arcs, lat.node_time.copy(),
                   dict(lat.final_scores), new_orths)


def union(lats: Sequence[Lattice]) -> Lattice:
    """Lattice union (ref: Flf union node — e.g. system combination
    before CN decoding): a fresh initial node epsilon-branches into each
    input's initial node; alphabets merge by orthography."""
    assert lats, "union of nothing"
    new_orths: List[str] = []
    index: Dict[str, int] = {}
    arcs: List[LatticeArc] = []
    finals: Dict[int, float] = {}
    times: List[int] = [0]
    offset = 1
    for lat in lats:
        remap = []
        for orth in lat.lemma_orths:
            if orth not in index:
                index[orth] = len(new_orths)
                new_orths.append(orth)
            remap.append(index[orth])
        times.extend(int(t) for t in lat.node_time)
        arcs.append(LatticeArc(0, offset, -1, 0.0, 0.0))  # eps entry
        for a in lat.arcs:
            arcs.append(
                LatticeArc(offset + a.from_node, offset + a.to_node,
                           remap[a.lemma] if a.lemma >= 0 else -1,
                           a.am_score, a.lm_score)
            )
        for n, s in lat.final_scores.items():
            node = offset + n
            finals[node] = min(finals.get(node, BIG), float(s))
        offset += lat.num_nodes
    return Lattice(offset, arcs, np.asarray(times, np.int32), finals, new_orths)


def intersect(a: Lattice, b: Lattice) -> Lattice:
    """Lattice intersection (ref: Flf intersect node): keep exactly the
    word sequences present in BOTH lattices, with per-dimension scores
    added — the lattice-level counterpart of acceptor composition
    (fsa/algorithms.compose). Words match by orthography, so the inputs
    may use different lemma alphabets (e.g. lattices from two systems).

    Epsilon arcs (lemma < 0) advance one side at a time through the
    standard three-state epsilon-sequencing filter (Mohri's composition
    filter), so no path is generated twice. Node times come from ``a``
    (``b``'s boundaries may disagree; ``a`` is the primary system).
    """
    orth_to_b: Dict[str, List[int]] = {}
    for i, orth in enumerate(b.lemma_orths):
        orth_to_b.setdefault(orth, []).append(i)
    out_a, out_b = a.out_arcs(), b.out_arcs()

    # product states (node_a, node_b, filter); filter: 0 = free,
    # 1 = only eps-on-a may continue, 2 = only eps-on-b may continue.
    node_map: Dict[Tuple[int, int, int], int] = {}
    times: List[int] = []

    def get_node(na: int, nb: int, f: int) -> int:
        key = (na, nb, f)
        if key not in node_map:
            node_map[key] = len(times)
            times.append(int(a.node_time[na]))
        return node_map[key]

    start = get_node(0, 0, 0)
    arcs: List[LatticeArc] = []
    finals: Dict[int, float] = {}
    stack = [(0, 0, 0)]
    seen = {(0, 0, 0)}

    def push(key: Tuple[int, int, int]) -> int:
        if key not in seen:
            seen.add(key)
            stack.append(key)
        return get_node(*key)

    while stack:
        na, nb, f = stack.pop()
        src = get_node(na, nb, f)
        if na in a.final_scores and nb in b.final_scores:
            sc = a.final_scores[na] + b.final_scores[nb]
            finals[src] = min(finals.get(src, BIG), sc)
        for ai in out_a[na]:
            arc_a = a.arcs[ai]
            if arc_a.lemma < 0:
                if f in (0, 1):  # eps on a
                    dst = push((arc_a.to_node, nb, 1))
                    arcs.append(LatticeArc(src, dst, -1,
                                           arc_a.am_score, arc_a.lm_score))
                continue
            matches = orth_to_b.get(a.lemma_orths[arc_a.lemma])
            if not matches:
                continue
            for bi in out_b[nb]:
                arc_b = b.arcs[bi]
                if arc_b.lemma in matches:
                    dst = push((arc_a.to_node, arc_b.to_node, 0))
                    arcs.append(LatticeArc(
                        src, dst, arc_a.lemma,
                        arc_a.am_score + arc_b.am_score,
                        arc_a.lm_score + arc_b.lm_score,
                    ))
        if f in (0, 2):  # eps on b
            for bi in out_b[nb]:
                arc_b = b.arcs[bi]
                if arc_b.lemma < 0:
                    dst = push((na, arc_b.to_node, 2))
                    arcs.append(LatticeArc(src, dst, -1,
                                           arc_b.am_score, arc_b.lm_score))
        if f == 0:  # simultaneous eps advance (filter state 0 only)
            for ai in out_a[na]:
                arc_a = a.arcs[ai]
                if arc_a.lemma >= 0:
                    continue
                for bi in out_b[nb]:
                    arc_b = b.arcs[bi]
                    if arc_b.lemma < 0:
                        dst = push((arc_a.to_node, arc_b.to_node, 0))
                        arcs.append(LatticeArc(
                            src, dst, -1,
                            arc_a.am_score + arc_b.am_score,
                            arc_a.lm_score + arc_b.lm_score,
                        ))
    return _trim(Lattice(len(times), arcs, np.asarray(times, np.int32),
                         finals, list(a.lemma_orths)))
