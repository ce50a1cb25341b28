"""Acoustic lattice rescoring (ref: src/Tools/LatticeProcessor/ +
src/Speech/LatticeExtractor — the legacy lattice-processor's core use:
replace each lattice arc's acoustic score by re-aligning the arc's word
over its time span under a (new) acoustic model; the workhorse of
old-style AM rescoring and discriminative-training lattice preparation).

TPU formulation: every arc becomes one row of a single batched banded-
Viterbi call (ops/viterbi.py) — arcs' linear alignment graphs are padded
to a common state count and frame span, so the whole lattice re-scores
in ONE device dispatch instead of a per-arc loop (the same batching the
lattice-based EBW accumulation uses, train/discriminative.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..align.graph import build_linear_graph
from ..corpus.lexicon import Lexicon
from ..models.hmm import HmmTopology, TransitionModel
from ..ops.viterbi import BIG, viterbi_align
from .lattice import Lattice


def rescore_am(
    lattice: Lattice,
    emissions: np.ndarray,  # [T, M] -log acoustic scores (scaled)
    lexicon: Lexicon,
    tying,
    topology: HmmTopology = HmmTopology(),
    transitions: TransitionModel = TransitionModel(),
) -> Lattice:
    """Return a lattice whose word arcs carry re-aligned acoustic scores.

    Per word arc (lemma, [t_from, t_to)): the arc's pronunciation is
    compiled to a linear alignment graph (no optional silence — the
    lattice's own silence arcs carry silence) and Viterbi-aligned over
    ``emissions[t_from:t_to]``; the alignment cost becomes the arc's
    ``am_score``. Arcs whose span cannot realize the word (span shorter
    than the graph's minimum path, or an unknown orthography) get BIG —
    they are impossible under the new model and vanish from best paths.
    Epsilon arcs keep am 0. LM scores are untouched (rescore_lm exists
    for those).
    """
    spans, graphs, arc_ids = [], [], []
    new_arcs = [dataclasses.replace(a) for a in lattice.arcs]
    for ai, arc in enumerate(lattice.arcs):
        if arc.lemma < 0:
            new_arcs[ai].am_score = 0.0
            continue
        orth = lattice.lemma_orths[arc.lemma]
        lo = int(lattice.node_time[arc.from_node])
        hi = int(lattice.node_time[arc.to_node])
        if hi <= lo:
            new_arcs[ai].am_score = BIG
            continue
        try:
            g = build_linear_graph(
                orth, lexicon, tying, topology, transitions,
                optional_silence=False,
            )
        except Exception:
            new_arcs[ai].am_score = BIG
            continue
        spans.append((lo, hi))
        graphs.append(g)
        arc_ids.append(ai)
    if not graphs:
        return Lattice(
            num_nodes=lattice.num_nodes, arcs=new_arcs,
            node_time=lattice.node_time,
            final_scores=dict(lattice.final_scores),
            lemma_orths=list(lattice.lemma_orths),
        )

    N = len(graphs)
    S = max(g.num_states for g in graphs)
    T = max(hi - lo for lo, hi in spans)
    emis = np.zeros((N, T, S), np.float32)
    loop = np.full((N, S), BIG, np.float32)
    fwd = np.full((N, S), BIG, np.float32)
    skip = np.full((N, S), BIG, np.float32)
    init = np.full((N, S), BIG, np.float32)
    final = np.full((N, S), BIG, np.float32)
    n_frames = np.zeros(N, np.int32)
    for i, (g, (lo, hi)) in enumerate(zip(graphs, spans)):
        n = g.num_states
        emis[i, : hi - lo, :n] = emissions[lo:hi][:, g.emission_ids]
        loop[i, :n] = g.loop
        fwd[i, :n] = g.fwd
        skip[i, :n] = g.skip
        init[i, :n] = g.init
        final[i, :n] = g.final
        n_frames[i] = hi - lo
    cost, _ = viterbi_align(
        jnp.asarray(emis), jnp.asarray(loop), jnp.asarray(fwd),
        jnp.asarray(skip), jnp.asarray(init), jnp.asarray(final),
        jnp.asarray(n_frames),
    )
    cost = np.asarray(cost)
    for i, ai in enumerate(arc_ids):
        c = float(cost[i])
        new_arcs[ai].am_score = c if c < BIG / 2 else BIG
    return Lattice(
        num_nodes=lattice.num_nodes, arcs=new_arcs,
        node_time=lattice.node_time,
        final_scores=dict(lattice.final_scores),
        lemma_orths=list(lattice.lemma_orths),
    )
