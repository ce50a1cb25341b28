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
  expand CSR out-arcs (padded gather) + self-loops → add emission scores
  (gathered from the dense ``[B,T,M]`` score matrix) → acoustic beam →
  exact recombination by sort on (tree_state, lm_state, score) keeping
  group minima → histogram pruning via top-K → word-end processing:
  pre-LM top-R selection, hash-table LM lookup, traceback record
  emission, root re-entry hyps merged back into the beam;
* tracebacks are fixed-shape per-frame record buffers (word, score,
  predecessor record), assembled on the host after the scan — replacing
  the reference's ref-counted Trace garbage collection.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.lm.ngram_tpu import NgramTables, lookup
from ..ops.viterbi import BIG
from .tree import WORD_NONE, WORD_SILENCE, PrefixTree


@dataclasses.dataclass(frozen=True)
class TreeTables:
    """Device pytree of the compiled prefix tree (+1 sentinel state).

    Root out-arcs (word re-entry fan-out, O(#first-phone variants)) are
    split from the per-state CSR: only a few LM-state-conditioned hyps
    sit at the root, so they expand densely over all root arcs, while the
    per-hypothesis CSR budget stays at the small non-root max degree.
    """

    emission_class: jnp.ndarray  # [S+1]
    loop_cost: jnp.ndarray  # [S+1]
    arc_ptr: jnp.ndarray  # [S+2] (root's range emptied)
    arc_dst: jnp.ndarray  # [A]
    arc_cost: jnp.ndarray  # [A]
    root_dst: jnp.ndarray  # [DegRoot]
    root_cost: jnp.ndarray  # [DegRoot]
    we_word: jnp.ndarray  # [S+1, W]
    we_cost: jnp.ndarray  # [S+1, W]
    we_lemma: jnp.ndarray  # [S+1, W]
    num_states: int
    max_out_degree: int  # over non-root states
    root_degree: int

    @property
    def sentinel(self) -> int:
        return self.num_states


jax.tree_util.register_pytree_node(
    TreeTables,
    lambda t: (
        (t.emission_class, t.loop_cost, t.arc_ptr, t.arc_dst, t.arc_cost,
         t.root_dst, t.root_cost, t.we_word, t.we_cost, t.we_lemma),
        (t.num_states, t.max_out_degree, t.root_degree),
    ),
    lambda aux, ch: TreeTables(*ch, *aux),
)


def tree_to_device(tree: PrefixTree) -> TreeTables:
    S = tree.num_states
    root_lo, root_hi = int(tree.arc_ptr[0]), int(tree.arc_ptr[1])
    root_dst = tree.arc_dst[root_lo:root_hi]
    root_cost = tree.arc_cost[root_lo:root_hi]
    # strip root arcs out of the CSR
    arc_dst = tree.arc_dst[root_hi:]
    arc_cost = tree.arc_cost[root_hi:]
    arc_ptr = tree.arc_ptr.copy().astype(np.int32)
    arc_ptr[1:] -= root_hi
    arc_ptr[0] = 0
    arc_ptr[1] = 0
    deg = arc_ptr[2:] - arc_ptr[1:-1]
    dmax = int(deg.max()) if deg.size else 1
    if arc_dst.size == 0:
        arc_dst = np.zeros(1, np.int32)
        arc_cost = np.full(1, BIG, np.float32)
    return TreeTables(
        emission_class=jnp.asarray(np.concatenate([tree.emission_class, [0]])),
        loop_cost=jnp.asarray(np.concatenate([tree.loop_cost, [BIG]]).astype(np.float32)),
        arc_ptr=jnp.asarray(np.concatenate([arc_ptr, arc_ptr[-1:]])),
        arc_dst=jnp.asarray(arc_dst),
        arc_cost=jnp.asarray(arc_cost.astype(np.float32)),
        root_dst=jnp.asarray(root_dst),
        root_cost=jnp.asarray(root_cost.astype(np.float32)),
        we_word=jnp.asarray(np.concatenate([tree.we_word, np.full((1, tree.max_word_ends), WORD_NONE, np.int32)])),
        we_cost=jnp.asarray(np.concatenate([tree.we_cost, np.full((1, tree.max_word_ends), BIG, np.float32)])),
        we_lemma=jnp.asarray(np.concatenate([tree.we_lemma, np.full((1, tree.max_word_ends), -1, np.int32)])),
        num_states=S,
        max_out_degree=max(dmax, 1),
        root_degree=max(int(root_dst.shape[0]), 1),
    )


@dataclasses.dataclass(frozen=True)
class BeamConfig:
    """Pruning parameters (ref: the *-pruning / *-pruning-limit params of
    the tree searches: acoustic beam, histogram limit, word-end limit)."""

    max_hyps: int = 1024  # histogram pruning cap (K)
    beam: float = 1e9  # acoustic beam width
    word_end_limit: int = 128  # R: word-end survivors / records per frame
    root_hyps: int = 32  # H: root (re-entry) hyps expanded per frame
    expansion_limit: int = 4096  # E: candidates surviving into recombination
    lm_scale: float = 1.0


@partial(jax.jit, static_argnames=("cfg", "dmax", "wmax", "hroot"))
def _decode_scan(
    tree: TreeTables,
    lm: NgramTables,
    emissions: jnp.ndarray,  # [B, T, M]
    n_frames: jnp.ndarray,  # [B]
    cfg: BeamConfig,
    dmax: int,
    wmax: int,
    hroot: int,
):
    B, T, M = emissions.shape
    K = cfg.max_hyps
    R = cfg.word_end_limit
    SENT = tree.sentinel

    state0 = jnp.full((B, K), 0, jnp.int32)
    lm0 = jnp.full((B, K), lm.start_state, jnp.int32)
    score0 = jnp.full((B, K), BIG, jnp.float32).at[:, 0].set(0.0)
    bp0 = jnp.full((B, K), -1, jnp.int32)

    def step(carry, inputs):
        state, lms, score, bp, fstate, flm, fscore, fbp = carry
        emis_t, t = inputs
        active = (t < n_frames)[:, None]

        # ------------------------------------------------- expansion
        # non-root hyps: CSR out-arcs, budget = non-root max degree
        deg = tree.arc_ptr[state + 1] - tree.arc_ptr[state]  # [B,K]
        d = jnp.arange(dmax, dtype=jnp.int32)
        arc_idx = tree.arc_ptr[state][..., None] + d  # [B,K,D]
        ok = d < deg[..., None]
        arc_idx = jnp.where(ok, arc_idx, 0)
        dstA = jnp.where(ok, tree.arc_dst[arc_idx], SENT)
        costA = jnp.where(ok, tree.arc_cost[arc_idx], BIG)

        # root hyps (word re-entries): top-H by score, dense fan-out over
        # all root arcs (tree copies conditioned on LM history)
        G = tree.root_degree
        root_score = jnp.where(state == 0, score, BIG)
        negH, hidx = jax.lax.top_k(-root_score, hroot)
        h_score = -negH  # [B,H]
        h_lm = jnp.take_along_axis(lms, hidx, axis=1)
        h_bp = jnp.take_along_axis(bp, hidx, axis=1)
        dead_h = h_score >= BIG / 2
        dstR = jnp.where(
            dead_h[..., None], SENT, jnp.broadcast_to(tree.root_dst, (B, hroot, G))
        )
        scoreR = h_score[..., None] + tree.root_cost  # [B,H,G]

        cand_state = jnp.concatenate(
            [state, dstA.reshape(B, K * dmax), dstR.reshape(B, hroot * G)], axis=1
        )
        cand_score = jnp.concatenate(
            [score + tree.loop_cost[state],
             (score[..., None] + costA).reshape(B, K * dmax),
             scoreR.reshape(B, hroot * G)],
            axis=1,
        )
        cand_lm = jnp.concatenate(
            [lms, jnp.repeat(lms, dmax, axis=1), jnp.repeat(h_lm, G, axis=1)], axis=1
        )
        cand_bp = jnp.concatenate(
            [bp, jnp.repeat(bp, dmax, axis=1), jnp.repeat(h_bp, G, axis=1)], axis=1
        )

        # ------------------------------------------------- emission
        e = jnp.take_along_axis(
            emis_t, tree.emission_class[cand_state], axis=1
        )
        cand_score = jnp.minimum(cand_score, BIG) + jnp.where(
            cand_state == SENT, 0.0, e
        )

        # ------------------------------------------------- beam prune
        best = jnp.min(cand_score, axis=1, keepdims=True)
        cand_score = jnp.where(cand_score > best + cfg.beam, BIG, cand_score)

        # ------------------------- expansion pre-prune (approx top-E)
        # The recombination sort is the per-frame cost driver; cut the
        # candidate set to E best first. approx_max_k rides the TPU's
        # fast approximate top-k unit; an approximate cut is fine — this
        # is pruning, recombination afterwards stays exact.
        if cand_score.shape[1] > cfg.expansion_limit:
            neg_e, eidx = jax.lax.approx_max_k(-cand_score, cfg.expansion_limit)
            cand_score = -neg_e
            cand_state = jnp.take_along_axis(cand_state, eidx, axis=1)
            cand_lm = jnp.take_along_axis(cand_lm, eidx, axis=1)
            cand_bp = jnp.take_along_axis(cand_bp, eidx, axis=1)

        # ------------------------------------- recombination (sort+dedup)
        s_state, s_lm, s_score, s_bp = jax.lax.sort(
            (cand_state, cand_lm, cand_score, cand_bp), dimension=1, num_keys=3
        )
        first = jnp.concatenate(
            [
                jnp.ones((B, 1), bool),
                (s_state[:, 1:] != s_state[:, :-1])
                | (s_lm[:, 1:] != s_lm[:, :-1]),
            ],
            axis=1,
        )
        s_score = jnp.where(first, s_score, BIG)

        # ------------------------------------------------- histogram top-K
        neg, idx = jax.lax.top_k(-s_score, K)
        n_state = jnp.take_along_axis(s_state, idx, axis=1)
        n_lm = jnp.take_along_axis(s_lm, idx, axis=1)
        n_score = -neg
        n_bp = jnp.take_along_axis(s_bp, idx, axis=1)
        n_state = jnp.where(n_score >= BIG / 2, SENT, n_state)

        # ------------------------------------------------- word ends
        ww = tree.we_word[n_state]  # [B,K,W]
        wc = tree.we_cost[n_state]
        wl = tree.we_lemma[n_state]
        pre = jnp.where(ww != WORD_NONE, n_score[..., None] + wc, BIG).reshape(B, K * wmax)
        neg_r, ridx = jax.lax.top_k(-pre, R)
        r_pre = -neg_r  # [B,R]
        r_word = jnp.take_along_axis(ww.reshape(B, K * wmax), ridx, axis=1)
        r_lemma = jnp.take_along_axis(wl.reshape(B, K * wmax), ridx, axis=1)
        src = ridx // wmax
        r_srclm = jnp.take_along_axis(n_lm, src, axis=1)
        r_srcbp = jnp.take_along_axis(n_bp, src, axis=1)

        is_lm_word = r_word >= 0
        lm_cost, lm_next = lookup(
            lm, r_srclm.reshape(-1), jnp.maximum(r_word, 0).reshape(-1)
        )
        lm_cost = lm_cost.reshape(B, R)
        lm_next = lm_next.reshape(B, R)
        r_lmcost = jnp.where(is_lm_word, cfg.lm_scale * lm_cost, 0.0)
        r_newlm = jnp.where(is_lm_word, lm_next, r_srclm)
        r_score = jnp.where(r_pre < BIG / 2, r_pre + r_lmcost, BIG)
        r_valid = (r_score < BIG / 2) & active

        rec_id = jnp.broadcast_to(
            t * R + jnp.arange(R, dtype=jnp.int32)[None, :], (B, R)
        )
        root_state = jnp.where(r_valid, 0, SENT)
        root_score = jnp.where(r_valid, r_score, BIG)
        root_bp = rec_id

        # ------------------------------------------- merge root re-entries
        m_state = jnp.concatenate([n_state, root_state], axis=1)
        m_lm = jnp.concatenate([n_lm, r_newlm], axis=1)
        m_score = jnp.concatenate([n_score, root_score], axis=1)
        m_bp = jnp.concatenate([n_bp, root_bp], axis=1)
        neg2, idx2 = jax.lax.top_k(-m_score, K)
        f2_state = jnp.take_along_axis(m_state, idx2, axis=1)
        f2_lm = jnp.take_along_axis(m_lm, idx2, axis=1)
        f2_score = -neg2
        f2_bp = jnp.take_along_axis(m_bp, idx2, axis=1)
        f2_state = jnp.where(f2_score >= BIG / 2, SENT, f2_state)

        # ----------------------------------------------- freeze inactive
        state = jnp.where(active, f2_state, state)
        lms = jnp.where(active, f2_lm, lms)
        score = jnp.where(active, f2_score, score)
        bp = jnp.where(active, f2_bp, bp)

        is_last = (t == n_frames - 1)[:, None]
        fstate = jnp.where(is_last, state, fstate)
        flm = jnp.where(is_last, lms, flm)
        fscore = jnp.where(is_last, score, fscore)
        fbp = jnp.where(is_last, bp, fbp)

        recs = (
            jnp.where(r_valid, r_lemma, -1),
            jnp.where(r_valid, r_score, BIG),
            jnp.where(r_valid, r_srcbp, -1),
            r_lmcost,
            jnp.where(r_valid, r_word, WORD_NONE),
            jnp.where(r_valid, r_newlm, -1),
        )
        return (state, lms, score, bp, fstate, flm, fscore, fbp), recs

    ts = jnp.arange(T, dtype=jnp.int32)
    carry0 = (state0, lm0, score0, bp0, state0, lm0, score0, bp0)
    carry, recs = jax.lax.scan(
        step, carry0, (jnp.swapaxes(emissions, 0, 1), ts)
    )
    _, _, _, _, fstate, flm, fscore, fbp = carry

    # sentence-end LM scores for final root hyps
    end_cost, _ = lookup(
        lm,
        flm.reshape(-1),
        jnp.full((B * fstate.shape[1],), max(lm.end_word, 0), jnp.int32),
    )
    end_cost = jnp.where(lm.end_word >= 0, cfg.lm_scale * end_cost.reshape(fstate.shape), 0.0)
    final_total = jnp.where(fstate == 0, fscore + end_cost, BIG)
    best_idx = jnp.argmin(final_total, axis=1)
    best_score = jnp.take_along_axis(final_total, best_idx[:, None], axis=1)[:, 0]
    best_bp = jnp.take_along_axis(fbp, best_idx[:, None], axis=1)[:, 0]
    return best_score, best_bp, recs, (fstate, flm, fscore, fbp, end_cost)


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
    ):
        self.tree = tree
        self.tables = tree_to_device(tree)
        self.lm = lm_tables
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
    ) -> List[DecodeResult]:
        B = emissions.shape[0]
        names = names or [f"utt{i}" for i in range(B)]
        best_score, best_bp, recs, finals = _decode_scan(
            self.tables,
            self.lm,
            jnp.asarray(emissions),
            jnp.asarray(n_frames, jnp.int32),
            self.cfg,
            self.tables.max_out_degree,
            self.tree.max_word_ends,
            min(self.cfg.root_hyps, self.cfg.max_hyps),
        )
        rec_lemma, rec_score, rec_prev, rec_lmcost, rec_word, rec_lm = (
            np.asarray(r) for r in recs
        )  # [T, B, R]
        best_score = np.array(best_score)
        best_bp = np.array(best_bp)
        fstate, flm, fscore, fbp, fend = (np.asarray(x) for x in finals)
        R = self.cfg.word_end_limit

        results = []
        for b in range(B):
            if best_score[b] >= BIG / 2:
                # no hypothesis ended at a word boundary: fall back to the
                # best incomplete hypothesis (words up to its last boundary)
                k = int(np.argmin(fscore[b]))
                best_score[b] = fscore[b, k]
                best_bp[b] = fbp[b, k]
            chain = []
            bp = int(best_bp[b])
            while bp >= 0:
                t, r = bp // R, bp % R
                chain.append((t, r))
                bp = int(rec_prev[t, b, r])
            chain.reverse()
            lemmas, words, ends, rec_ids = [], [], [], []
            for t, r in chain:
                li = int(rec_lemma[t, b, r])
                if li < 0:
                    continue
                lemma = self.tree.lemmas[li]
                lemmas.append(lemma)
                ends.append(t)
                rec_ids.append(t * R + r)
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
        self._last_records = (
            rec_lemma, rec_score, rec_prev, rec_lmcost, rec_word, rec_lm,
        )
        self._last_finals = (fstate, flm, fscore, fbp, fend)
        self._last_n_frames = np.asarray(n_frames)
        return results
