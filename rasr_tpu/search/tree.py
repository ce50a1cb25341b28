"""Lexical prefix tree compiled to dense decode arrays.

Re-implements the reference's search network construction
(ref: src/Search/StateTree.*, src/Search/TreeBuilder.* — the lexical
prefix tree of allophone-state HMMs the word-conditioned and advanced
tree searches decode over). The reference expands tree nodes lazily into
linked structures; here the whole network compiles once, host-side, into
flat arrays the vectorized token-passing decoder consumes:

* tree nodes are **phone arcs**: an arc models one allophone (word-
  internal triphone; word-boundary contexts use the # approximation) as a
  chain of HMM states. Arcs sharing (position in tree, tied-class
  signature) are shared across words — the prefix-tree compression.
* per-state arrays: ``emission_class``, ``loop_cost``;
* out-arcs as CSR: ``arc_ptr [S+1]``, ``arc_dst [A]``, ``arc_cost [A]``
  (chain transitions, within-phone skips, phone-boundary fan-out, root
  entries);
* word ends padded per state: ``we_word / we_cost / we_lemma [S, Wmax]``
  (word id = LM vocab id; -1 none, -2 no-LM word e.g. silence); the
  word-end cost folds in the exit TDP and the pronunciation score.

State 0 is the non-emitting root (``loop=BIG``, no in-arcs): word-end
re-entry hyps sit at the root and expand into first-phone states on the
next frame.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..corpus.lexicon import Lexicon
from ..models.allophone import AllophoneAlphabet
from ..models.hmm import HmmTopology, TransitionModel
from ..models.tying import StateTying
from ..ops.viterbi import BIG

WORD_NONE = -1
WORD_SILENCE = -2  # word without LM tokens (silence and friends)


@dataclasses.dataclass
class PrefixTree:
    emission_class: np.ndarray  # [S] i32
    loop_cost: np.ndarray  # [S] f32
    arc_ptr: np.ndarray  # [S+1] i32 (CSR over out-arcs)
    arc_dst: np.ndarray  # [A] i32
    arc_cost: np.ndarray  # [A] f32
    we_word: np.ndarray  # [S, Wmax] i32
    we_cost: np.ndarray  # [S, Wmax] f32
    we_lemma: np.ndarray  # [S, Wmax] i32
    lemmas: List  # lemma objects by index used in we_lemma
    max_out_degree: int
    #: unigram LM lookahead potential per state (min unscaled unigram LM
    #: cost over word ends reachable in the subtree; 0 everywhere when no
    #: unigram table was provided at build). ref: src/Search/LmLookahead —
    #: folded into pruning via exact potential shaping in the decoder.
    lookahead: Optional[np.ndarray] = None
    #: word-end re-entry state per (state, word-end slot). None = all 0
    #: (the prefix tree's root). Generic WFST networks re-enter at
    #: non-emitting junction states instead (search/wfst.py).
    we_next: Optional[np.ndarray] = None

    @property
    def num_states(self) -> int:
        return self.emission_class.shape[0]

    @property
    def num_arcs(self) -> int:
        return self.arc_dst.shape[0]

    @property
    def max_word_ends(self) -> int:
        return self.we_word.shape[1]

    def stats(self) -> Dict[str, int]:
        return {
            "states": self.num_states,
            "arcs": self.num_arcs,
            "max_out_degree": self.max_out_degree,
            "max_word_ends": self.max_word_ends,
            "word_end_states": int((self.we_word[:, 0] != WORD_NONE).sum()),
        }


def build_prefix_tree(
    lexicon: Lexicon,
    tying: StateTying,
    topology: HmmTopology = HmmTopology(),
    transitions: TransitionModel = TransitionModel(),
    lm_vocab: Optional[Dict[str, int]] = None,
    within_phone_skip: bool = True,
    lm_unigrams: Optional[Dict[int, float]] = None,
) -> PrefixTree:
    """Compile the decoding network from the lexicon.

    ``lm_vocab`` maps syntactic tokens to LM word ids; lemmas whose first
    synt token is missing from it decode via <unk> if present, else are
    scored as no-LM words. ``lm_unigrams`` (LM word id -> unscaled -log
    unigram cost) enables the lookahead potential.
    """
    alphabet = AllophoneAlphabet(
        lexicon, max_states=max(topology.states_per_phone, topology.silence_states)
    )
    unk_id = lm_vocab.get("<unk>") if lm_vocab else None

    # ---- states ----------------------------------------------------------
    emission_class: List[int] = [0]  # root placeholder
    loop_cost: List[float] = [BIG]
    out_arcs: List[List[Tuple[int, float]]] = [[]]  # per state
    word_ends: List[List[Tuple[int, float, int]]] = [[]]

    def new_state(cls: int, loop: float) -> int:
        emission_class.append(cls)
        loop_cost.append(min(loop, BIG))
        out_arcs.append([])
        word_ends.append([])
        return len(emission_class) - 1

    # arc sharing: (parent_node, signature) -> (child_node, first_state, last_state)
    arc_map: Dict[Tuple[int, Tuple], Tuple[int, int, int]] = {}
    next_node = [1]  # node ids (root=0); nodes are virtual (arcs carry states)

    lemma_list: List = []

    for lemma in lexicon.lemmata:
        if not lemma.pronunciations:
            continue
        synt = lemma.synt_tokens()
        if not synt:
            lm_word = WORD_SILENCE
        elif lm_vocab is None:
            lm_word = WORD_SILENCE if lemma.special == "silence" else 0
        else:
            lm_word = lm_vocab.get(synt[0], unk_id if unk_id is not None else WORD_SILENCE)
        lemma_idx = len(lemma_list)
        lemma_list.append(lemma)

        for pron in lemma.pronunciations:
            states_flat = alphabet.phone_sequence_states(pron.phonemes, topology)
            # group chain entries by phone position
            per_phone: List[List] = []
            pos = 0
            for i, pid in enumerate(pron.phonemes):
                ph = lexicon.phonemes.by_id(pid)
                n = topology.num_states(ph.context_independent)
                per_phone.append(states_flat[pos : pos + n])
                pos += n

            cur_node = 0
            prev_last_state = 0  # root
            prev_leave_cost = 0.0  # cost of arc from prev into this arc's head
            for i, phone_states in enumerate(per_phone):
                ph = lexicon.phonemes.by_id(pron.phonemes[i])
                tdp = transitions.for_class(ph.context_independent)
                classes = tuple(tying.classify(st) for st in phone_states)
                key = (cur_node, classes)
                if key in arc_map:
                    child_node, first_state, last_state = arc_map[key]
                else:
                    sids = [new_state(c, tdp.loop) for c in classes]
                    # chain + skips within the phone
                    for j in range(len(sids) - 1):
                        out_arcs[sids[j]].append((sids[j + 1], min(tdp.forward, BIG)))
                    if within_phone_skip and tdp.skip < BIG:
                        for j in range(len(sids) - 2):
                            out_arcs[sids[j]].append((sids[j + 2], tdp.skip))
                    child_node = next_node[0]
                    next_node[0] += 1
                    first_state, last_state = sids[0], sids[-1]
                    arc_map[key] = (child_node, first_state, last_state)
                # connect parent tail to this arc's head (flatten dedups)
                out_arcs[prev_last_state].append((first_state, min(prev_leave_cost, BIG)))
                cur_node = child_node
                prev_last_state = last_state
                prev_leave_cost = tdp.forward

            final_ph = lexicon.phonemes.by_id(pron.phonemes[-1])
            final_tdp = transitions.for_class(final_ph.context_independent)
            we_cost = min(final_tdp.exit + pron.score, BIG)
            word_ends[prev_last_state].append((lm_word, we_cost, lemma_idx))

    # ---- flatten ---------------------------------------------------------
    S = len(emission_class)
    # dedup arcs (same dst keep min cost)
    arc_ptr = np.zeros(S + 1, np.int32)
    flat_dst: List[int] = []
    flat_cost: List[float] = []
    max_deg = 0
    for s in range(S):
        best: Dict[int, float] = {}
        for dst, cost in out_arcs[s]:
            if dst not in best or cost < best[dst]:
                best[dst] = cost
        items = sorted(best.items())
        max_deg = max(max_deg, len(items))
        for dst, cost in items:
            flat_dst.append(dst)
            flat_cost.append(cost)
        arc_ptr[s + 1] = len(flat_dst)

    w_max = max(1, max(len(w) for w in word_ends))
    we_word = np.full((S, w_max), WORD_NONE, np.int32)
    we_cost_arr = np.full((S, w_max), np.float32(BIG), np.float32)
    we_lemma = np.full((S, w_max), -1, np.int32)
    for s, ws in enumerate(word_ends):
        # dedup identical (word, lemma) keeping best cost
        seen: Dict[Tuple[int, int], float] = {}
        for w, c, l in ws:
            if (w, l) not in seen or c < seen[(w, l)]:
                seen[(w, l)] = c
        for k, ((w, l), c) in enumerate(sorted(seen.items(), key=lambda kv: kv[1])):
            we_word[s, k] = w
            we_cost_arr[s, k] = c
            we_lemma[s, k] = l

    tree = PrefixTree(
        emission_class=np.asarray(emission_class, np.int32),
        loop_cost=np.asarray(loop_cost, np.float32),
        arc_ptr=arc_ptr,
        arc_dst=np.asarray(flat_dst, np.int32),
        arc_cost=np.asarray(flat_cost, np.float32),
        we_word=we_word,
        we_cost=we_cost_arr,
        we_lemma=we_lemma,
        lemmas=lemma_list,
        max_out_degree=max_deg,
    )
    if lm_unigrams is not None:
        tree.lookahead = compute_lookahead(tree, lm_unigrams)
    return tree


def compute_lookahead(tree: PrefixTree, lm_unigrams: Dict[int, float]) -> np.ndarray:
    """Per-state lookahead potential: min unscaled unigram cost over word
    ends reachable below each state (silence/no-LM words count as 0).

    States are created parent-before-child, so a single reverse sweep is
    a valid reverse-topological relaxation (loops/word-end re-entries are
    not tree arcs).
    """
    S = tree.num_states
    la = np.full(S, np.float32(BIG), np.float32)
    default = max(lm_unigrams.values()) if lm_unigrams else 0.0
    for s in range(S - 1, -1, -1):
        best = BIG
        for k in range(tree.max_word_ends):
            w = tree.we_word[s, k]
            if w == WORD_NONE:
                break
            best = min(best, 0.0 if w < 0 else lm_unigrams.get(int(w), default))
        for ai in range(tree.arc_ptr[s], tree.arc_ptr[s + 1]):
            best = min(best, float(la[tree.arc_dst[ai]]))
        la[s] = best
    la[la >= BIG / 2] = 0.0  # dead-end states (shouldn't exist): neutral
    return la.astype(np.float32)


# ------------------------------------------------------------- image caching
def save_tree(tree: PrefixTree, path: str) -> None:
    """Persist the compiled network (ref: the reference's image/dump
    caching of compiled state networks — compilation of large lexica
    takes seconds-to-minutes, so it is a cached build artifact).

    Lemma objects are not serialized: the list is rebound from the
    lexicon at load (it is exactly the lexicon's pronunciation-bearing
    lemmata in order); saved orths double-check the binding."""
    np.savez_compressed(
        path,
        emission_class=tree.emission_class,
        loop_cost=tree.loop_cost,
        arc_ptr=tree.arc_ptr,
        arc_dst=tree.arc_dst,
        arc_cost=tree.arc_cost,
        we_word=tree.we_word,
        we_cost=tree.we_cost,
        we_lemma=tree.we_lemma,
        max_out_degree=np.int64(tree.max_out_degree),
        lookahead=(
            tree.lookahead if tree.lookahead is not None else np.zeros(0, np.float32)
        ),
        we_next=(
            tree.we_next if tree.we_next is not None else np.zeros((0, 0), np.int32)
        ),
        lemma_orths=np.array(
            [l.primary_orth for l in tree.lemmas], dtype=np.str_
        ),
    )


def load_tree(path: str, lexicon) -> PrefixTree:
    """Load a saved network and rebind its lemma objects from ``lexicon``.
    Raises ValueError when the lexicon no longer matches the image."""
    data = np.load(path, allow_pickle=False)
    lemmas = [l for l in lexicon.lemmata if l.pronunciations]
    saved = [str(o) for o in data["lemma_orths"]]
    got = [l.primary_orth for l in lemmas]
    if saved != got:
        raise ValueError(
            f"search-network image {path} does not match the lexicon "
            f"({len(saved)} vs {len(got)} lemmata)"
        )
    la = data["lookahead"]
    wn = data["we_next"]
    return PrefixTree(
        emission_class=data["emission_class"],
        loop_cost=data["loop_cost"],
        arc_ptr=data["arc_ptr"],
        arc_dst=data["arc_dst"],
        arc_cost=data["arc_cost"],
        we_word=data["we_word"],
        we_cost=data["we_cost"],
        we_lemma=data["we_lemma"],
        lemmas=lemmas,
        max_out_degree=int(data["max_out_degree"]),
        lookahead=la if la.size else None,
        we_next=wn if wn.size else None,
    )
