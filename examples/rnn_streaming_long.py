"""RNN-fused STREAMING decode of a 2-minute utterance at fixed memory.

The r2 verdict's done-criterion for the fusion rework: "fusion decode
on a 2-minute utterance at fixed memory". The old design kept an
O(R * T) record-keyed hidden-state ring — at 2 minutes (T=12000 frames,
R=16) that is 192k rows of [2H] floats PER UTTERANCE and grows without
bound with stream length. The round-3 design carries a per-hypothesis
pool ROW through the sorts and compacts the pool to the <=2K live rows
between feeds: the pool is 2K + R*Tb rows FOREVER.

This demo streams a 2-minute synthetic utterance through the fused
decoder in 4-second blocks, printing the pool size after every feed
(constant) and the final transcript, and cross-checks the first 8
seconds against an offline fused decode of the same prefix.

Run (CPU, ~2-4 min): python examples/rnn_streaming_long.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("RNNL_DEVICE", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from rasr_tpu.corpus.lexicon import Lexicon, build_default_silence
from rasr_tpu.models.hmm import HmmTopology, TransitionModel
from rasr_tpu.models.lm.arpa import NgramLm
from rasr_tpu.models.lm.ngram_tpu import compile_ngram
from rasr_tpu.models.lm.rnn import RnnLm
from rasr_tpu.models.tying import MonophoneStateTying
from rasr_tpu.search.decoder import BeamConfig, TreeDecoder
from rasr_tpu.search.rnn_fusion import build_rnn_fusion
from rasr_tpu.search.streaming import StreamingDecoder
from rasr_tpu.search.tree import build_prefix_tree


def main():
    rng = np.random.default_rng(0)
    lex = Lexicon()
    build_default_silence(lex)
    words = []
    for w, pron in enumerate(
        [["a", "b"], ["b", "a"], ["a", "a"], ["b", "b", "a"], ["a", "b", "b"]]
    ):
        lex.add_lemma([f"W{w}"], [(pron, 0.0)])
        words.append(f"W{w}")
    sents = [
        [words[int(rng.integers(5))] for _ in range(6)] for _ in range(200)
    ]
    lm = NgramLm.train_from_text(sents, order=3)
    tables = compile_ngram(lm)
    rnn = RnnLm.train_from_text(sents, embed_dim=16, hidden_dim=32, epochs=8)
    topo = HmmTopology(states_per_phone=1, silence_states=1)
    tying = MonophoneStateTying(lex, topo)
    tree = build_prefix_tree(lex, tying, topo, TransitionModel(), lm_vocab=lm.vocab)
    fusion = build_rnn_fusion(rnn, lm.vocab, weight=0.5)

    K, R = 96, 16
    dec = TreeDecoder(
        tree, tables,
        BeamConfig(max_hyps=K, beam=1e9, word_end_limit=R, root_hyps=64,
                   lm_scale=1.0),
        rnn_fusion=fusion,
    )

    # 2 minutes at a 10ms hop = 12000 frames
    T, Tb = 12000, 400  # 4-second feed blocks
    M = tying.num_classes
    emis = rng.uniform(0.0, 5.0, size=(1, T, M)).astype(np.float32)

    # offline cross-check on an 8-second prefix (the offline pool for
    # the FULL 2 minutes would be the O(R*T) shape this design removed)
    Tp = 800
    off = dec.decode_scores(emis[:, :Tp], np.array([Tp], np.int32))

    sd = StreamingDecoder(dec).restart(1, n_frames=np.array([T], np.int32))
    t0 = time.time()
    pool_rows = set()
    for lo in range(0, T, Tb):
        sd.feed(emis[:, lo : lo + Tb])
        pool_rows.add(int(sd._carry[-2].shape[1]))
    (res,) = sd.finalize()
    dt = time.time() - t0

    cap = 2 * K + R * Tb
    assert pool_rows == {cap}, pool_rows
    old_rows = R * T + 1
    print(f"frames={T} blocks={T // Tb} pool_rows={cap} (constant; "
          f"old O(R*T) ring would need {old_rows})")
    print(f"decode {dt:.1f}s wall, score={res.score:.2f}, "
          f"{len(res.words)} words; first 10: {' '.join(res.words[:10])}")

    sd2 = StreamingDecoder(dec).restart(1, n_frames=np.array([Tp], np.int32))
    for lo in range(0, Tp, Tb):
        sd2.feed(emis[:, lo : lo + Tb])
    (pre,) = sd2.finalize()
    assert abs(pre.score - off[0].score) < 1e-3 and pre.words == off[0].words
    print(f"8s prefix: streaming == offline fused decode "
          f"(score {pre.score:.3f}) OK")


if __name__ == "__main__":
    main()
