"""RNN-fusion quality under TRUNCATED-history recombination.

The r2 verdict's gap: the fusion parity tests use an order-5 n-gram so
truncation is vacuous — no evidence of fusion QUALITY at realistic
recombination orders (the reference decodes its TF RNN LM with
truncated-history recombination, src/Lm/TF*). This battery measures it:

* task: the search-error battery source (Markov chain -> planted GMM
  emissions), so histories genuinely predict words;
* recombination LM: an ORDER-2 n-gram trained on the same text (the
  truncation is real: two hyps merge on one word of history);
* fused RNN LM: an LSTM trained on the same text, weight swept.

Reported per weight: WER + paired-bootstrap delta vs the pure 2-gram
decode, plus reference rows for pure n-grams of order 2 and 4. The RNN
should recover a chunk of the 4-gram's advantage while recombining on
2-gram states — that is the operating-point evidence for `rnn-scale`.

Run (CPU, ~10-20 min): python examples/rnn_fusion_battery.py
Env: RNNB_WORDS/RNNB_UTTS/RNNB_NOISE/RNNB_EPOCHS/RNNB_HIDDEN
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("RNNB_DEVICE", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from rasr_tpu.lattice.evaluator import EditStats, align_tokens
from rasr_tpu.models.lm.arpa import NgramLm
from rasr_tpu.models.lm.ngram_tpu import compile_ngram
from rasr_tpu.models.lm.rnn import RnnLm
from rasr_tpu.pipeline.battery import build_battery_task, paired_bootstrap_delta
from rasr_tpu.search.decoder import BeamConfig, TreeDecoder
from rasr_tpu.search.rnn_fusion import build_rnn_fusion


def decode_wer(task, tables, cfg, rnn_fusion=None):
    dec = TreeDecoder(task.tree, tables, cfg, rnn_fusion=rnn_fusion)
    results = dec.decode_scores(task.emissions, task.n_frames)
    stats = EditStats()
    B = task.emissions.shape[0]
    errs = np.zeros(B, np.int64)
    ref = np.zeros(B, np.int64)
    for b, res in enumerate(results):
        st, _ = align_tokens(task.refs[b], res.words)
        stats.add(st)
        errs[b], ref[b] = st.errors, st.reference_length
    return {"wer": stats.wer, "_utt_errors": errs, "_utt_ref_len": ref}


def main():
    t0 = time.time()
    task = build_battery_task(
        num_words=int(os.environ.get("RNNB_WORDS", "300")),
        num_utts=int(os.environ.get("RNNB_UTTS", "48")),
        n_train_sentences=int(os.environ.get("RNNB_TRAIN", "6000")),
        noise=float(os.environ.get("RNNB_NOISE", "2.8")),
        separation=1.3,
        lm_order=4,
        # SECOND-order Markov source: the battery default source is
        # first-order, which a bigram LM captures EXACTLY (measured:
        # 2gram == 4gram WER there — no headroom for fusion). Order 2
        # makes truncated-history recombination genuinely lossy.
        markov_order=int(os.environ.get("RNNB_MARKOV", "2")),
        # r5: sharper histories (fewer successors per history) scale the
        # 2gram-vs-4gram gap — the effect fusion must recover. Pilot at
        # N=48 (2026-08-21): support 12 -> gap +0.33%; support 6 ->
        # +0.99%; support 4 -> +0.66% (task saturates easy); homophones
        # at 0.20 add errors NEITHER lm fixes (gap +0.34%). support=6
        # is the power design for the significance run.
        markov_support=int(os.environ.get("RNNB_SUPPORT", "12")),
        # ... and homophone density multiplies LM leverage on top:
        # support=4 + homo=0.20 -> gap +2.03% (CI excludes 0 at N=48)
        homophone_frac=float(os.environ.get("RNNB_HOMO", "0.05")),
        seed=int(os.environ.get("RNNB_SEED", "0")),
    )
    lm_scale = float(os.environ.get("RNNB_LM_SCALE", "3.0"))
    print(f"# task built ({time.time() - t0:.0f}s)", file=sys.stderr)

    # order-2 recombination LM over the same text (real truncation)
    lm2 = NgramLm.train_from_text(task.train_text, order=2)
    tab2 = compile_ngram(lm2)
    # sanity: vocab ids must match the tree's word ids (same text/orths)
    assert lm2.vocab == task.lm.vocab

    t0 = time.time()
    rnn = RnnLm.train_from_text(
        task.train_text,
        embed_dim=int(os.environ.get("RNNB_EMBED", "32")),
        hidden_dim=int(os.environ.get("RNNB_HIDDEN", "64")),
        epochs=int(os.environ.get("RNNB_EPOCHS", "6")),
    )
    print(f"# rnn trained ({time.time() - t0:.0f}s)", file=sys.stderr)

    cfg = BeamConfig(
        max_hyps=256, beam=90.0, word_end_limit=64, root_hyps=16,
        lm_scale=lm_scale,
    )
    rows = []
    base2 = decode_wer(task, tab2, cfg)
    rows.append(("ngram-2", 0.0, base2, None))
    base4 = decode_wer(task, task.tables, cfg)
    rows.append(("ngram-4", 0.0, base4, paired_bootstrap_delta(base2, base4)))
    weights = [
        float(x)
        for x in os.environ.get("RNNB_WEIGHTS", "0.3,0.5,0.7,1.0").split(",")
    ]
    for w in weights:
        fusion = build_rnn_fusion(rnn, lm2.vocab, weight=w * lm_scale)
        r = decode_wer(task, tab2, cfg, rnn_fusion=fusion)
        rows.append((f"2gram+rnn", w, r, paired_bootstrap_delta(base2, r)))

    print("| lm | rnn-scale (x lm-scale) | WER | dWER vs 2gram [95% CI] |")
    print("|----|------------------------|-----|------------------------|")
    for name, w, r, bs in rows:
        d = (
            f"{bs['delta']:+.4f} [{bs['ci_lo']:+.4f},{bs['ci_hi']:+.4f}] "
            f"P(better)={bs['p_better']:.2f}" if bs else "—"
        )
        print(f"| {name} | {w} | {r['wer']:.4f} | {d} |")
        print(json.dumps({"lm": name, "rnn_scale": w,
                          "wer": round(r["wer"], 4)}), file=sys.stderr)


if __name__ == "__main__":
    main()
