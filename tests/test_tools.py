"""CLI tool-chain integration test (subprocess level, toy corpus).

Covers the reference's de-facto regression-setup testing style
(SURVEY §4): run the real tools end-to-end and check WER.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_tool(module, *args, cwd, with_stderr=False):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", module, *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, f"{module} failed:\n{out.stdout}\n{out.stderr}"
    return out.stdout + out.stderr if with_stderr else out.stdout


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tools")
    sys.path.insert(0, REPO)
    from rasr_tpu.corpus.audio import write_wav
    from rasr_tpu.models.lm.arpa import NgramLm

    rng = np.random.default_rng(9)
    sr = 16000
    ph = {"a": 500, "b": 2000}
    words = {"AB": ["a", "b"], "BA": ["b", "a"]}
    texts = [["AB", "BA"], ["BA", "AB"], ["AB", "AB"], ["BA", "BA"]] * 2

    def tone(s, d):
        t = np.arange(int(d * sr)) / sr
        return (0.3 * np.sin(2 * np.pi * ph[s] * t)).astype(np.float32)

    def sil(d):
        return (0.002 * rng.normal(size=int(d * sr))).astype(np.float32)

    xml = ['<corpus name="toy">']
    for i, ws in enumerate(texts):
        audio = [sil(0.15)]
        for w in ws:
            for p in words[w]:
                audio.append(tone(p, 0.25))
            audio.append(sil(0.15))
        a = np.concatenate(audio)
        write_wav(str(tmp / f"rec{i}.wav"), a, sr)
        orth = " ".join(ws)
        xml.append(
            f'<recording name="rec{i}" audio="rec{i}.wav">'
            f'<segment name="s" start="0" end="{len(a)/sr}"><orth>{orth}</orth></segment></recording>'
        )
    xml.append("</corpus>")
    (tmp / "toy.corpus").write_text("".join(xml))
    (tmp / "lexicon.xml").write_text(
        "<lexicon><phoneme-inventory>"
        "<phoneme><symbol>a</symbol></phoneme><phoneme><symbol>b</symbol></phoneme>"
        "<phoneme><symbol>si</symbol><variation>none</variation></phoneme>"
        "</phoneme-inventory>"
        '<lemma special="silence"><orth>[SILENCE]</orth><phon>si</phon><synt/><eval/></lemma>'
        "<lemma><orth>AB</orth><phon>a b</phon></lemma>"
        "<lemma><orth>BA</orth><phon>b a</phon></lemma></lexicon>"
    )
    NgramLm.train_from_text(texts, order=2).write_arpa(str(tmp / "lm.arpa"))
    return tmp


def test_full_tool_chain(workdir):
    cwd = str(workdir)
    out = run_tool(
        "rasr_tpu.tools.corpus_statistics",
        "--corpus-statistics.corpus-file=toy.corpus", cwd=cwd,
    )
    assert json.loads(out)["segments"] == 8

    run_tool(
        "rasr_tpu.tools.feature_extraction",
        "--feature-extraction.corpus-file=toy.corpus",
        "--feature-extraction.cache=feat.cache",
        "--feature-extraction.frontend.normalize=none", cwd=cwd,
    )
    listing = run_tool(
        "rasr_tpu.tools.archiver",
        "--archiver.mode=list", "--archiver.archive=feat.cache", cwd=cwd,
    )
    assert len(listing.splitlines()) == 8

    run_tool(
        "rasr_tpu.tools.acoustic_model_trainer",
        "--acoustic-model-trainer.action=train",
        "--acoustic-model-trainer.corpus-file=toy.corpus",
        "--acoustic-model-trainer.lexicon-file=lexicon.xml",
        "--acoustic-model-trainer.states-per-phone=1",
        "--acoustic-model-trainer.iterations=5",
        "--acoustic-model-trainer.new-mixture-file=model.mix",
        "--acoustic-model-trainer.frontend.normalize=none", cwd=cwd,
    )
    assert (workdir / "model.mix.npz").exists()

    out = run_tool(
        "rasr_tpu.tools.speech_recognizer",
        "--speech-recognizer.corpus-file=toy.corpus",
        "--speech-recognizer.lexicon-file=lexicon.xml",
        "--speech-recognizer.lm-file=lm.arpa",
        "--speech-recognizer.mixture-file=model.mix",
        "--speech-recognizer.states-per-phone=1",
        "--speech-recognizer.lattice-archive=lat.cache",
        "--speech-recognizer.ctm-file=out.ctm",
        "--speech-recognizer.nbest-file=out.nbest",
        "--speech-recognizer.nbest=3",
        "--speech-recognizer.search.lm-scale=2.0",
        "--speech-recognizer.search.max-hyps=128",
        "--speech-recognizer.log-file=rec.log",
        "--speech-recognizer.frontend.normalize=none", cwd=cwd,
    )
    assert "WER: 0.0000" in out
    # log-analysis (the in-tree "analog"): re-derives the corpus WER from
    # the recognizer's JSONL log records
    out_an = run_tool(
        "rasr_tpu.tools.log_analysis",
        "--log-analysis.json=true", "rec.log", cwd=cwd,
    )
    summary = json.loads(out_an)
    assert summary["segments"] == 8
    assert summary["total"]["wer"] == 0.0 and summary["total"]["ref_len"] == 16
    assert summary["audio_seconds"] > 0 and summary["mean_rtf"] > 0
    # CTM: "<recording> <channel> <begin> <dur> <word>" per word, with
    # 2 words per utterance x 8 utterances at 0 WER
    ctm = (workdir / "out.ctm").read_text().splitlines()
    assert len(ctm) == 16
    rec0, ch, t0, dur, word = ctm[0].split()
    assert rec0 == "rec0" and ch == "1" and word in ("AB", "BA")
    assert float(dur) > 0 and float(t0) >= 0
    # n-best: rank-0 lines carry the 0-WER best hypothesis; scores
    # non-decreasing with rank within a segment
    nb = (workdir / "out.nbest").read_text().splitlines()
    per_seg = {}
    for line in nb:
        seg, rank, score, *words = line.split()
        per_seg.setdefault(seg, []).append((int(rank), float(score), words))
    assert len(per_seg) == 8
    for entries in per_seg.values():
        scores = [s for _, s, _ in sorted(entries)]
        assert scores == sorted(scores)

    # across-word search network (exact word-boundary contexts); with
    # monophone tying it must collapse to the same 0-WER result
    out = run_tool(
        "rasr_tpu.tools.speech_recognizer",
        "--speech-recognizer.corpus-file=toy.corpus",
        "--speech-recognizer.lexicon-file=lexicon.xml",
        "--speech-recognizer.lm-file=lm.arpa",
        "--speech-recognizer.mixture-file=model.mix",
        "--speech-recognizer.states-per-phone=1",
        "--speech-recognizer.across-word=true",
        "--speech-recognizer.search.lm-scale=2.0",
        "--speech-recognizer.search.max-hyps=128",
        "--speech-recognizer.frontend.normalize=none", cwd=cwd,
    )
    assert "WER: 0.0000" in out

    out = run_tool(
        "rasr_tpu.tools.flf_tool",
        "--flf-tool.lattice-archive=lat.cache",
        "--flf-tool.corpus-file=toy.corpus",
        "--flf-tool.ops=prune best evaluate oracle", cwd=cwd,
    )
    assert "WER: 0.0000" in out and "oracle WER: 0.0000" in out


def test_log_analysis_aggregation(tmp_path):
    """analyze(): multi-log merge, per-speaker split, unscored segments."""
    from rasr_tpu.tools.log_analysis import _parse_records, analyze

    recs = [
        {"msg": "recognized", "channel": "statistics", "segment": "c/r0/s",
         "speaker": "spk1", "reference": "A B", "recognized": "A B",
         "score": 10.0, "frames": 100, "rtf": 0.02},
        {"msg": "recognized", "segment": "c/r1/s", "speaker": "spk2",
         "reference": "A B C", "recognized": "A X",  # 1 sub + 1 del
         "score": 20.0, "frames": 200, "rtf": 0.04},
        # unscored segment (no reference orth): counted but not in WER
        {"msg": "recognized", "segment": "c/r2/s", "speaker": "",
         "reference": "", "recognized": "B", "score": 5.0, "frames": 50,
         "rtf": 0.01},
        {"msg": "not recognition", "channel": "log"},
    ]
    log1, log2 = tmp_path / "a.log", tmp_path / "b.log"
    log1.write_text("\n".join(json.dumps(r) for r in recs[:2]) + "\n")
    log2.write_text("\n".join(json.dumps(r) for r in recs[2:]) + "\n{bad json")
    report = analyze(_parse_records([str(log1), str(log2)]))
    assert report["segments"] == 3 and report["scored_segments"] == 2
    t = report["total"]
    assert t["ref_len"] == 5 and t["sub"] == 1 and t["del"] == 1 and t["ins"] == 0
    assert abs(t["wer"] - 2 / 5) < 1e-9
    assert report["by_speaker"]["spk1"]["errors"] == 0
    assert report["by_speaker"]["spk2"]["errors"] == 2
    assert report["worst"][0]["segment"] == "c/r1/s"
    assert abs(report["audio_seconds"] - 3.5) < 1e-9
    assert abs(report["max_rtf"] - 0.04) < 1e-12


def test_tool_help_and_bad_config(workdir):
    out = run_tool("rasr_tpu.tools.speech_recognizer", "--help", cwd=str(workdir))
    assert "speech-recognizer" in out
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    bad = subprocess.run(
        [sys.executable, "-m", "rasr_tpu.tools.lm_util",
         "--lm-util.action=bogus", "--lm-util.lm-file=x"],
        cwd=str(workdir), env=env, capture_output=True, text=True, timeout=60,
    )
    assert bad.returncode != 0  # invalid choice rejected


def test_dump_config_and_system_information(workdir):
    """--dump-config prints resolved rules with sources; a log-file run
    starts with the system-information record (ref: the reference's
    config dump channel and <system-information> log element)."""
    out = run_tool(
        "rasr_tpu.tools.corpus_statistics",
        "--corpus-statistics.corpus-file=toy.corpus",
        "--dump-config", cwd=str(workdir),
    )
    assert "corpus-statistics.corpus-file = toy.corpus" in out
    assert "<cmdline>" in out
    run_tool(
        "rasr_tpu.tools.corpus_statistics",
        "--corpus-statistics.corpus-file=toy.corpus",
        "--corpus-statistics.log-file=stats.jsonl", cwd=str(workdir),
    )
    import json as _json

    first = _json.loads((workdir / "stats.jsonl").read_text().splitlines()[0])
    assert first["msg"] == "system-information" and "hostname" in first


def test_align_nn_and_util_tools(workdir):
    """Second half of the tool chain: alignment cache -> nn-trainer
    (supervised + priors), plus lm-util, fsa, lattice-processor."""
    cwd = str(workdir)
    if not (workdir / "model.mix.npz").exists():
        test_full_tool_chain(workdir)  # build the chain artifacts

    run_tool(
        "rasr_tpu.tools.acoustic_model_trainer",
        "--acoustic-model-trainer.action=align",
        "--acoustic-model-trainer.corpus-file=toy.corpus",
        "--acoustic-model-trainer.lexicon-file=lexicon.xml",
        "--acoustic-model-trainer.states-per-phone=1",
        "--acoustic-model-trainer.mixture-file=model.mix",
        "--acoustic-model-trainer.alignment-cache=align.cache",
        "--acoustic-model-trainer.frontend.normalize=none", cwd=cwd,
    )
    run_tool(
        "rasr_tpu.tools.nn_trainer",
        "--nn-trainer.action=supervised-training",
        "--nn-trainer.feature-cache=feat.cache",
        "--nn-trainer.alignment-cache=align.cache",
        "--nn-trainer.hidden-layers=16",
        "--nn-trainer.epochs=2",
        "--nn-trainer.params-file=nn.msgpack", cwd=cwd,
    )
    assert (workdir / "nn.msgpack").exists()
    run_tool(
        "rasr_tpu.tools.nn_trainer",
        "--nn-trainer.action=supervised-training",
        "--nn-trainer.model-type=conformer",
        "--nn-trainer.feature-cache=feat.cache",
        "--nn-trainer.alignment-cache=align.cache",
        "--nn-trainer.hidden-layers=16",
        "--nn-trainer.epochs=1",
        "--nn-trainer.params-file=conf.msgpack", cwd=cwd,
    )
    assert (workdir / "conf.msgpack").exists()
    run_tool(
        "rasr_tpu.tools.nn_trainer",
        "--nn-trainer.action=estimate-priors",
        "--nn-trainer.feature-cache=feat.cache",
        "--nn-trainer.alignment-cache=align.cache",
        "--nn-trainer.priors-file=priors.npy", cwd=cwd,
    )
    assert (workdir / "priors.npy").exists()

    out = run_tool(
        "rasr_tpu.tools.lm_util",
        "--lm-util.action=statistics", "--lm-util.lm-file=lm.arpa", cwd=cwd,
    )
    assert json.loads(out)["order"] == 2
    out = run_tool(
        "rasr_tpu.tools.lm_util",
        "--lm-util.action=compile-check", "--lm-util.lm-file=lm.arpa", cwd=cwd,
    )
    assert json.loads(out)["states"] > 0
    out = run_tool(
        "rasr_tpu.tools.lm_util",
        "--lm-util.action=perplexity", "--lm-util.lm-file=lm.arpa",
        "--lm-util.corpus-file=toy.corpus", cwd=cwd,
    )
    assert "perplexity" in out

    # fsa tool: compose two toy transducers, then best path
    (workdir / "a.att").write_text("0 1 1 1 0.5\n1 0.0\n")
    (workdir / "b.att").write_text("0 1 1 2 0.25\n1 0.0\n")
    run_tool(
        "rasr_tpu.tools.fsa_tool", "--fsa.op=compose",
        "--fsa.output=c.att", "a.att", "b.att", cwd=cwd,
    )
    out = run_tool("rasr_tpu.tools.fsa_tool", "--fsa.op=best", "c.att", cwd=cwd)
    assert "0.75" in out
    out = run_tool("rasr_tpu.tools.fsa_tool", "--fsa.op=draw", "c.att", cwd=cwd)
    assert "digraph" in out

    # legacy lattice-processor: its default workflow is ACOUSTIC lattice
    # rescoring (rescore-am) — re-align every word arc under the AM from
    # the feature cache, write the rescored archive, and the rescored
    # lattices must still decode the toy corpus at 0 WER
    out = run_tool(
        "rasr_tpu.tools.lattice_processor",
        "--lattice-processor.lattice-archive=lat.cache",
        "--lattice-processor.corpus-file=toy.corpus",
        "--lattice-processor.feature-cache=feat.cache",
        "--lattice-processor.lexicon-file=lexicon.xml",
        "--lattice-processor.mixture-file=model.mix",
        "--lattice-processor.states-per-phone=1",
        "--lattice-processor.output-archive=lat_am.cache",
        "--lattice-processor.ops=rescore-am best evaluate write", cwd=cwd,
    )
    assert "WER: 0.0000" in out
    out = run_tool(
        "rasr_tpu.tools.flf_tool",
        "--flf-tool.lattice-archive=lat_am.cache",
        "--flf-tool.corpus-file=toy.corpus",
        "--flf-tool.ops=best evaluate", cwd=cwd,
    )
    assert "WER: 0.0000" in out


def test_network_image_cache(workdir):
    """--network-cache: second run loads the compiled network image;
    changing the LM invalidates it (content-hash key)."""
    cwd = str(workdir)
    if not (workdir / "model.mix.npz").exists():
        test_full_tool_chain(workdir)
    args = [
        "--speech-recognizer.corpus-file=toy.corpus",
        "--speech-recognizer.lexicon-file=lexicon.xml",
        "--speech-recognizer.lm-file=lm.arpa",
        "--speech-recognizer.mixture-file=model.mix",
        "--speech-recognizer.states-per-phone=1",
        "--speech-recognizer.search.lm-scale=2.0",
        "--speech-recognizer.search.max-hyps=128",
        "--speech-recognizer.frontend.normalize=none",
        "--speech-recognizer.network-cache=net.img",
        "--speech-recognizer.log-file=sr.log",
    ]
    out1 = run_tool("rasr_tpu.tools.speech_recognizer", *args, cwd=cwd)
    assert "WER: 0.0000" in out1
    assert (workdir / "net.img.tree.npz").exists()
    log = (workdir / "sr.log").read_text()
    assert "network image saved" in log
    (workdir / "sr.log").unlink()

    out2 = run_tool("rasr_tpu.tools.speech_recognizer", *args, cwd=cwd)
    assert "WER: 0.0000" in out2  # identical results from the image
    log = (workdir / "sr.log").read_text()
    assert "network image loaded" in log
    (workdir / "sr.log").unlink()

    # touch the LM -> stale key -> rebuild
    lm_path = workdir / "lm.arpa"
    lm_path.write_text(lm_path.read_text() + "\n")
    out3 = run_tool("rasr_tpu.tools.speech_recognizer", *args, cwd=cwd)
    assert "WER: 0.0000" in out3
    log = (workdir / "sr.log").read_text()
    assert "network image saved" in log


def test_recognizer_bigram_lookahead(workdir):
    """--search.lookahead-order=2: recognition with bigram lookahead
    shaping stays at 0 WER, and the tables round-trip through the
    network image cache."""
    cwd = str(workdir)
    if not (workdir / "model.mix.npz").exists():
        test_full_tool_chain(workdir)
    args = [
        "--speech-recognizer.corpus-file=toy.corpus",
        "--speech-recognizer.lexicon-file=lexicon.xml",
        "--speech-recognizer.lm-file=lm.arpa",
        "--speech-recognizer.mixture-file=model.mix",
        "--speech-recognizer.states-per-phone=1",
        "--speech-recognizer.search.lm-scale=2.0",
        "--speech-recognizer.search.max-hyps=128",
        "--speech-recognizer.search.lookahead-order=2",
        "--speech-recognizer.search.lookahead-classes=8",
        "--speech-recognizer.frontend.normalize=none",
        "--speech-recognizer.network-cache=net2.img",
        "--speech-recognizer.log-file=sr2.log",
    ]
    out1 = run_tool("rasr_tpu.tools.speech_recognizer", *args, cwd=cwd)
    assert "WER: 0.0000" in out1
    assert (workdir / "net2.img.la.npz").exists()
    (workdir / "sr2.log").unlink()
    out2 = run_tool("rasr_tpu.tools.speech_recognizer", *args, cwd=cwd)
    assert "WER: 0.0000" in out2
    log = (workdir / "sr2.log").read_text()
    assert "network image loaded" in log
    # order-3 + smoothed + corr-scaled + survivor updates (r3 knobs)
    # through the CLI surface — 0 WER must hold (shaping/laziness only
    # affects pruning, and the toy task is solvable at these widths)
    args3 = [a for a in args if "lookahead-order" not in a
             and "network-cache" not in a and "log-file" not in a] + [
        "--speech-recognizer.search.lookahead-order=3",
        "--speech-recognizer.search.lookahead-smooth=1.0",
        "--speech-recognizer.search.lookahead-corr-scale=0.5",
        "--speech-recognizer.search.lookahead-update=survivor",
        "--speech-recognizer.log-file=sr3.log",
    ]
    out3 = run_tool("rasr_tpu.tools.speech_recognizer", *args3, cwd=cwd)
    assert "WER: 0.0000" in out3


def test_recognizer_rnn_fusion(workdir):
    """--rnn-lm-file: first-pass RNN-LM fusion in the recognizer stays
    at 0 WER on the toy corpus (the RNN is trained on its transcripts,
    so fusing it must not break recognition)."""
    cwd = str(workdir)
    if not (workdir / "model.mix.npz").exists():
        test_full_tool_chain(workdir)
    from rasr_tpu.models.lm.rnn import RnnLm

    texts = [["AB", "BA"], ["BA", "AB"], ["AB", "AB"], ["BA", "BA"]] * 2
    rnn = RnnLm.train_from_text(texts, embed_dim=8, hidden_dim=12, epochs=40)
    rnn.save(str(workdir / "rnn_lm"))
    out = run_tool(
        "rasr_tpu.tools.speech_recognizer",
        "--speech-recognizer.corpus-file=toy.corpus",
        "--speech-recognizer.lexicon-file=lexicon.xml",
        "--speech-recognizer.lm-file=lm.arpa",
        "--speech-recognizer.mixture-file=model.mix",
        "--speech-recognizer.states-per-phone=1",
        "--speech-recognizer.rnn-lm-file=rnn_lm",
        "--speech-recognizer.search.lm-scale=2.0",
        "--speech-recognizer.search.rnn-scale=1.0",
        "--speech-recognizer.search.max-hyps=128",
        "--speech-recognizer.frontend.normalize=none",
        "--speech-recognizer.log-file=srn.log", cwd=cwd,
    )
    assert "WER: 0.0000" in out
    log = (workdir / "srn.log").read_text()
    assert "rnn fusion enabled" in log


def test_vtln_estimate_and_extract(tmp_path_factory):
    """VTLN tool workflow: estimate per-speaker alphas (grid search under
    a trained GMM), then extract warped features through the table.
    Speaker B's audio is spectrally stretched vs the training speaker, so
    its estimated alpha must move off 1.0 while speaker A stays at 1.0."""
    tmp = tmp_path_factory.mktemp("vtln")
    sys.path.insert(0, REPO)
    import json as _json

    from rasr_tpu.corpus.audio import write_wav

    rng = np.random.default_rng(5)
    sr = 16000
    base = {"a": 500.0, "b": 1800.0}

    def utt(scale):
        audio = [(0.002 * rng.normal(size=2400)).astype(np.float32)]
        for p in ("a", "b", "a"):
            t = np.arange(int(0.25 * sr)) / sr
            audio.append((0.3 * np.sin(2 * np.pi * base[p] * scale * t)).astype(np.float32))
            audio.append((0.002 * rng.normal(size=2400)).astype(np.float32))
        return np.concatenate(audio)

    xml = ['<corpus name="v">']
    for spk, scale, n in (("spkA", 1.0, 3), ("spkB", 1.18, 3)):
        for i in range(n):
            a = utt(scale)
            write_wav(str(tmp / f"{spk}{i}.wav"), a, sr)
            xml.append(
                f'<recording name="{spk}{i}" audio="{spk}{i}.wav">'
                f'<segment name="s" start="0" end="{len(a)/sr}">'
                f'<speaker name="{spk}"/><orth>ABA</orth></segment></recording>'
            )
    xml.append("</corpus>")
    (tmp / "v.corpus").write_text("".join(xml))
    (tmp / "lex.xml").write_text(
        "<lexicon><phoneme-inventory>"
        "<phoneme><symbol>a</symbol></phoneme><phoneme><symbol>b</symbol></phoneme>"
        "<phoneme><symbol>si</symbol><variation>none</variation></phoneme>"
        "</phoneme-inventory>"
        '<lemma special="silence"><orth>[SILENCE]</orth><phon>si</phon><synt/><eval/></lemma>'
        "<lemma><orth>ABA</orth><phon>a b a</phon></lemma></lexicon>"
    )
    cwd = str(tmp)
    # train a GMM on speaker A only (segment selection via partition of
    # a speaker-A-only corpus would be cleaner; the toy corpus is small
    # enough that training on both barely shifts the grid optimum)
    run_tool(
        "rasr_tpu.tools.acoustic_model_trainer",
        "--acoustic-model-trainer.action=train",
        "--acoustic-model-trainer.corpus-file=v.corpus",
        "--acoustic-model-trainer.lexicon-file=lex.xml",
        "--acoustic-model-trainer.states-per-phone=1",
        "--acoustic-model-trainer.iterations=4",
        "--acoustic-model-trainer.new-mixture-file=vt.mix",
        "--acoustic-model-trainer.frontend.normalize=none", cwd=cwd,
    )
    run_tool(
        "rasr_tpu.tools.acoustic_model_trainer",
        "--acoustic-model-trainer.action=estimate-vtln",
        "--acoustic-model-trainer.corpus-file=v.corpus",
        "--acoustic-model-trainer.lexicon-file=lex.xml",
        "--acoustic-model-trainer.states-per-phone=1",
        "--acoustic-model-trainer.mixture-file=vt.mix",
        "--acoustic-model-trainer.vtln-output-file=vtln.json",
        "--acoustic-model-trainer.frontend.normalize=none", cwd=cwd,
    )
    table = _json.loads((tmp / "vtln.json").read_text())
    assert set(table) == {"spkA", "spkB"}
    assert table["spkB"] != table["spkA"]  # warped speaker detected

    run_tool(
        "rasr_tpu.tools.feature_extraction",
        "--feature-extraction.corpus-file=v.corpus",
        "--feature-extraction.cache=vt.cache",
        "--feature-extraction.vtln-warp-file=vtln.json",
        "--feature-extraction.frontend.normalize=none", cwd=cwd,
    )
    listing = run_tool(
        "rasr_tpu.tools.archiver",
        "--archiver.mode=list", "--archiver.archive=vt.cache", cwd=cwd,
    )
    assert len(listing.splitlines()) == 6


def test_recognize_from_feature_cache(workdir):
    """Cache-driven recognition: --feature-cache decodes the cached
    features (no audio/frontend) with identical WER."""
    cwd = str(workdir)
    if not (workdir / "model.mix.npz").exists():
        test_full_tool_chain(workdir)
    out = run_tool(
        "rasr_tpu.tools.speech_recognizer",
        "--speech-recognizer.corpus-file=toy.corpus",
        "--speech-recognizer.lexicon-file=lexicon.xml",
        "--speech-recognizer.lm-file=lm.arpa",
        "--speech-recognizer.mixture-file=model.mix",
        "--speech-recognizer.states-per-phone=1",
        "--speech-recognizer.feature-cache=feat.cache",
        "--speech-recognizer.search.lm-scale=2.0",
        "--speech-recognizer.search.max-hyps=128", cwd=cwd,
    )
    assert "WER: 0.0000" in out


def test_estimate_cart_and_triphone_recognition(workdir):
    """Full triphone workflow: estimate-cart grows a tying tree from
    monophone alignments; recognition with --cart-file stays at 0 WER."""
    cwd = str(workdir)
    if not (workdir / "model.mix.npz").exists():
        test_full_tool_chain(workdir)
    run_tool(
        "rasr_tpu.tools.acoustic_model_trainer",
        "--acoustic-model-trainer.action=estimate-cart",
        "--acoustic-model-trainer.corpus-file=toy.corpus",
        "--acoustic-model-trainer.lexicon-file=lexicon.xml",
        "--acoustic-model-trainer.states-per-phone=1",
        "--acoustic-model-trainer.mixture-file=model.mix",
        "--acoustic-model-trainer.cart-output-file=cart.json",
        "--acoustic-model-trainer.cart-max-leaves=6",
        "--acoustic-model-trainer.frontend.normalize=none", cwd=cwd,
    )
    import json as _json
    tree = _json.loads((workdir / "cart.json").read_text())
    assert tree  # non-trivial tree artifact

    # retrain the GMM under the CART tying, then decode with it
    run_tool(
        "rasr_tpu.tools.acoustic_model_trainer",
        "--acoustic-model-trainer.action=train",
        "--acoustic-model-trainer.corpus-file=toy.corpus",
        "--acoustic-model-trainer.lexicon-file=lexicon.xml",
        "--acoustic-model-trainer.states-per-phone=1",
        "--acoustic-model-trainer.iterations=4",
        "--acoustic-model-trainer.cart-file=cart.json",
        "--acoustic-model-trainer.new-mixture-file=tri.mix",
        "--acoustic-model-trainer.frontend.normalize=none", cwd=cwd,
    )
    out = run_tool(
        "rasr_tpu.tools.speech_recognizer",
        "--speech-recognizer.corpus-file=toy.corpus",
        "--speech-recognizer.lexicon-file=lexicon.xml",
        "--speech-recognizer.lm-file=lm.arpa",
        "--speech-recognizer.mixture-file=tri.mix",
        "--speech-recognizer.states-per-phone=1",
        "--speech-recognizer.cart-file=cart.json",
        "--speech-recognizer.search.lm-scale=2.0",
        "--speech-recognizer.search.max-hyps=128",
        "--speech-recognizer.frontend.normalize=none", cwd=cwd,
    )
    assert "WER: 0.0000" in out


def test_train_mmi_action(workdir):
    """Lattice-based MMI (EBW) tool action: runs end-to-end from the ML
    model and the discriminatively trained model still decodes at 0 WER."""
    cwd = str(workdir)
    if not (workdir / "model.mix.npz").exists():
        test_full_tool_chain(workdir)
    run_tool(
        "rasr_tpu.tools.acoustic_model_trainer",
        "--acoustic-model-trainer.action=train-mmi",
        "--acoustic-model-trainer.corpus-file=toy.corpus",
        "--acoustic-model-trainer.lexicon-file=lexicon.xml",
        "--acoustic-model-trainer.lm-file=lm.arpa",
        "--acoustic-model-trainer.states-per-phone=1",
        "--acoustic-model-trainer.iterations=2",
        "--acoustic-model-trainer.mixture-file=model.mix",
        "--acoustic-model-trainer.new-mixture-file=mmi.mix",
        "--acoustic-model-trainer.frontend.normalize=none", cwd=cwd,
    )
    out = run_tool(
        "rasr_tpu.tools.speech_recognizer",
        "--speech-recognizer.corpus-file=toy.corpus",
        "--speech-recognizer.lexicon-file=lexicon.xml",
        "--speech-recognizer.lm-file=lm.arpa",
        "--speech-recognizer.mixture-file=mmi.mix",
        "--speech-recognizer.states-per-phone=1",
        "--speech-recognizer.search.lm-scale=2.0",
        "--speech-recognizer.search.max-hyps=128",
        "--speech-recognizer.frontend.normalize=none", cwd=cwd,
    )
    assert "WER: 0.0000" in out


def test_flf_structural_ops(workdir):
    """flf-tool union/intersect/map/scale/confidence ops (system
    combination surface). Self-union then self-intersection preserves
    the language, so the best path / WER must be unchanged."""
    cwd = str(workdir)
    assert (workdir / "lat.cache").exists()  # from test_full_tool_chain
    (workdir / "orth.map").write_text("ZZZ QQQ\n")
    out = run_tool(
        "rasr_tpu.tools.flf_tool",
        "--flf-tool.lattice-archive=lat.cache",
        "--flf-tool.second-archive=lat.cache",
        "--flf-tool.map-file=orth.map",
        "--flf-tool.corpus-file=toy.corpus",
        "--flf-tool.ops=scale union intersect map confidence best evaluate",
        "--flf-tool.output-archive=lat2.cache", cwd=cwd,
    )
    assert "WER: 0.0000" in out
    assert (workdir / "lat2.cache").exists()


AMT_COMMON = [
    "--acoustic-model-trainer.lexicon-file=lex.xml",
    "--acoustic-model-trainer.states-per-phone=1",
    "--acoustic-model-trainer.frontend.normalize=none",
]


@pytest.fixture(scope="module")
def gain_workdir(tmp_path_factory):
    """Two-speaker corpus with a large gain mismatch for speaker B
    (log-mel offset -> cepstral bias) + a GMM trained on speaker A only.
    The adaptation workflows (fMLLR, MLLR) must bridge the mismatch."""
    tmp = tmp_path_factory.mktemp("adapt")
    sys.path.insert(0, REPO)
    from rasr_tpu.corpus.audio import write_wav

    rng = np.random.default_rng(7)
    sr = 16000
    ph = {"a": 500.0, "b": 1800.0}

    def utt(words, amp):
        audio = [(amp / 100 * rng.normal(size=2400)).astype(np.float32)]
        for w in words:
            for p in {"AB": "ab", "BA": "ba"}[w]:
                t = np.arange(int(0.25 * sr)) / sr
                audio.append((amp * np.sin(2 * np.pi * ph[p] * t)).astype(np.float32))
            audio.append((amp / 100 * rng.normal(size=2400)).astype(np.float32))
        return np.concatenate(audio)

    texts = [["AB", "BA"], ["BA", "AB"], ["AB", "AB"]]
    recs = {"spkA": [], "spkB": []}
    for spk, amp in (("spkA", 0.3), ("spkB", 0.02)):
        for i, ws in enumerate(texts):
            a = utt(ws, amp)
            write_wav(str(tmp / f"{spk}{i}.wav"), a, sr)
            recs[spk].append(
                f'<recording name="{spk}{i}" audio="{spk}{i}.wav">'
                f'<segment name="s" start="0" end="{len(a)/sr}">'
                f'<speaker name="{spk}"/><orth>{" ".join(ws)}</orth></segment></recording>'
            )
    (tmp / "f.corpus").write_text(
        '<corpus name="f">' + "".join(recs["spkA"] + recs["spkB"]) + "</corpus>"
    )
    # training corpus: speaker A only — B is the mismatched test speaker
    (tmp / "fA.corpus").write_text(
        '<corpus name="f">' + "".join(recs["spkA"]) + "</corpus>"
    )
    (tmp / "lex.xml").write_text(
        "<lexicon><phoneme-inventory>"
        "<phoneme><symbol>a</symbol></phoneme><phoneme><symbol>b</symbol></phoneme>"
        "<phoneme><symbol>si</symbol><variation>none</variation></phoneme>"
        "</phoneme-inventory>"
        '<lemma special="silence"><orth>[SILENCE]</orth><phon>si</phon><synt/><eval/></lemma>'
        "<lemma><orth>AB</orth><phon>a b</phon></lemma>"
        "<lemma><orth>BA</orth><phon>b a</phon></lemma></lexicon>"
    )
    from rasr_tpu.models.lm.arpa import NgramLm

    NgramLm.train_from_text(texts, order=2).write_arpa(str(tmp / "f.arpa"))
    run_tool(
        "rasr_tpu.tools.acoustic_model_trainer",
        "--acoustic-model-trainer.action=train",
        "--acoustic-model-trainer.corpus-file=fA.corpus",
        "--acoustic-model-trainer.iterations=4",
        "--acoustic-model-trainer.new-mixture-file=f.mix",
        *AMT_COMMON, cwd=str(tmp),
    )
    return tmp


def test_fmllr_estimate_and_adapted_recognition(gain_workdir):
    """fMLLR tool workflow (the SAT surface): estimate per-speaker CMLLR
    transforms under a trained GMM, then recognize with --fmllr-file.
    Speaker B's transform must report a much larger likelihood gain than
    the matched speaker A; adapted recognition stays at 0 WER."""
    import json as _json

    tmp = gain_workdir
    cwd = str(tmp)
    common = AMT_COMMON
    out = run_tool(
        "rasr_tpu.tools.acoustic_model_trainer",
        "--acoustic-model-trainer.action=estimate-fmllr",
        "--acoustic-model-trainer.corpus-file=f.corpus",
        "--acoustic-model-trainer.mixture-file=f.mix",
        "--acoustic-model-trainer.fmllr-output-file=fmllr.json",
        "--acoustic-model-trainer.fmllr-min-count=50", *common, cwd=cwd,
        with_stderr=True,  # per-speaker gains are on the log channel
    )
    table = _json.loads((tmp / "fmllr.json").read_text())
    assert set(table) == {"spkA", "spkB"}
    # per-frame likelihood gain (logged per speaker): the gain-mismatched
    # speaker must gain much more from adaptation than the matched one
    import re as _re

    gains = dict(
        _re.findall(r"fmllr speaker speaker=(\S+).*?gain=([-\d.e+]+)", out)
    )
    assert float(gains["spkB"]) > float(gains["spkA"]) + 1.0
    assert float(gains["spkB"]) > 0.0

    out = run_tool(
        "rasr_tpu.tools.speech_recognizer",
        "--speech-recognizer.corpus-file=f.corpus",
        "--speech-recognizer.lexicon-file=lex.xml",
        "--speech-recognizer.lm-file=f.arpa",
        "--speech-recognizer.mixture-file=f.mix",
        "--speech-recognizer.states-per-phone=1",
        "--speech-recognizer.fmllr-file=fmllr.json",
        "--speech-recognizer.search.lm-scale=2.0",
        "--speech-recognizer.search.max-hyps=128",
        "--speech-recognizer.frontend.normalize=none", cwd=cwd,
    )
    assert "WER: 0.0000" in out

    # SAT iteration: accumulate adapted-space statistics + re-estimate
    run_tool(
        "rasr_tpu.tools.acoustic_model_trainer",
        "--acoustic-model-trainer.action=accumulate",
        "--acoustic-model-trainer.corpus-file=f.corpus",
        "--acoustic-model-trainer.mixture-file=f.mix",
        "--acoustic-model-trainer.fmllr-file=fmllr.json",
        "--acoustic-model-trainer.accumulator-file=sat.acc", *common, cwd=cwd,
    )
    run_tool(
        "rasr_tpu.tools.acoustic_model_trainer",
        "--acoustic-model-trainer.action=estimate",
        "--acoustic-model-trainer.accumulator-file=sat.acc",
        "--acoustic-model-trainer.mixture-file=f.mix",
        "--acoustic-model-trainer.new-mixture-file=sat.mix", *common, cwd=cwd,
    )
    assert (tmp / "sat.mix.npz").exists()


def test_rnn_lm_tool_rescoring(workdir):
    """flf-tool lattice rescoring with an RNN LM image (the reference's
    NN-LM rescoring path) + lm-util RNN perplexity."""
    cwd = str(workdir)
    from rasr_tpu.models.lm.rnn import RnnLm

    texts = [["AB", "BA"], ["BA", "AB"], ["AB", "AB"], ["BA", "BA"]]
    lm = RnnLm.train_from_text(texts, epochs=40)
    lm.save(str(workdir / "rnn_lm"))
    out = run_tool(
        "rasr_tpu.tools.flf_tool",
        "--flf-tool.lattice-archive=lat.cache",
        "--flf-tool.corpus-file=toy.corpus",
        "--flf-tool.lm-file=rnn_lm",
        "--flf-tool.lm-type=rnn",
        "--flf-tool.lm-scale=2.0",
        "--flf-tool.ops=rescore best evaluate", cwd=cwd,
    )
    assert "WER: 0.0000" in out
    out = run_tool(
        "rasr_tpu.tools.lm_util",
        "--lm-util.action=perplexity",
        "--lm-util.lm-file=rnn_lm",
        "--lm-util.lm-type=rnn",
        "--lm-util.corpus-file=toy.corpus", cwd=cwd,
    )
    assert json.loads(out.splitlines()[-1])["perplexity"] < 4.0


def test_sequence_mmi_training_action(workdir):
    """nn-trainer action=sequence-mmi-training: LF-MMI through a BLSTM
    encoder from corpus numerator graphs + phone-bigram denominator,
    warm-started from the CE model; hybrid recognition with the
    sequence-trained params stays at 0 WER."""
    cwd = str(workdir)
    if not (workdir / "align.cache").exists():
        test_align_nn_and_util_tools(workdir)
    out = run_tool(
        "rasr_tpu.tools.nn_trainer",
        "--nn-trainer.action=sequence-mmi-training",
        "--nn-trainer.model-type=blstm",
        "--nn-trainer.corpus-file=toy.corpus",
        "--nn-trainer.lexicon-file=lexicon.xml",
        "--nn-trainer.states-per-phone=1",
        "--nn-trainer.feature-cache=feat.cache",
        "--nn-trainer.alignment-cache=align.cache",
        "--nn-trainer.hidden-layers=16",
        "--nn-trainer.epochs=8",
        "--nn-trainer.learning-rate=0.005",
        "--nn-trainer.optimizer=adam",
        "--nn-trainer.params-file=mmi.msgpack", cwd=cwd,
        with_stderr=True,
    )
    assert (workdir / "mmi.msgpack").exists()
    import re as _re

    mmis = [float(m) for m in _re.findall(r"mmi_per_frame=([-\d.e+]+)", out)]
    assert len(mmis) >= 2 and mmis[-1] < mmis[0]  # the objective improves


def test_sequence_smbr_training_action(workdir):
    """nn-trainer action=sequence-smbr-training: lattice-free state-level
    sMBR (expected-accuracy objective over the phone-bigram denominator)
    against forced-alignment labels. The objective is -E[acc]/frame, so
    it must decrease; it also needs the alignment cache (labels)."""
    cwd = str(workdir)
    if not (workdir / "align.cache").exists():
        test_align_nn_and_util_tools(workdir)
    out = run_tool(
        "rasr_tpu.tools.nn_trainer",
        "--nn-trainer.action=sequence-smbr-training",
        "--nn-trainer.model-type=blstm",
        "--nn-trainer.corpus-file=toy.corpus",
        "--nn-trainer.lexicon-file=lexicon.xml",
        "--nn-trainer.states-per-phone=1",
        "--nn-trainer.feature-cache=feat.cache",
        "--nn-trainer.alignment-cache=align.cache",
        "--nn-trainer.hidden-layers=16",
        "--nn-trainer.epochs=8",
        "--nn-trainer.learning-rate=0.005",
        "--nn-trainer.optimizer=adam",
        "--nn-trainer.params-file=smbr.msgpack", cwd=cwd,
        with_stderr=True,
    )
    assert (workdir / "smbr.msgpack").exists()
    import re as _re

    objs = [float(m) for m in _re.findall(r"smbr_per_frame=([-\d.e+]+)", out)]
    # -E[acc]/frame: expected accuracy must improve materially from the
    # cold start (the deep-dive convergence check is the unit test
    # test_smbr_sequence_trainer_learns; this is the tool wiring)
    assert len(objs) >= 2 and objs[-1] < objs[0] - 0.05


def test_mllr_estimate_and_speaker_decode(gain_workdir):
    """Model-space MLLR tool workflow: per-speaker mean-adapted mixture
    sets + per-speaker decoding via the recognizer's --speaker filter.
    The mismatched speaker's adapted means must move far more than the
    matched speaker's, and its adapted decode is at 0 WER."""
    import json as _json

    tmp = gain_workdir
    cwd = str(tmp)
    run_tool(
        "rasr_tpu.tools.acoustic_model_trainer",
        "--acoustic-model-trainer.action=estimate-mllr",
        "--acoustic-model-trainer.corpus-file=f.corpus",
        "--acoustic-model-trainer.mixture-file=f.mix",
        "--acoustic-model-trainer.mllr-min-count=50",
        *AMT_COMMON, cwd=cwd,
    )
    index = _json.loads((tmp / "mllr-index.json").read_text())
    assert set(index) == {"spkA", "spkB"}
    from rasr_tpu.models.gmm import MixtureSet

    base = MixtureSet.load(str(tmp / "f.mix"))
    shift_a = np.abs(MixtureSet.load(str(tmp / index["spkA"])).means - base.means).mean()
    shift_b = np.abs(MixtureSet.load(str(tmp / index["spkB"])).means - base.means).mean()
    assert shift_b > 2.0 * shift_a

    out = run_tool(
        "rasr_tpu.tools.speech_recognizer",
        "--speech-recognizer.corpus-file=f.corpus",
        "--speech-recognizer.lexicon-file=lex.xml",
        "--speech-recognizer.lm-file=f.arpa",
        "--speech-recognizer.mixture-file=mllr-spkB.mix",
        "--speech-recognizer.speaker=spkB",
        "--speech-recognizer.states-per-phone=1",
        "--speech-recognizer.search.lm-scale=2.0",
        "--speech-recognizer.search.max-hyps=128",
        "--speech-recognizer.frontend.normalize=none", cwd=cwd,
    )
    assert "WER: 0.0000" in out and "/ 6 words" in out  # spkB only


def test_cache_driven_accumulation(workdir):
    """action=accumulate with feature+alignment caches is pure
    map-reduce over artifacts (no audio/frontend/aligner) and matches
    the audio-driven statistics exactly."""
    cwd = str(workdir)
    if not (workdir / "align.cache").exists():
        test_align_nn_and_util_tools(workdir)
    run_tool(
        "rasr_tpu.tools.acoustic_model_trainer",
        "--acoustic-model-trainer.action=accumulate",
        "--acoustic-model-trainer.feature-cache=feat.cache",
        "--acoustic-model-trainer.alignment-cache=align.cache",
        "--acoustic-model-trainer.mixture-file=model.mix",
        "--acoustic-model-trainer.accumulator-file=cache.acc", cwd=cwd,
    )
    run_tool(
        "rasr_tpu.tools.acoustic_model_trainer",
        "--acoustic-model-trainer.action=accumulate",
        "--acoustic-model-trainer.corpus-file=toy.corpus",
        "--acoustic-model-trainer.lexicon-file=lexicon.xml",
        "--acoustic-model-trainer.states-per-phone=1",
        "--acoustic-model-trainer.mixture-file=model.mix",
        "--acoustic-model-trainer.accumulator-file=audio.acc",
        "--acoustic-model-trainer.frontend.normalize=none", cwd=cwd,
    )
    from rasr_tpu.train.em import GmmAccumulator

    a = GmmAccumulator.load(str(workdir / "cache.acc"))
    b = GmmAccumulator.load(str(workdir / "audio.acc"))
    np.testing.assert_allclose(a.count, b.count, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(a.sum, b.sum, rtol=1e-3, atol=0.1)
