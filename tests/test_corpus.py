"""Bliss corpus / lexicon / audio parsing tests."""

import numpy as np
import pytest

from rasr_tpu.corpus.audio import extract_segment, read_wav, write_wav, AudioData
from rasr_tpu.corpus.bliss import CorpusDescription
from rasr_tpu.corpus.lexicon import Lexicon, build_default_silence

CORPUS_XML = """<?xml version="1.0"?>
<corpus name="toy">
  <speaker-description name="spk1"><gender>female</gender></speaker-description>
  <recording name="rec1" audio="rec1.wav">
    <segment name="s1" start="0.0" end="1.0">
      <speaker name="spk1"/>
      <orth>HELLO WORLD</orth>
    </segment>
    <segment name="s2" start="1.0" end="2.5">
      <orth>GOOD BYE</orth>
    </segment>
  </recording>
  <subcorpus name="part2">
    <recording name="rec2" audio="rec2.wav">
      <segment name="s3" start="0.5" end="2.0"><orth>AGAIN</orth></segment>
    </recording>
  </subcorpus>
</corpus>
"""

LEXICON_XML = """<?xml version="1.0"?>
<lexicon>
  <phoneme-inventory>
    <phoneme><symbol>hh</symbol></phoneme>
    <phoneme><symbol>ah</symbol></phoneme>
    <phoneme><symbol>l</symbol></phoneme>
    <phoneme><symbol>ow</symbol></phoneme>
    <phoneme><symbol>si</symbol><variation>none</variation></phoneme>
  </phoneme-inventory>
  <lemma special="silence">
    <orth>[SILENCE]</orth><phon>si</phon>
    <synt/><eval/>
  </lemma>
  <lemma>
    <orth>HELLO</orth><orth>HULLO</orth>
    <phon score="0.0">hh ah l ow</phon>
    <phon score="0.7">hh l ow</phon>
  </lemma>
</lexicon>
"""


@pytest.fixture
def corpus(tmp_path):
    p = tmp_path / "toy.corpus"
    p.write_text(CORPUS_XML)
    return CorpusDescription.load(str(p))


def test_corpus_structure(corpus):
    segs = list(corpus.segments())
    assert [s.name for s in segs] == ["s1", "s2", "s3"]
    assert segs[0].full_name == "toy/rec1/s1"
    assert segs[2].full_name == "toy/part2/rec2/s3"
    assert segs[0].orth == "HELLO WORLD"
    assert segs[0].speaker == "spk1"
    assert corpus.speakers["spk1"].gender == "female"
    assert abs(segs[1].duration - 1.5) < 1e-9


def test_corpus_partitions(corpus):
    p0 = [s.name for s in corpus.segments(partition=0, num_partitions=2)]
    p1 = [s.name for s in corpus.segments(partition=1, num_partitions=2)]
    assert p0 + p1 == ["s1", "s2", "s3"]
    assert p0 and p1


def test_corpus_segment_list(corpus):
    segs = [s.name for s in corpus.segments(segment_list=["toy/rec1/s2"])]
    assert segs == ["s2"]


def test_corpus_include(tmp_path):
    (tmp_path / "sub.corpus").write_text(
        '<corpus name="sub"><recording name="r" audio="r.wav">'
        '<segment name="s" start="0" end="1"><orth>X</orth></segment>'
        "</recording></corpus>"
    )
    (tmp_path / "main.corpus").write_text(
        '<corpus name="main"><include file="sub.corpus"/></corpus>'
    )
    corpus = CorpusDescription.load(str(tmp_path / "main.corpus"))
    segs = list(corpus.segments())
    assert len(segs) == 1 and segs[0].full_name == "main/r/s"


def test_corpus_statistics(corpus):
    stats = corpus.statistics()
    assert stats["segments"] == 3
    assert abs(stats["total_duration_s"] - 4.0) < 1e-9


def test_lexicon(tmp_path):
    p = tmp_path / "lex.xml"
    p.write_text(LEXICON_XML)
    lex = Lexicon.load(str(p))
    assert len(lex.phonemes) == 5
    assert lex.phonemes["si"].context_independent
    assert not lex.phonemes["hh"].context_independent
    hello = lex.lookup_orth("HELLO")[0]
    assert lex.lookup_orth("HULLO")[0] is hello
    assert len(hello.pronunciations) == 2
    assert hello.pronunciations[1].score == 0.7
    syms = [lex.phonemes.by_id(i).symbol for i in hello.pronunciations[0].phonemes]
    assert syms == ["hh", "ah", "l", "ow"]
    sil = lex.silence
    assert sil is not None and sil.primary_orth == "[SILENCE]"
    assert sil.synt_tokens() == []  # empty <synt/> → no LM tokens
    assert sil.eval_tokens() == []  # empty <eval/> → not scored
    assert hello.synt_tokens() == ["HELLO"]


def test_default_silence():
    lex = Lexicon()
    lemma = build_default_silence(lex)
    assert lex.silence is lemma
    assert lex.phonemes["si"].context_independent


def test_wav_roundtrip(tmp_path, rng):
    samples = rng.normal(scale=0.1, size=16000).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, samples, 16000)
    audio = read_wav(path)
    assert audio.sample_rate == 16000
    assert audio.samples.shape == (16000,)
    np.testing.assert_allclose(audio.samples, samples, atol=1.0 / 32000)


def test_extract_segment():
    audio = AudioData(np.arange(16000, dtype=np.float32), 16000)
    seg = extract_segment(audio, 0.25, 0.5)
    assert seg.shape == (4000,)
    assert seg[0] == 4000.0


def test_gzipped_corpus_and_lexicon(tmp_path):
    """Reference parity: corpora/lexica routinely ship as .xml.gz."""
    import gzip

    cp = tmp_path / "toy.corpus.gz"
    with gzip.open(cp, "wt") as fh:
        fh.write(CORPUS_XML)
    corpus = CorpusDescription.load(str(cp))
    assert len(list(corpus.segments())) == 3

    lp = tmp_path / "lex.xml.gz"
    with gzip.open(lp, "wt") as fh:
        fh.write(LEXICON_XML)
    lex = Lexicon.load(str(lp))
    assert len(lex.phonemes) == 5
