"""speech-recognizer tool (ref: src/Tools/SpeechRecognizer/).

Offline recognition over a corpus: frontend -> scorer -> prefix-tree
beam decode, with online WER against reference orth, per-segment
structured log records, and optional lattice archive output.

Config::

    [speech-recognizer]
    corpus-file = test.corpus
    lexicon-file = lexicon.xml
    lm-file = lm.arpa
    mixture-file = model.mix.npz      # or nn params via nn-* params
    lattice-archive = lattices.cache  # optional
    [speech-recognizer.search]
    max-hyps = 1024
    beam = 20.0
    lm-scale = 10.0
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..corpus.bliss import CorpusDescription
from ..corpus.lexicon import Lexicon
from ..models.gmm import MixtureSet
from ..models.hmm import HmmTopology, TransitionModel
from ..models.lm.arpa import NgramLm
from ..models.lm.ngram_tpu import compile_ngram
from ..models.scorer import GmmFeatureScorer
from ..models.tying import CartStateTying, MonophoneStateTying
from ..models.cart import CartTree
from ..pipeline.recognizer import OfflineRecognizer
from ..pipeline.visitor import CorpusVisitor
from ..search.decoder import BeamConfig, TreeDecoder
from ..search.tree import build_prefix_tree
from ..utils.component import ParameterFloat, ParameterInt, ParameterString
from .application import Application
from .feature_extraction import frontend_from_config


class SpeechRecognizerTool(Application):
    name = "speech-recognizer"
    description = "offline corpus recognition with WER and lattice output"

    corpus_file = ParameterString("corpus-file")
    audio_dir = ParameterString("audio-dir", default="")
    lexicon_file = ParameterString("lexicon-file")
    lm_file = ParameterString("lm-file")
    mixture_file = ParameterString("mixture-file")
    cart_file = ParameterString("cart-file", default="")
    lattice_archive = ParameterString("lattice-archive", default="")
    batch_size = ParameterInt("batch-size", default=8)
    am_scale = ParameterFloat("am-scale", default=1.0)
    states_per_phone = ParameterInt("states-per-phone", default=3)

    def run(self, args: List[str]) -> int:
        corpus = CorpusDescription.load(self.corpus_file, audio_dir=self.audio_dir)
        lexicon = Lexicon.load(self.lexicon_file)
        topology = HmmTopology(states_per_phone=self.states_per_phone)
        if self.cart_file:
            tying = CartStateTying(CartTree.load(self.cart_file), lexicon)
        else:
            tying = MonophoneStateTying(lexicon, topology)
        transitions = TransitionModel.from_config(self)
        mixtures = MixtureSet.load(self.mixture_file)
        scorer = GmmFeatureScorer(mixtures, scale=self.am_scale)
        lm = NgramLm.read_arpa(self.lm_file)
        tables = compile_ngram(lm)
        tree = build_prefix_tree(
            lexicon, tying, topology, transitions, lm_vocab=lm.vocab
        )
        search = self.select("search")
        cfg = BeamConfig(
            max_hyps=int(search.param("max-hyps", 1024)),
            beam=float(search.param("beam", 1e9)),
            word_end_limit=int(search.param("word-end-limit", 128)),
            root_hyps=int(search.param("root-hyps", 32)),
            lm_scale=float(search.param("lm-scale", 10.0)),
        )
        decoder = TreeDecoder(tree, tables, cfg)
        frontend = frontend_from_config(self)
        rec = OfflineRecognizer(
            frontend, scorer, decoder,
            lattice_archive=self.lattice_archive or None,
        )
        rec.run(CorpusVisitor(corpus, self.batch_size))
        report = rec.evaluator.report()
        self.log("recognition finished", **report)
        print(f"WER: {report['wer']:.4f} ({report['errors']} errors / {report['ref_len']} words)")
        return 0


if __name__ == "__main__":
    raise SystemExit(SpeechRecognizerTool.main())
