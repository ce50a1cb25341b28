"""Packed LM + native ARPA parser tests."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from rasr_tpu.models.lm.arpa import NgramLm
from rasr_tpu.models.lm.ngram_tpu import compile_ngram, score_batch
from rasr_tpu.models.lm.packed import PackedNgramLm, compile_packed
from rasr_tpu.utils.native import arpa_to_lmbin, load_native, rtar_read, rtar_scan


@pytest.fixture(scope="module")
def toy_lm():
    sents = [["a", "b", "c"], ["b", "a", "c"], ["a", "c", "b"], ["c", "a"]] * 3
    return NgramLm.train_from_text(sents, order=3)


def test_packed_matches_host_lm(toy_lm):
    packed = PackedNgramLm.from_ngram_lm(toy_lm)
    rng = np.random.default_rng(0)
    contexts = [()] + [g for g in toy_lm.ngrams if len(g) < toy_lm.order]
    for _ in range(100):
        h = contexts[rng.integers(len(contexts))]
        w = int(rng.choice(list(toy_lm.vocab.values())))
        np.testing.assert_allclose(
            packed.score(h, w), toy_lm.score(h, w), rtol=1e-5, atol=1e-6
        )
        assert packed.extended_history(h, w) == toy_lm.extended_history(h, w)


def test_packed_sequence_score(toy_lm):
    packed = PackedNgramLm.from_ngram_lm(toy_lm)
    np.testing.assert_allclose(
        packed.sequence_score(["a", "b", "c"]),
        toy_lm.sequence_score(["a", "b", "c"]),
        rtol=1e-5,
    )


def test_compile_packed_matches_compile_ngram(toy_lm):
    """Device tables from the packed path score identically."""
    t_ref = compile_ngram(toy_lm)
    packed = PackedNgramLm.from_ngram_lm(toy_lm)
    t_new = compile_packed(packed)
    assert t_new.order == t_ref.order
    rng = np.random.default_rng(1)
    # enumerate states of the packed layout via the packed lm itself
    contexts = [()] + [g for g in toy_lm.ngrams if len(g) < toy_lm.order]
    for _ in range(60):
        h = contexts[rng.integers(len(contexts))]
        w = int(rng.choice(list(toy_lm.vocab.values())))
        # resolve packed state id by walking from start via extended_history
        # — instead, compare scores via the host lm as common reference
        want = toy_lm.score(h, w)
        # packed state id: find row
        if h == ():
            sid = 0
        else:
            n = len(h)
            row = packed._find(h)
            assert row >= 0
            ofs = 1
            for k in range(n - 1):
                ofs += packed.ids[k].shape[0]
            sid = ofs + row
        cost, nxt = score_batch(
            t_new, jnp.asarray([sid], jnp.int32), jnp.asarray([w], jnp.int32)
        )
        np.testing.assert_allclose(float(cost[0]), want, rtol=1e-4, atol=1e-5)


def test_native_arpa_parser(tmp_path, toy_lm):
    if load_native() is None:
        pytest.skip("native toolchain unavailable")
    arpa = str(tmp_path / "toy.arpa")
    toy_lm.write_arpa(arpa)
    lmbin = str(tmp_path / "toy.lmbin")
    assert arpa_to_lmbin(arpa, lmbin)
    packed = PackedNgramLm.load_lmbin(lmbin)
    assert packed.order == toy_lm.order
    # native vocab ids differ; compare by symbol
    for seq in (["a", "b"], ["c", "a"], ["a", "b", "c"]):
        np.testing.assert_allclose(
            packed.sequence_score(seq), toy_lm.sequence_score(seq), rtol=1e-4
        )


def test_from_arpa_builds_cache(tmp_path, toy_lm):
    arpa = str(tmp_path / "toy.arpa")
    toy_lm.write_arpa(arpa)
    packed = PackedNgramLm.from_arpa(arpa)
    np.testing.assert_allclose(
        packed.sequence_score(["a", "b"]), toy_lm.sequence_score(["a", "b"]), rtol=1e-4
    )
    if load_native() is not None:
        assert os.path.exists(arpa + ".lmbin")


def test_native_rtar_matches_python(tmp_path):
    if load_native() is None:
        pytest.skip("native toolchain unavailable")
    from rasr_tpu.utils.archive import FileArchive

    path = str(tmp_path / "a.cache")
    with FileArchive(path, "w") as ar:
        ar.write("x", b"hello" * 200)
        ar.write("y", b"\x01\x02\x03")
        ar.write("x", b"updated")  # shadowing
        ar.write("z", b"gone")
        ar.delete("z")
    index = rtar_scan(path)
    assert set(index) == {"x", "y"}
    off, flags, raw, comp = index["x"]
    assert rtar_read(path, off, flags, raw, comp) == b"updated"
    off, flags, raw, comp = index["y"]
    assert rtar_read(path, off, flags, raw, comp) == b"\x01\x02\x03"


def test_compile_packed_empty_middle_order(toy_lm):
    """A sparse model with an EMPTY gram order must still compile (the
    vectorized row search used to index into the empty key array)."""
    packed = PackedNgramLm.from_ngram_lm(toy_lm)
    # blank out the bigram level entirely: 1-gram + 3-gram only
    packed.ids[1] = np.zeros((0, 2), np.int32)
    packed.cost[1] = np.zeros(0, np.float32)
    packed.backoff[1] = np.zeros(0, np.float32)
    packed._keys[1] = packed._keys[1][:0]
    tables = compile_packed(packed)
    # every lookup backs off to the unigram level (no bigram states/probes)
    states = jnp.zeros(4, jnp.int32)
    words = jnp.asarray([toy_lm.vocab["a"], toy_lm.vocab["b"],
                         toy_lm.vocab["c"], toy_lm.vocab["a"]], jnp.int32)
    costs, _ = score_batch(tables, states, words)
    for w, c in zip(["a", "b", "c", "a"], np.asarray(costs)):
        np.testing.assert_allclose(c, toy_lm.ngrams[(toy_lm.vocab[w],)][0],
                                   rtol=1e-5, atol=1e-6)


def test_big_table_packed_bucket_rows_exact(monkeypatch):
    """The 128-lane packed bucket-row layout (large-LM path) must give
    identical lookups to the pair-replicated layout (forced via the
    RASR_TPU_LM_REP_THRESHOLD test hook)."""
    import numpy as np

    from rasr_tpu.models.lm.arpa import NgramLm
    from rasr_tpu.models.lm.ngram_tpu import (
        compile_ngram, lookup_prepared, prepare_lookup,
    )

    rng = np.random.default_rng(3)
    vocab = {"<s>": 0, "</s>": 1, "<unk>": 2}
    for i in range(200):
        vocab[f"w{i}"] = len(vocab)
    ngrams = {}
    ids = list(vocab.values())
    for w in ids:
        ngrams[(w,)] = (float(rng.uniform(1, 9)), float(rng.uniform(0.1, 2)))
    for _ in range(900):
        a, b = rng.choice(ids), rng.choice(ids)
        ngrams[(int(a), int(b))] = (float(rng.uniform(1, 8)), 0.0)
    lm = NgramLm(2, vocab, ngrams)
    tables = compile_ngram(lm)
    assert tables.bucket_bits == 2
    states = np.asarray(rng.integers(0, tables.num_states, size=512), np.int32)
    words = np.asarray(rng.choice(ids, size=512), np.int32)
    ref = lookup_prepared(tables, prepare_lookup(tables), states, words)
    monkeypatch.setenv("RASR_TPU_LM_REP_THRESHOLD", "1")
    got = lookup_prepared(tables, prepare_lookup(tables), states, words)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
