"""Archive container tests (round-trip, append, tombstones, bundles)."""

import os

import numpy as np
import pytest

from rasr_tpu.utils.archive import (
    BundleArchive,
    FileArchive,
    open_archive,
    pack_ndarray,
    unpack_ndarray,
)


def test_roundtrip(tmp_path):
    path = str(tmp_path / "a.cache")
    with FileArchive(path, "w") as ar:
        ar.write("seg1", b"hello" * 100)
        ar.write("seg2", b"\x00\x01\x02")
    with FileArchive(path, "r") as ar:
        assert set(ar.keys()) == {"seg1", "seg2"}
        assert ar.read("seg1") == b"hello" * 100
        assert ar.read("seg2") == b"\x00\x01\x02"


def test_append_and_overwrite(tmp_path):
    path = str(tmp_path / "a.cache")
    with FileArchive(path, "w") as ar:
        ar.write("x", b"v1")
    with FileArchive(path, "a") as ar:
        ar.write("x", b"v2")
        ar.write("y", b"w")
    with FileArchive(path, "r") as ar:
        assert ar.read("x") == b"v2"
        assert ar.read("y") == b"w"


def test_tombstone(tmp_path):
    path = str(tmp_path / "a.cache")
    with FileArchive(path, "w") as ar:
        ar.write("x", b"v1")
        ar.delete("x")
    with FileArchive(path, "r") as ar:
        assert "x" not in ar


def test_index_staleness_rescan(tmp_path):
    path = str(tmp_path / "a.cache")
    with FileArchive(path, "w") as ar:
        ar.write("x", b"v1")
    # append without updating index
    ar2 = FileArchive(path, "a")
    ar2.write("y", b"v2")
    ar2._fh.flush()
    ar2._fh.close()  # bypass close() so .idx stays stale
    with FileArchive(path, "r") as ar:
        assert set(ar.keys()) == {"x", "y"}


def test_bundle(tmp_path):
    p1, p2 = str(tmp_path / "a1.cache"), str(tmp_path / "a2.cache")
    with FileArchive(p1, "w") as ar:
        ar.write("s1", b"one")
    with FileArchive(p2, "w") as ar:
        ar.write("s2", b"two")
    bundle = tmp_path / "all.bundle"
    bundle.write_text("a1.cache\na2.cache\n")
    br = open_archive(str(bundle))
    assert isinstance(br, BundleArchive)
    assert set(br.keys()) == {"s1", "s2"}
    assert br.read("s2") == b"two"
    br.close()


def test_ndarray_packing():
    arr = np.random.default_rng(0).normal(size=(17, 45)).astype(np.float32)
    data = pack_ndarray(arr)
    out = unpack_ndarray(data)
    np.testing.assert_array_equal(arr, out)
    assert out.dtype == np.float32


def test_native_scan_matches_python(tmp_path):
    """FileArchive's native index scan == the pure-python record walk
    (shadowing + tombstones included), so either path may serve opens."""
    import rasr_tpu.utils.native as native_mod
    from rasr_tpu.utils.archive import FileArchive

    path = str(tmp_path / "scan.cache")
    with FileArchive(path, "w") as ar:
        ar.write("a", b"first")
        ar.write("b", b"\x00" * 1000)  # compressible
        ar.write("a", b"second")      # shadows the first record
        ar.write("c", b"gone")
        ar.delete("c")                # tombstone
    import os
    os.remove(path + ".idx")  # force a scan on reopen

    ar = FileArchive(path, "r")
    native_index = dict(ar._index)
    ar.close()

    orig = native_mod.rtar_scan
    native_mod.rtar_scan = lambda p: None  # force the python fallback
    try:
        ar = FileArchive(path, "r")
        py_index = dict(ar._index)
        assert ar.read("a") == b"second"
        assert ar.read("b") == b"\x00" * 1000
        assert "c" not in ar
        ar.close()
    finally:
        native_mod.rtar_scan = orig

    if native_mod.load_native() is not None:
        assert native_index == py_index
        ar = FileArchive(path, "r")
        assert ar.read("a") == b"second"
        ar.close()
