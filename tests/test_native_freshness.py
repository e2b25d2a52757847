"""Stale-binary regression tests (round-2 postmortem).

BENCH_r02 crashed because a committed snappy_native.so predated the
checked-in C++ source and the loader used it blind.  The loader now
records sha256(snappy_native.cpp) at build time and rebuilds on any
mismatch — these tests red-green that gate.  Mirrors the reference's
verify-before-activate discipline (snappy/hashes.go:25-110).
"""

import os

import pytest

from snappy_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_loaded_library_matches_tree():
    """The .so actually loaded in this process was built from the
    checked-out source."""
    assert native._built_hash() == native._source_hash()
    assert native._so_is_fresh()


def test_stale_hash_triggers_rebuild(tmp_path):
    """Corrupting the recorded hash makes the loader rebuild rather than
    load the existing binary."""
    so_mtime_before = os.path.getmtime(native._SO)
    with open(native._HASH_FILE, "w") as f:
        f.write("0" * 64 + "\n")
    try:
        assert not native._so_is_fresh()
        assert native._build() == native._SO
        assert native._so_is_fresh()
        assert os.path.getmtime(native._SO) >= so_mtime_before
    finally:
        # leave the tree in a good state even if an assert fired mid-way
        if not native._so_is_fresh():
            native._build()


def test_missing_hash_file_is_stale():
    """A .so with no hash record (the exact round-2 checkout state) is
    never trusted."""
    saved = native._built_hash()
    os.remove(native._HASH_FILE)
    try:
        assert not native._so_is_fresh()
    finally:
        with open(native._HASH_FILE, "w") as f:
            f.write((saved or native._source_hash()) + "\n")
