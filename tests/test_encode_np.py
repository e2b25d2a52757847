"""Parallel encoder (numpy reference): round-trip parity, decodability by
external C++ snappy, and the BASELINE ratio bound (compressed size <= the
reference codec's on every input)."""


import numpy as np
import pytest

from conftest import make_corpus_samples
from snappy_tpu.kernels import encode_np
from snappy_tpu.spec import reference

pa = pytest.importorskip("pyarrow")


def ref_size(data: bytes) -> int:
    """The tighter of our oracle (go-style) and C++ snappy emissions."""
    return min(
        len(reference.compress(data)),
        len(pa.compress(data, codec="snappy", asbytes=True)),
    )


def test_roundtrip_and_ratio_corpus(rng):
    for sample in make_corpus_samples(rng):
        comp = encode_np.compress(sample)
        assert reference.decompress(comp) == sample
        if sample:
            assert (
                pa.decompress(comp, len(sample), codec="snappy", asbytes=True) == sample
            )
        assert len(comp) <= ref_size(sample), f"ratio regression on {sample[:40]!r}"


def test_golden_wikipedia():
    src = b"Wikipedia" * 3
    comp = encode_np.compress(src)
    assert reference.decompress(comp) == src
    assert len(comp) <= 14


@pytest.mark.parametrize("kind", range(6))
def test_ratio_fuzz(kind, rng):
    words = [bytes(rng.choices(b"abcdefgh ", k=rng.randint(2, 9))) for _ in range(50)]
    for trial in range(6):
        n = rng.randint(1, 70000)
        if kind == 0:
            t = rng.randbytes(n)
        elif kind == 1:
            t = b"".join(rng.choice(words) for _ in range(n // 5))[:n]
        elif kind == 2:
            unit = rng.randbytes(rng.randint(1, 200))
            t = (unit * (n // len(unit) + 1))[:n]
        elif kind == 3:
            t = bytes(rng.choices(range(4), k=n))
        elif kind == 4:
            t = bytearray(rng.randbytes(n))
            for _ in range(rng.randint(1, 8)):
                if n > 200:
                    srcp = rng.randint(0, n - 100)
                    dstp = rng.randint(0, n - 100)
                    lgt = rng.randint(4, 30)
                    t[dstp : dstp + lgt] = t[srcp : srcp + lgt]
            t = bytes(t)
        else:
            unit = bytes([rng.randint(65, 90)]) * rng.randint(3, 300) + rng.randbytes(
                rng.randint(0, 4)
            )
            t = (unit * (n // len(unit) + 1))[:n]
        comp = encode_np.compress(t)
        assert reference.decompress(comp) == t
        assert len(comp) <= ref_size(t), f"kind={kind} n={n}"


def test_match_finder_properties(nprng):
    # every reported match must be byte-exact (certification property)
    data = bytes(nprng.integers(0, 8, size=5000, dtype=np.uint8))
    cand, ml = encode_np.find_matches(data)
    b = np.frombuffer(data, dtype=np.uint8)
    for p in np.where(ml >= 4)[0][:200]:
        c, l = int(cand[p]), int(ml[p])
        assert 0 <= c < p
        assert data[c : c + l] == data[p : p + l]
        # maximality at the reported candidate
        if p + l < len(data):
            assert b[c + l] != b[p + l]


def test_empty_and_tiny():
    assert encode_np.compress(b"") == b"\x00"
    for n in range(1, 25):
        t = bytes(range(n))
        comp = encode_np.compress(t)
        assert reference.decompress(comp) == t
