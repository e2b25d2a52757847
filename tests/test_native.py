"""C++ native codec: cross-validation against the L0 oracle, external C++
snappy, and google_crc32c."""

import pytest

from conftest import make_corpus_samples
from snappy_tpu import native
from snappy_tpu.errors import ChecksumError, CorruptError, UnsupportedError
from snappy_tpu.spec import framing, reference
from snappy_tpu.spec.crc32c import crc32c as py_crc32c

pytestmark = pytest.mark.skipif(not native.available(), reason="native build unavailable")

pa = pytest.importorskip("pyarrow")


def test_crc32c_parity(rng):
    for sample in make_corpus_samples(rng, sizes=(0, 1, 7, 8, 9, 1000, 65536)):
        assert native.crc32c(sample) == py_crc32c(sample)
    data = rng.randbytes(1000)
    assert native.crc32c(data[300:], native.crc32c(data[:300])) == py_crc32c(data)


def test_compress_matches_oracle_exactly(rng):
    # The native encoder implements the same reference algorithm as L0:
    # outputs must be byte-identical.
    for sample in make_corpus_samples(rng):
        assert native.compress(sample) == reference.compress(sample)


def test_decompress_parity(rng):
    for sample in make_corpus_samples(rng, sizes=(0, 1, 100, 65536, 70000)):
        comp = pa.compress(sample, codec="snappy", asbytes=True)
        assert native.decompress(comp) == sample


def test_decompress_corrupt():
    for stream in (b"\x05\x0cabcd", b"\x08\x0cabcd" + bytes([(3 << 2) | 1, 0]), b"\x02"):
        with pytest.raises(CorruptError):
            native.decompress(stream)


def test_framed_parity_with_oracle(rng):
    for sample in make_corpus_samples(rng, sizes=(0, 100, 65536, 200000)):
        ours = native.compress_framed(sample)
        # identical framing decisions -> identical bytes
        assert ours == framing.compress_framed(sample)
        assert native.decompress_framed(ours) == sample
        # cross: native decodes oracle framing and vice versa
        assert framing.decompress_framed(ours) == sample
        assert native.decompress_framed(framing.compress_framed(sample)) == sample


def test_framed_checksum_detection(rng):
    data = rng.randbytes(5000)
    framed = bytearray(native.compress_framed(data))
    framed[-1] ^= 0xFF
    with pytest.raises((ChecksumError, CorruptError)):
        native.decompress_framed(bytes(framed))


def test_framed_reserved_unskippable():
    stream = bytes.fromhex("ff060000") + b"sNaPpY" + bytes([0x30, 1, 0, 0, 0xAB])
    with pytest.raises(UnsupportedError):
        native.decompress_framed(stream)
