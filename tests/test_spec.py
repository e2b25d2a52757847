"""L0 oracle tests: format constants, varint, block codec, CRC-32C,
framing — validated against golden vectors and the external C++ snappy
bundled in pyarrow (interop ground truth)."""

import sys

import pytest

import numpy as np

from conftest import make_corpus_samples
from snappy_tpu.errors import (
    BadMagicError,
    ChecksumError,
    CorruptError,
    TooLargeError,
    UnsupportedError,
)
import snappy_tpu.spec.crc32c
from snappy_tpu.spec import format as fmt

crcmod = sys.modules["snappy_tpu.spec.crc32c"]
from snappy_tpu.spec import framing, reference

pa = pytest.importorskip("pyarrow")


# --- varint ---------------------------------------------------------------

@pytest.mark.parametrize(
    "value,encoded",
    [
        (0, b"\x00"),
        (1, b"\x01"),
        (127, b"\x7f"),
        (128, b"\x80\x01"),
        (27, b"\x1b"),
        (65536, b"\x80\x80\x04"),
        (2**32 - 1, b"\xff\xff\xff\xff\x0f"),
    ],
)
def test_varint_golden(value, encoded):
    assert fmt.put_uvarint(value) == encoded
    assert fmt.read_uvarint(encoded) == (value, len(encoded))


def test_varint_too_long():
    with pytest.raises(CorruptError):
        fmt.read_uvarint(b"\xff\xff\xff\xff\xff\x01")


def test_varint_truncated():
    with pytest.raises(CorruptError):
        fmt.read_uvarint(b"\x80\x80")


def test_varint_too_large():
    with pytest.raises(TooLargeError):
        fmt.put_uvarint(2**32)


# --- block codec golden vectors ------------------------------------------

def test_wikipedia_golden():
    # SURVEY.md §8.1 worked example.
    src = b"Wikipedia" * 3
    out = reference.compress(src)
    assert out == b"\x1b\x20Wikipedia\x46\x09\x00"
    assert reference.decompress(out) == src


def test_empty():
    assert reference.compress(b"") == b"\x00"
    assert reference.decompress(b"\x00") == b""


def test_single_byte():
    assert reference.compress(b"a") == b"\x01\x00a"


def test_copy1_decode():
    # literal 'ab', copy1 len 4 offset 2 -> 'ababab'
    stream = b"\x06" + b"\x04ab" + b"\x01\x02"
    assert reference.decompress(stream) == b"ababab"


def test_copy4_decode():
    # copy4 tags are never emitted for <=64KiB blocks but must decode.
    stream = b"\x08" + b"\x0cabcd" + bytes([(3 << 2) | 3, 4, 0, 0, 0])
    assert reference.decompress(stream) == b"abcdabcd"


def test_overlapping_copy_rle():
    # literal 'a', copy1 len 8 offset 1 -> 'a'*9 (run semantics)
    stream = b"\x09" + b"\x00a" + bytes([(4 << 2) | 1, 1])
    assert reference.decompress(stream) == b"a" * 9


# --- decode error surface (SURVEY.md §8.3) --------------------------------

def test_zero_offset():
    stream = b"\x08" + b"\x0cabcd" + bytes([(3 << 2) | 1, 0])
    with pytest.raises(CorruptError):
        reference.decompress(stream)


def test_offset_before_start():
    stream = b"\x08" + b"\x0cabcd" + bytes([(3 << 2) | 2, 10, 0])
    with pytest.raises(CorruptError):
        reference.decompress(stream)


def test_length_overruns_output():
    stream = b"\x05" + b"\x0cabcd" + bytes([(60 << 2) | 2, 1, 0])
    with pytest.raises(CorruptError):
        reference.decompress(stream)


def test_short_decode():
    stream = b"\x0a" + b"\x0cabcd"  # claims 10, provides 4
    with pytest.raises(CorruptError):
        reference.decompress(stream)


def test_truncated_literal():
    stream = b"\x0a" + b"\x24abc"  # literal len 10, only 3 bytes follow
    with pytest.raises(CorruptError):
        reference.decompress(stream)


# --- round trips + C++ interop -------------------------------------------

def test_roundtrip_corpus(rng):
    for sample in make_corpus_samples(rng):
        comp = reference.compress(sample)
        assert reference.decompress(comp) == sample
        assert len(comp) <= fmt.max_encoded_len(len(sample))
        # C++ snappy decodes our output
        assert pa.decompress(comp, len(sample), codec="snappy", asbytes=True) == sample
        # we decode C++ snappy output
        theirs = pa.compress(sample, codec="snappy", asbytes=True)
        assert reference.decompress(theirs) == sample


def test_multi_block_fragmentation(rng):
    # >64KiB inputs are fragmented; each fragment self-contained.
    data = rng.randbytes(65536) + b"B" * 70000 + rng.randbytes(100)
    comp = reference.compress(data)
    assert reference.decompress(comp) == data
    assert pa.decompress(comp, len(data), codec="snappy", asbytes=True) == data


# --- CRC-32C --------------------------------------------------------------

def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crcmod.crc32c(b"") == 0
    assert crcmod.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crcmod.crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crcmod.crc32c(bytes(range(32))) == 0x46DD794E
    assert crcmod.crc32c(b"123456789") == 0xE3069283


def test_crc32c_vs_google(rng):
    google_crc32c = pytest.importorskip("google_crc32c")
    for sample in make_corpus_samples(rng, sizes=(0, 1, 7, 8, 9, 100, 4096)):
        assert crcmod.crc32c(sample) == int.from_bytes(
            google_crc32c.Checksum(sample).digest(), "big"
        )


def test_crc32c_incremental(rng):
    data = rng.randbytes(1000)
    c1 = crcmod.crc32c(data)
    c2 = crcmod.crc32c(data[300:], crcmod.crc32c(data[:300]))
    assert c1 == c2


def test_crc_combine(rng):
    a, b = rng.randbytes(123), rng.randbytes(4567)
    combined = crcmod.crc_combine(crcmod.crc32c(a), crcmod.crc32c(b), len(b))
    assert combined == crcmod.crc32c(a + b)


def test_crc32c_bulk(rng):
    rows = np.frombuffer(rng.randbytes(4 * 64), dtype=np.uint8).reshape(4, 64)
    lengths = np.array([0, 1, 33, 64])
    got = crcmod.crc32c_bulk(rows, lengths)
    for i in range(4):
        assert got[i] == crcmod.crc32c(rows[i, : lengths[i]].tobytes())


def test_mask_crc():
    # Round trip and the documented formula.
    for v in (0, 1, 0xDEADBEEF, 0xFFFFFFFF):
        assert fmt.unmask_crc(fmt.mask_crc(v)) == v
    assert fmt.mask_crc(0) == 0xA282EAD8


# --- framed format --------------------------------------------------------

def test_framed_roundtrip(rng):
    for sample in make_corpus_samples(rng, sizes=(0, 1, 100, 65536, 70000, 140000)):
        framed = framing.compress_framed(sample)
        assert framing.decompress_framed(framed) == sample
        assert framed.startswith(fmt.STREAM_ID_CHUNK)


def test_framed_uncompressed_fallback(rng):
    # Incompressible data must be stored as uncompressed chunks.
    data = rng.randbytes(70000)
    framed = framing.compress_framed(data)
    # overhead: stream id (10) + 2 chunks * (4 hdr + 4 crc)
    assert len(framed) <= len(data) + 10 + 2 * 8
    assert framing.decompress_framed(framed) == data


def test_framed_bad_magic():
    with pytest.raises(BadMagicError):
        framing.decompress_framed(b"\xff\x06\x00\x00sNaPpX" + b"xx")


def test_framed_checksum_error(rng):
    data = rng.randbytes(1000)
    framed = bytearray(framing.compress_framed(data))
    framed[-1] ^= 0xFF  # corrupt last payload byte
    with pytest.raises((ChecksumError, CorruptError)):
        framing.decompress_framed(bytes(framed))
    # but skipping verification tolerates a payload that still parses:
    # (flip inside an uncompressed chunk only alters data)


def test_framed_reserved_unskippable():
    stream = bytes(fmt.STREAM_ID_CHUNK) + bytes([0x30, 1, 0, 0, 0xAB])
    with pytest.raises(UnsupportedError):
        framing.decompress_framed(stream)


def test_framed_skippable_chunks_ignored():
    stream = (
        bytes(fmt.STREAM_ID_CHUNK)
        + bytes([fmt.CHUNK_PADDING, 3, 0, 0]) + b"pad"
        + bytes([0x80, 2, 0, 0]) + b"xy"
    )
    assert framing.decompress_framed(stream) == b""


def test_framed_truncation():
    data = framing.compress_framed(b"hello world hello world")
    with pytest.raises(CorruptError):
        framing.decompress_framed(data[:-3])


def test_framed_chunk_type_policy_single_point_of_truth():
    """format.framed_chunk_type is THE compressed-vs-uncompressed
    policy (VERDICT r2 weak #8); native sn_compress_framed must agree
    with it chunk-for-chunk across the 12.5%-savings boundary."""
    import numpy as np
    import pytest as _pytest

    from snappy_tpu.spec.format import (
        CHUNK_COMPRESSED,
        CHUNK_UNCOMPRESSED,
        framed_chunk_type,
    )

    # pure-policy edges
    assert framed_chunk_type(65536, 57343) == CHUNK_COMPRESSED
    assert framed_chunk_type(65536, 57344) == CHUNK_UNCOMPRESSED
    assert framed_chunk_type(8, 7) == CHUNK_UNCOMPRESSED
    assert framed_chunk_type(8, 6) == CHUNK_COMPRESSED

    native = _pytest.importorskip("snappy_tpu.native")
    if not native.available():
        _pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    # sweep compressibility so some chunks land each side of the policy
    for mix in (0.0, 0.55, 0.8, 1.0):
        n_rand = int(4096 * mix)
        data = (rng.integers(0, 256, n_rand, np.uint8).tobytes()
                + b"A" * (4096 - n_rand)) * 4
        framed = native.compress_framed(data, chunk_size=4096)
        # walk the chunks native emitted and re-derive the policy
        pos = 10
        idx = 0
        while pos < len(framed):
            ctype = framed[pos]
            body = int.from_bytes(framed[pos + 1 : pos + 4], "little")
            chunk = data[idx * 4096 : (idx + 1) * 4096]
            if ctype == CHUNK_UNCOMPRESSED:
                # policy says compressed body would not have saved 12.5%
                elem = native.compress(chunk)
                assert framed_chunk_type(len(chunk), len(elem)) == ctype
            else:
                assert ctype == CHUNK_COMPRESSED
                elem_len = body - 4
                assert framed_chunk_type(len(chunk), elem_len) == ctype
            pos += 4 + body
            idx += 1
