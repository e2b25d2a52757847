"""C++ native codec: cross-validation against the L0 oracle, external C++
snappy, and google_crc32c."""

import random

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


def test_framed_threads_param(rng):
    """Threaded framed encode/decode must be byte-compatible with the
    single-threaded path and round-trip exactly."""
    native = pytest.importorskip("snappy_tpu.native")
    if not native.available():
        pytest.skip("native library unavailable")
    data = (b"threads " * 40000)[:200000] + rng.randbytes(150000)
    base = native.compress_framed(data, threads=1)
    for th in (2, 4):
        blob = native.compress_framed(data, threads=th)
        assert blob == base  # deterministic regardless of thread count
        assert native.decompress_framed(blob, threads=th) == data
    from snappy_tpu.spec import framing

    assert framing.decompress_framed(base) == data


def test_framed_decode_error_surface(rng):
    native = pytest.importorskip("snappy_tpu.native")
    if not native.available():
        pytest.skip("native library unavailable")
    from snappy_tpu.errors import (
        BadMagicError, ChecksumError, CorruptError, SnappyError,
        UnsupportedError,
    )

    data = rng.randbytes(70000)
    blob = bytearray(native.compress_framed(data))
    # checksum flip
    bad = bytearray(blob)
    bad[-1] ^= 0xFF
    with pytest.raises((ChecksumError, CorruptError)):
        native.decompress_framed(bytes(bad))
    # reserved unskippable chunk type
    bad = bytes(blob) + bytes((0x05, 1, 0, 0, 0xAA))
    with pytest.raises((UnsupportedError, CorruptError, SnappyError)):
        native.decompress_framed(bad)
    # truncation
    with pytest.raises((CorruptError, SnappyError)):
        native.decompress_framed(bytes(blob[:-3]))
    # verify_checksums=False skips CRC but still decodes structure
    bad = bytearray(blob)
    bad[10 + 4] ^= 0xFF  # flip a crc byte of the first data chunk
    out = native.decompress_framed(bytes(bad), verify_checksums=False)
    assert out == data


def test_parse_tags_validates(rng):
    native = pytest.importorskip("snappy_tpu.native")
    if not native.available():
        pytest.skip("native library unavailable")
    import numpy as np
    from snappy_tpu.errors import CorruptError, SnappyError
    from snappy_tpu.spec import reference
    from snappy_tpu.spec.format import read_uvarint

    data = (b"parse tags " * 200)[:2000]
    c = reference.compress(data)
    _, h = read_uvarint(c, 0)
    rec = np.empty((4096, 4), np.int32)
    nt = native.parse_tags(c, h, len(data), rec)
    assert nt > 0
    # total output length of the records equals the decoded size
    assert int(rec[:nt, 1].sum()) == len(data)
    # corrupted element stream must raise, not emit bogus records
    bad = bytearray(c)
    bad[h] = 0xFE  # literal with absurd length header
    with pytest.raises((CorruptError, SnappyError)):
        native.parse_tags(bytes(bad), h, len(data), rec)


def test_into_variants_roundtrip_and_bounds():
    """Zero-allocation destination entries (round 5: the reused-buffer
    production path — fresh multi-GB outputs pay ~60 us/page in
    first-touch faults): byte parity with the allocating entries, and
    a too-small buffer must raise, never overflow."""
    if not native.available():
        pytest.skip("native library unavailable")
    import numpy as np

    rng = random.Random(77)
    data = (b"into the caller buffer " * 9000
            + bytes(rng.getrandbits(8) for _ in range(40_000)))[:200_000]
    arr = np.frombuffer(data, np.uint8)

    fr_buf = np.empty(native.framed_max_length(len(data)), np.uint8)
    fl = native.compress_framed_into(arr, fr_buf, threads=2)
    assert fr_buf[:fl].tobytes() == native.compress_framed(data, threads=2)

    out = np.empty(len(data), np.uint8)
    assert native.decompress_framed_into(fr_buf[:fl], out,
                                         threads=2) == len(data)
    assert out.tobytes() == data

    raw = native.compress(data)
    out[:] = 0
    assert native.decompress_into(raw, out) == len(data)
    assert out.tobytes() == data

    small = np.empty(10, np.uint8)
    with pytest.raises(ValueError):
        native.decompress_into(raw, small)
    with pytest.raises(ValueError):
        native.compress_framed_into(arr, small)
    with pytest.raises(ValueError):
        native.decompress_framed_into(fr_buf[:fl], small)


def test_compress_framed_crc_entry(rng):
    """sn_compress_framed_crc: supplied raw CRCs + no-stream-id
    concatenation + rec_lens record splitting are all byte-compatible
    with sn_compress_framed (the from-device assembly contract)."""
    import numpy as np

    CS = 65536
    for size in (1, CS - 1, CS, 2 * CS + 17, int(3.5 * CS)):
        data = bytes(make_corpus_samples(rng, sizes=(size,))[0])
        arr = np.frombuffer(data, np.uint8)
        ref = native.compress_framed(data)
        # host-CRC form (crcs=None) is exactly compress_framed
        assert native.compress_framed_crc(arr, len(data), None) == ref
        # supplied-raw-CRC form, per-record lengths, id skipped
        n_chunks = -(-len(data) // CS)
        crcs = np.array(
            [native.crc32c(data[c * CS:(c + 1) * CS])
             for c in range(n_chunks)], np.uint32)
        rl = np.zeros(n_chunks, np.uint64)
        body = native.compress_framed_crc(
            arr, len(data), crcs, write_id=False, rec_lens=rl)
        assert ref[:10] + body == ref
        assert int(rl.sum()) == len(body)
        # rec_lens splits at valid chunk-record boundaries
        offs = np.concatenate(([0], np.cumsum(rl.astype(np.int64))))
        recs = [body[offs[i]:offs[i + 1]] for i in range(n_chunks)]
        assert b"".join(recs) == body
        for r in recs:
            blen = r[1] | (r[2] << 8) | (r[3] << 16)
            assert len(r) == 4 + blen
    # a WRONG supplied CRC must land in the stream verbatim (masked),
    # i.e. the entry trusts the caller — decode then flags it
    data = bytes(make_corpus_samples(rng, sizes=(1000,))[0])
    bad = native.compress_framed_crc(
        np.frombuffer(data, np.uint8), len(data),
        np.array([0xDEADBEEF], np.uint32))
    with pytest.raises(ChecksumError):
        native.decompress_framed(bad)


def test_compress_framed_crc_guards():
    """The ctypes boundary validates crcs/rec_lens capacity before the
    C++ call reads them (OOB guard)."""
    import numpy as np

    data = np.frombuffer(b"guard checks " * 20000, np.uint8)
    n = data.nbytes
    with pytest.raises(ValueError):
        native.compress_framed_crc(data, n + 1, None)
    with pytest.raises(ValueError):
        native.compress_framed_crc(data, n, np.zeros(1, np.uint32))
    with pytest.raises(ValueError):
        native.compress_framed_crc(
            data, n, None, rec_lens=np.zeros(1, np.uint64))
    with pytest.raises(ValueError):
        native.compress_framed_crc(
            data, n, None, rec_lens=np.zeros(99, np.int64))
