"""Streaming FramedWriter/FramedReader: incremental IO parity with the
one-shot framing, odd write/read granularities, error surface."""

import io

import pytest

from snappy_tpu.errors import BadMagicError, ChecksumError, CorruptError
from snappy_tpu.runtime.stream import FramedReader, FramedWriter
from snappy_tpu.spec import framing


def _backend():
    from snappy_tpu import native

    return "native" if native.available() else "oracle"


def test_writer_matches_oneshot(rng):
    data = b"streaming payload " * 5000 + rng.randbytes(10000)
    sink = io.BytesIO()
    with FramedWriter(sink, backend=_backend()) as w:
        for i in range(0, len(data), 7777):  # odd granularity
            w.write(data[i : i + 7777])
    blob = sink.getvalue()
    assert framing.decompress_framed(blob) == data


def test_reader_roundtrip(rng):
    data = rng.randbytes(3000) + b"pattern" * 9000
    blob = framing.compress_framed(data)
    r = FramedReader(io.BytesIO(blob), backend=_backend())
    out = bytearray()
    while True:
        got = r.read(1234)  # odd read size
        if not got:
            break
        out += got
    assert bytes(out) == data


def test_reader_read_all(rng):
    data = rng.randbytes(100000)
    blob = framing.compress_framed(data)
    assert FramedReader(io.BytesIO(blob), backend=_backend()).read() == data


def test_empty_stream():
    sink = io.BytesIO()
    with FramedWriter(sink, backend=_backend()) as w:
        pass
    blob = sink.getvalue()
    assert framing.decompress_framed(blob) == b""
    assert FramedReader(io.BytesIO(blob)).read() == b""


def test_reader_bad_magic():
    with pytest.raises(BadMagicError):
        FramedReader(io.BytesIO(b"not a stream at all")).read()


def test_reader_checksum(rng):
    data = rng.randbytes(5000)
    blob = bytearray(framing.compress_framed(data))
    blob[-1] ^= 0xFF
    with pytest.raises((ChecksumError, CorruptError)):
        FramedReader(io.BytesIO(bytes(blob)), backend=_backend()).read()


def test_reader_truncated(rng):
    blob = framing.compress_framed(rng.randbytes(5000))
    with pytest.raises(CorruptError):
        FramedReader(io.BytesIO(blob[:-2]), backend=_backend()).read()


def test_small_chunk_size(rng):
    data = rng.randbytes(10000)
    sink = io.BytesIO()
    with FramedWriter(sink, chunk_size=1000, backend=_backend()) as w:
        w.write(data)
    assert framing.decompress_framed(sink.getvalue()) == data


class _Dribble(io.RawIOBase):
    """Source that legally returns 1-byte short reads (socket-like)."""

    def __init__(self, blob: bytes):
        self._b = io.BytesIO(blob)

    def readable(self):
        return True

    def read(self, n=-1):
        return self._b.read(1 if n is None or n < 0 or n > 1 else n)


def test_reader_short_reads(rng):
    # ADVICE r1: a 4-byte header arriving one byte at a time must not
    # raise a spurious CorruptError
    data = rng.randbytes(20000)
    blob = framing.compress_framed(data)
    assert FramedReader(_Dribble(blob), backend=_backend()).read() == data


def test_reader_rejects_declared_size_before_decoding():
    # ADVICE r1: a chunk declaring a ~4GiB decoded length must be
    # rejected from the varint preamble, before any decode/allocation
    from snappy_tpu.spec.format import STREAM_ID_CHUNK, put_uvarint

    body = put_uvarint((1 << 32) - 1) + b"\x00" * 10
    blen = len(body) + 4
    blob = (
        STREAM_ID_CHUNK
        + bytes((0x00, blen & 0xFF, (blen >> 8) & 0xFF, (blen >> 16) & 0xFF))
        + b"\x00\x00\x00\x00"
        + body
    )
    with pytest.raises(CorruptError):
        FramedReader(io.BytesIO(blob), backend="oracle").read()


def test_writer_batched_parity(rng):
    # the batched flush path must produce a stream the oracle decodes,
    # identical to the backend's one-shot framing
    from snappy_tpu import api

    data = rng.randbytes(130000) + (b"compressible " * 30000)[:200000]
    sink = io.BytesIO()
    with FramedWriter(sink, backend=_backend(), buffer_chunks=2) as w:
        for i in range(0, len(data), 50000):  # misaligned writes
            w.write(data[i : i + 50000])
    blob = sink.getvalue()
    assert framing.decompress_framed(blob) == data
    assert blob == api.compress_framed(data, backend=_backend())


def test_writer_batched_device_backend(rng):
    # jnp backend: one device dispatch per buffered batch
    data = (b"device batch " * 40000)[:400000] + rng.randbytes(70000)
    sink = io.BytesIO()
    with FramedWriter(sink, backend="jnp", buffer_chunks=4) as w:
        w.write(data)
    assert framing.decompress_framed(sink.getvalue()) == data


def test_reader_writer_fuzz(rng):
    """Randomized write-slab / read-size fuzz over the streaming pair:
    arbitrary write granularity in, arbitrary read granularity out,
    batched and unbatched, always byte-exact."""
    import io

    import numpy as np

    from snappy_tpu.runtime.stream import FramedReader, FramedWriter

    nrng = np.random.default_rng(424242)
    for trial in range(6):
        n = int(nrng.integers(0, 400_000))
        data = (b"fuzz the stream " * 9000 + rng.randbytes(n))[:n]
        buf = io.BytesIO()
        w = FramedWriter(buf)
        i = 0
        while i < len(data):
            step = int(nrng.integers(1, 90_000))
            w.write(data[i:i + step])
            i += step
        w.close()
        src = io.BytesIO(buf.getvalue())
        r = FramedReader(src, buffer_chunks=int(nrng.integers(1, 8)))
        got = bytearray()
        while True:
            k = int(nrng.integers(1, 200_000))
            piece = r.read(k)
            if not piece:
                break
            got += piece
        assert bytes(got) == data, trial
