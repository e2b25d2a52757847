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
