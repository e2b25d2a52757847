"""Streaming framed (.sz) reader/writer — file-like incremental API.

The reference library exposes io.Reader/io.Writer wrappers around the
framed format; these are the equivalents.  Writer buffers to chunk
granularity and emits framed chunks on flush/close; Reader consumes
chunks incrementally and serves arbitrary read sizes.  Both route
per-chunk codec work through the backend registry, so the same classes
run on the oracle, native, or device backends.
"""

from __future__ import annotations

import io

from snappy_tpu.errors import (
    BadMagicError,
    ChecksumError,
    CorruptError,
    UnsupportedError,
)
from snappy_tpu.spec.format import (
    CHUNK_COMPRESSED,
    CHUNK_PADDING,
    CHUNK_STREAM_ID,
    CHUNK_UNCOMPRESSED,
    framed_chunk_type,
    MAX_CHUNK_UNCOMPRESSED,
    STREAM_ID_CHUNK,
    STREAM_ID_PAYLOAD,
    mask_crc,
    read_uvarint,
)

__all__ = ["FramedWriter", "FramedReader"]


def _crc(data: bytes) -> int:
    from snappy_tpu import native

    if native.available():
        return native.crc32c(data)
    from snappy_tpu.spec.crc32c import crc32c

    return crc32c(data)


class FramedWriter(io.RawIOBase):
    """Incremental framed compressor.

    with FramedWriter(open(path, 'wb')) as w:
        w.write(part1); w.write(part2)

    Chunks are accumulated and compressed `buffer_chunks` at a time
    through the backend's batched framed path (one device dispatch per
    batch instead of one per 64 KiB chunk — the relay costs ~50 ms per
    synchronized call, so per-chunk dispatch caps streaming at ~1 MB/s).
    Non-default chunk sizes use the per-chunk path.
    """

    def __init__(self, sink, chunk_size: int = MAX_CHUNK_UNCOMPRESSED,
                 backend: str | None = None, buffer_chunks: int = 64):
        if not 0 < chunk_size <= MAX_CHUNK_UNCOMPRESSED:
            raise ValueError("chunk_size must be in (0, 65536]")
        self._sink = sink
        self._chunk_size = chunk_size
        self._backend = backend
        self._batch_bytes = (
            buffer_chunks * chunk_size
            if chunk_size == MAX_CHUNK_UNCOMPRESSED and buffer_chunks > 1
            else chunk_size
        )
        self._buf = bytearray()
        self._wrote_header = False

    def writable(self) -> bool:
        return True

    def write(self, data) -> int:
        self._buf += bytes(data)
        while len(self._buf) >= self._batch_bytes:
            self._emit_batch(bytes(self._buf[: self._batch_bytes]))
            del self._buf[: self._batch_bytes]
        return len(data)

    def _emit_batch(self, data: bytes) -> None:
        """Compress a whole-chunk multiple through the backend's batched
        framed encoder and append its records (sans stream header)."""
        if len(data) <= self._chunk_size:
            self._emit(data)
            return
        from snappy_tpu import api

        if not self._wrote_header:
            self._sink.write(STREAM_ID_CHUNK)
            self._wrote_header = True
        blob = api.compress_framed(data, backend=self._backend)
        assert blob[: len(STREAM_ID_CHUNK)] == STREAM_ID_CHUNK
        self._sink.write(blob[len(STREAM_ID_CHUNK):])

    def _emit(self, chunk: bytes) -> None:
        from snappy_tpu import api

        if not self._wrote_header:
            self._sink.write(STREAM_ID_CHUNK)
            self._wrote_header = True
        checksum = mask_crc(_crc(chunk))
        body = api.compress(chunk, backend=self._backend)
        ctype = framed_chunk_type(len(chunk), len(body))
        if ctype == CHUNK_UNCOMPRESSED:
            body = chunk
        blen = len(body) + 4
        self._sink.write(
            bytes((ctype, blen & 0xFF, (blen >> 8) & 0xFF, (blen >> 16) & 0xFF))
        )
        self._sink.write(checksum.to_bytes(4, "little"))
        self._sink.write(body)

    def flush(self) -> None:
        if len(self._buf) > self._chunk_size:
            whole = len(self._buf) - (len(self._buf) % self._chunk_size)
            if whole > self._chunk_size:
                self._emit_batch(bytes(self._buf[:whole]))
                del self._buf[:whole]
        while self._buf:
            chunk = bytes(self._buf[: self._chunk_size])
            del self._buf[: self._chunk_size]
            self._emit(chunk)
        if not self._wrote_header:
            self._sink.write(STREAM_ID_CHUNK)
            self._wrote_header = True
        self._sink.flush()

    def close(self) -> None:
        if not self.closed:
            self.flush()
        super().close()


class FramedReader(io.RawIOBase):
    """Incremental framed decompressor over a file-like source.

    Large reads decode in BATCHES through the native threaded framed
    decoder (round 5: the per-chunk Python loop capped streaming at
    ~0.4-0.6 GB/s; batched it rides the 2+ GB/s path).  The batch size
    follows the caller's request — read(1 MB) prefetches ~16 chunks,
    read(100) stays single-chunk — so blocking behavior on slow
    sources (sockets, pipes) remains proportional to what was asked.
    """

    def __init__(self, source, verify_checksums: bool = True,
                 backend: str | None = None, buffer_chunks: int = 64):
        self._src = source
        self._verify = verify_checksums
        self._backend = backend
        self._buffer_chunks = max(1, buffer_chunks)
        self._pending = b""
        self._eof = False
        self._checked_magic = False

    def readable(self) -> bool:
        return True

    def _read_exact(self, n: int) -> bytes:
        out = b""
        while len(out) < n:
            got = self._src.read(n - len(out))
            if not got:
                raise CorruptError("truncated framed stream")
            out += got
        return out

    def _next_record(self):
        """Read one DATA chunk record (header + body) from the source,
        skipping stream-id/padding/skippable chunks; None at clean EOF.
        Validates types/sizes but does not decode."""
        while True:
            # sources may legally return short reads (sockets, pipes):
            # only a 0-byte *first* read is clean EOF
            hdr = self._src.read(4)
            if not hdr:
                return None
            while len(hdr) < 4:
                got = self._src.read(4 - len(hdr))
                if not got:
                    raise CorruptError("truncated chunk header")
                hdr += got
            ctype = hdr[0]
            blen = hdr[1] | (hdr[2] << 8) | (hdr[3] << 16)
            if not self._checked_magic:
                if ctype != CHUNK_STREAM_ID:
                    raise BadMagicError()
            if ctype == CHUNK_STREAM_ID:
                if self._read_exact(blen) != STREAM_ID_PAYLOAD:
                    raise BadMagicError()
                self._checked_magic = True
                continue
            if ctype == CHUNK_PADDING or 0x80 <= ctype <= 0xFD:
                self._read_exact(blen)
                continue
            if 0x02 <= ctype <= 0x7F:
                raise UnsupportedError(ctype)
            if blen < 4:
                raise CorruptError("chunk body shorter than checksum")
            return ctype, bytes(hdr), self._read_exact(blen)

    def _decode_record(self, ctype: int, body: bytes) -> bytes:
        from snappy_tpu import api

        stored = int.from_bytes(body[:4], "little")
        payload = body[4:]
        if ctype == CHUNK_COMPRESSED:
            # reject the declared size BEFORE decoding: a crafted
            # chunk claiming ~4GiB must not allocate/decode first
            dst_len, _ = read_uvarint(payload, 0)
            if dst_len > MAX_CHUNK_UNCOMPRESSED:
                raise CorruptError("chunk decodes to more than 64KiB")
            data = api.decompress(payload, backend=self._backend)
            if len(data) > MAX_CHUNK_UNCOMPRESSED:
                raise CorruptError("chunk decodes to more than 64KiB")
        else:
            if len(payload) > MAX_CHUNK_UNCOMPRESSED:
                raise CorruptError("uncompressed chunk larger than 64KiB")
            data = payload
        if self._verify:
            got = mask_crc(_crc(data))
            if got != stored:
                raise ChecksumError(stored, got)
        return data

    def _fill(self, want_chunks: int) -> bool:
        """Decode up to want_chunks records into _pending; False at
        clean EOF with nothing decoded."""
        from snappy_tpu import native

        want_chunks = max(1, min(want_chunks, self._buffer_chunks))
        records = []
        for _ in range(want_chunks):
            rec = self._next_record()
            if rec is None:
                break
            records.append(rec)
            if rec[0] == CHUNK_COMPRESSED:
                dst_len, _ = read_uvarint(rec[2], 4)
                if dst_len > MAX_CHUNK_UNCOMPRESSED:
                    raise CorruptError("chunk decodes to more than 64KiB")
        if not records:
            return False
        use_native = (len(records) > 1 and native.available()
                      and self._backend in (None, "native"))
        if use_native:
            blob = b"".join(
                (STREAM_ID_CHUNK,)
                + tuple(h + b for _t, h, b in records))
            self._pending = native.decompress_framed(
                blob, verify_checksums=self._verify, threads=0)
        else:
            self._pending = b"".join(
                self._decode_record(t, b) for t, _h, b in records)
        return True

    def read(self, n: int = -1) -> bytes:
        out = bytearray()
        while n < 0 or len(out) < n:
            if not self._pending:
                want = (self._buffer_chunks if n < 0 else
                        -(-(n - len(out)) // MAX_CHUNK_UNCOMPRESSED))
                if self._eof or not self._fill(want):
                    self._eof = True
                    break
            take = len(self._pending) if n < 0 else min(n - len(out), len(self._pending))
            out += self._pending[:take]
            self._pending = self._pending[take:]
        return bytes(out)
