"""Flat-plan encode emission: the packed plan replayed by the shared
flat executor must reproduce the host encoder's element byte-for-byte
(the ratio bound is structural), in numpy and in the pallas kernel
(interpret mode)."""

import numpy as np
import pytest

from snappy_tpu.kernels.decode_flat import VEC
from snappy_tpu.kernels.encode_flat import (
    ENC_TRIP_CAP,
    OUT_ROWS_ENC,
    RB_ENC,
    TAG_ROWS,
    build_b_enc,
    encode_blocks_flat,
    replay_enc_np,
)
from snappy_tpu.spec.format import read_uvarint

native = pytest.importorskip("snappy_tpu.native")
if not native.available():  # pragma: no cover
    pytest.skip("native library unavailable", allow_module_level=True)

_TMP = np.empty((34000, 4), np.int32)
_TAG_CAP = TAG_ROWS * VEC


def _plan_enc(block: bytes):
    c = native.compress(block)
    _, h = read_uvarint(c, 0)
    cb = np.frombuffer(c, np.uint8)
    nt = native.parse_tags(c, h, len(block), _TMP)
    meta = np.empty((8 * ENC_TRIP_CAP, VEC), np.int32)
    starts = np.empty((8, VEC), np.int32)
    tagbuf = np.empty(_TAG_CAP, np.uint8)
    r = native.plan_flat_enc(_TMP, nt, cb, RB_ENC, meta, starts, tagbuf)
    assert r is not None
    ntr, tag_used = r
    return c, meta, starts, ntr, tagbuf, tag_used


def _samples(rng):
    return [
        b"",
        b"x",
        b"Wikipedia" * 3,
        b"a" * 5000,
        b"ab" * 8000,
        rng.randbytes(4000),
        rng.randbytes(65536),
        bytes(6000),
        rng.randbytes(50) + b"Q" * 3000 + rng.randbytes(50),
        (open("/root/repo/README.md", "rb").read() * 3)[:16384],
        (open("/root/repo/README.md", "rb").read() * 12)[:65536],
    ]


def test_np_replay_equals_host_encoder(rng):
    for i, block in enumerate(_samples(rng)):
        c, meta, starts, ntr, tagbuf, tag_used = _plan_enc(block)
        bb = build_b_enc(np.frombuffer(block, np.uint8), tagbuf, tag_used)
        out = replay_enc_np(meta, starts, ntr, bb, len(c))
        assert out.tobytes() == c, f"case {i}"


def test_corpus_fuzz_np_replay(rng):
    from snappy_tpu.bench.corpus import make_corpus

    for name, data in make_corpus(256 * 1024, seed=13):
        block = data[:65536]
        c, meta, starts, ntr, tagbuf, tag_used = _plan_enc(block)
        bb = build_b_enc(np.frombuffer(block, np.uint8), tagbuf, tag_used)
        out = replay_enc_np(meta, starts, ntr, bb, len(c))
        assert out.tobytes() == c, name


def test_pallas_interpret_equals_host_encoder(rng):
    samples = [b for b in _samples(rng) if b]
    B = len(samples)
    b_u8 = np.zeros((B, RB_ENC * VEC), np.uint8)
    meta_b = np.zeros((B, 8 * ENC_TRIP_CAP, VEC), np.int32)
    starts_b = np.zeros((B, 8, VEC), np.int32)
    ntr_b = np.zeros(B, np.int32)
    comps = []
    for i, block in enumerate(samples):
        c, meta, starts, ntr, tagbuf, tag_used = _plan_enc(block)
        comps.append(c)
        b_u8[i] = build_b_enc(np.frombuffer(block, np.uint8), tagbuf, tag_used)
        meta_b[i] = meta
        starts_b[i] = starts
        ntr_b[i] = ntr
    out = np.asarray(
        encode_blocks_flat(b_u8, meta_b, starts_b, ntr_b, interpret=True)
    )
    for i, c in enumerate(comps):
        assert bytes(out[i][: len(c)]) == c, f"case {i}"


def test_inline_retry_on_tag_budget(rng):
    """~1900 distinct 24 B literals + copies overflow the 32 KiB tag
    buffer with inlining on (1900*25 B > cap); the planner must retry
    with inlining off and still replay exactly."""
    parts = []
    for k in range(1900):
        parts.append(rng.randbytes(24))   # unique literal
        parts.append(b"abcd" * 2)         # copyable filler
    block = b"".join(parts)[:60000]
    c, meta, starts, ntr, tagbuf, tag_used = _plan_enc(block)
    assert tag_used <= TAG_ROWS * VEC
    bb = build_b_enc(np.frombuffer(block, np.uint8), tagbuf, tag_used)
    assert replay_enc_np(meta, starts, ntr, bb, len(c)).tobytes() == c


def test_trip_cap_fallback_runtime_roundtrip(rng, monkeypatch):
    """Blocks whose plans exceed the encode caps must flow through the
    runtime's host-emission fallback transparently (the production
    compress path stays byte-correct)."""
    import snappy_tpu.kernels.encode_flat as EF
    from snappy_tpu.runtime import device_codec

    monkeypatch.setattr(device_codec, "_pallas_cache", True)
    # squeeze the cap so ordinary plans overflow -> fallback per chunk
    monkeypatch.setattr(EF, "ENC_TRIP_CAP", 1)
    data = (open("/root/repo/README.md", "rb").read() * 6)[:150000]
    blob = device_codec.compress_framed(data)
    assert device_codec.decompress_framed(blob) == data


def test_small_chunk_sizes_through_flat(rng, monkeypatch):
    """chunk_size < 64 KiB uses the same SRC span (zero padded); the
    production framed path must stay exact for every size."""
    from snappy_tpu.runtime import device_codec

    monkeypatch.setattr(device_codec, "_pallas_cache", True)
    data = rng.randbytes(3000) + b"pad" * 4000 + bytes(5000)
    for cs in (512, 1024, 65536):
        blob = device_codec.compress_framed(data, chunk_size=cs)
        assert device_codec.decompress_framed(blob) == data, cs


def test_incompressible_chunks_stay_uncompressed_type(rng, monkeypatch):
    """Random chunks must still be emitted as uncompressed chunk type
    (the framed assembly sizes the flat emission against the raw
    chunk)."""
    from snappy_tpu.runtime import device_codec
    from snappy_tpu.spec.framing import CHUNK_UNCOMPRESSED

    monkeypatch.setattr(device_codec, "_pallas_cache", True)
    data = rng.randbytes(130000)
    blob = device_codec.compress_framed(data)
    assert device_codec.decompress_framed(blob) == data
    # first chunk after the stream id must be type 0x01 (uncompressed)
    assert blob[10] == CHUNK_UNCOMPRESSED


def test_flat_engine_checksum_error(rng, monkeypatch):
    """A valid structure with a flipped CRC must surface ChecksumError
    through the flat decode engine's device-CRC path."""
    from snappy_tpu.errors import ChecksumError
    from snappy_tpu.runtime import device_codec

    monkeypatch.setattr(device_codec, "_pallas_cache", True)
    data = b"checksum probe " * 5000
    blob = bytearray(device_codec.compress_framed(data))
    blob[14] ^= 0x01  # CRC field of the first chunk (header 10 + 4)
    try:
        device_codec.decompress_framed(bytes(blob))
        raise AssertionError("corrupt CRC accepted")
    except ChecksumError:
        pass


def test_plan_piece_cap_returns_none(rng):
    block = rng.randbytes(65536)
    c = native.compress(block)
    _, h = read_uvarint(c, 0)
    cb = np.frombuffer(c, np.uint8)
    nt = native.parse_tags(c, h, len(block), _TMP)
    meta = np.empty((8 * ENC_TRIP_CAP, VEC), np.int32)
    starts = np.empty((8, VEC), np.int32)
    tagbuf = np.empty(_TAG_CAP, np.uint8)
    assert native.plan_flat_enc(_TMP, nt, cb, RB_ENC, meta, starts, tagbuf,
                                piece_cap=3) is None


def test_pieces_cover_element(rng):
    """Replay-level disjoint-cover check: every output byte of the
    element is written exactly once (zeros elsewhere)."""
    block = (open("/root/repo/SURVEY.md", "rb").read() * 4)[:65536]
    c, meta, starts, ntr, tagbuf, tag_used = _plan_enc(block)
    bb = build_b_enc(np.frombuffer(block, np.uint8), tagbuf, tag_used)
    # replay over an all-0xFF B buffer: bytes never sourced stay zero in
    # the output; with the real buffer the element reproduces exactly
    out_full = replay_enc_np(meta, starts, ntr, bb, OUT_ROWS_ENC * VEC)
    assert out_full[len(c):].max(initial=0) == 0
    assert out_full[: len(c)].tobytes() == c


def test_stage_flat_enc_parity(rng):
    """sn_stage_flat_enc (compress + plan + B-row assembly in one call,
    the production staging path) must reproduce the separate-call path
    exactly: element bytes, plans, and a replayable B row — with b_row
    uninitialized, proving no piece gathers an unwritten byte."""
    meta3 = np.empty((8 * ENC_TRIP_CAP, VEC), np.int32)
    starts3 = np.empty((8, VEC), np.int32)
    for i, block in enumerate(_samples(rng)):
        c, meta, starts, ntr, tagbuf, tag_used = _plan_enc(block)
        _, h = read_uvarint(c, 0)
        ba = np.frombuffer(block, np.uint8)
        b_row = np.full(RB_ENC * VEC, 0xEE, np.uint8)
        elem = np.empty(native.max_compressed_length(len(block)) + 8,
                        np.uint8)
        r, clen, hdr = native.stage_flat_enc(
            ba, RB_ENC, meta3, starts3, b_row, _TAG_CAP, elem)
        assert (r, clen, hdr) == (ntr, len(c), h), f"case {i}"
        assert elem[:clen].tobytes() == c, f"case {i}"
        n = ntr & 0xFFFF
        assert (meta3[: 8 * n] == meta[: 8 * n]).all(), f"case {i}"
        assert (starts3 == starts).all(), f"case {i}"
        out = replay_enc_np(meta3, starts3, r, b_row, clen)
        assert out.tobytes() == c, f"case {i}"


def test_stage_flat_enc_cap_fallback_gives_host_emission(rng):
    """Past a cap the stager returns (None, clen, hdr) and elem_out
    [:clen] is the exact host emission the caller uses directly."""
    block = rng.randbytes(16384)
    c = native.compress(block)
    ba = np.frombuffer(block, np.uint8)
    meta = np.empty((8 * ENC_TRIP_CAP, VEC), np.int32)
    starts = np.empty((8, VEC), np.int32)
    b_row = np.empty(RB_ENC * VEC, np.uint8)
    elem = np.empty(native.max_compressed_length(len(block)) + 8, np.uint8)
    r, clen, hdr = native.stage_flat_enc(
        ba, RB_ENC, meta, starts, b_row, _TAG_CAP, elem, piece_cap=2)
    assert r is None
    assert elem[:clen].tobytes() == c
