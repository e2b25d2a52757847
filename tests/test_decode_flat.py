"""Flat-plan decoder: planner contract (np replay of the packed plan ==
oracle bytes), pallas kernel parity in interpret mode (both the
take_along_axis and barrel-shifter lane alignments), and packing
invariants."""

import numpy as np
import pytest

import snappy_tpu.kernels.decode_flat as DF
from snappy_tpu.kernels.decode_flat import (
    NSUB,
    TRIP_CAP,
    VEC,
    W_ROWS,
    build_b_bytes,
    decode_blocks_flat,
    execute_flat_np,
    pack_trips,
    plan_flat,
    rows_b_for,
)
from snappy_tpu.spec import reference
from snappy_tpu.spec.format import read_uvarint

native = pytest.importorskip("snappy_tpu.native")
if not native.available():  # pragma: no cover
    pytest.skip("native library unavailable", allow_module_level=True)

_TMP = np.empty((34000, 4), np.int32)


def _plan(data: bytes):
    c = reference.compress(data)
    dlen, h = read_uvarint(c, 0)
    nt = native.parse_tags(c, h, dlen, _TMP)
    cb = np.frombuffer(c, np.uint8)
    pieces, pat = plan_flat(_TMP, nt, cb)
    return cb, dlen, pieces, pat


def _pack(cb, pieces, pat):
    rb = rows_b_for(len(cb))
    pk = pack_trips(pieces, TRIP_CAP, rb)
    assert pk is not None
    meta, starts, ntr = pk
    return meta, starts, ntr, build_b_bytes(cb, pat, rb), rb


def _samples(rng):
    return [
        b"",
        b"x",
        b"Wikipedia" * 3,
        b"a" * 5000,                      # offset-1 RLE -> one pattern
        b"ab" * 8000,                     # offset-2 RLE
        rng.randbytes(4000),              # literal-only
        (b"abcdefgh" * 600)[:4500],
        bytes(6000),
        rng.randbytes(50) + b"Q" * 3000 + rng.randbytes(50),
        (open("/root/repo/README.md", "rb").read() * 3)[:16384],
    ]


def test_planner_np_replay_matches_oracle(rng):
    for i, data in enumerate(_samples(rng)):
        cb, dlen, pieces, pat = _plan(data)
        meta, starts, ntr, bb, rb = _pack(cb, pieces, pat)
        out = execute_flat_np(meta, starts, ntr, bb, dlen)
        assert out.tobytes() == data, f"case {i}"


def test_pieces_cover_output_disjointly(rng):
    for data in _samples(rng):
        cb, dlen, pieces, pat = _plan(data)
        cover = np.zeros(dlen, np.int32)
        for b, dst, ln in pieces:
            assert ln >= 1
            assert dst // VEC == (dst + ln - 1) // VEC  # one dst row
            cover[dst : dst + ln] += 1
        assert (cover == 1).all()


def test_pack_respects_window_and_caps(rng):
    for data in _samples(rng):
        cb, dlen, pieces, pat = _plan(data)
        rb = rows_b_for(len(cb))
        pk = pack_trips(pieces, TRIP_CAP, rb)
        assert pk is not None
        meta, starts, ntr = pk
        for t in range(ntr):
            for s in range(NSUB):
                a = meta[2 * NSUB * t + s]
                qrel = a & 127
                assert int(qrel.max(initial=0)) <= W_ROWS - 2
                S = int(starts[t >> 5, (t & 31) * 4 + s])
                assert 0 <= S <= rb - W_ROWS


@pytest.mark.parametrize("use_take", [False, True])
def test_pallas_interpret_matches_np(rng, use_take):
    samples = [d for d in _samples(rng) if d]
    rbs, packed = [], []
    for data in samples:
        cb, dlen, pieces, pat = _plan(data)
        meta, starts, ntr, bb, rb = _pack(cb, pieces, pat)
        rbs.append(rb)
        packed.append((meta, starts, ntr, bb, dlen, data))
    rbmax = max(rbs)
    B = len(packed)
    b_u8 = np.zeros((B, rbmax * VEC), np.uint8)
    meta_b = np.zeros((B, 2 * NSUB * TRIP_CAP, VEC), np.int32)
    starts_b = np.zeros((B, 8, VEC), np.int32)
    ntr_b = np.zeros(B, np.int32)
    for i, (meta, starts, ntr, bb, dlen, data) in enumerate(packed):
        b_u8[i, : len(bb)] = bb
        meta_b[i] = meta
        starts_b[i] = starts
        ntr_b[i] = ntr
    out = np.asarray(
        decode_blocks_flat(b_u8, meta_b, starts_b, ntr_b, 65536,
                           interpret=True, use_take=use_take)
    )
    for i, (meta, starts, ntr, bb, dlen, data) in enumerate(packed):
        assert bytes(out[i][:dlen]) == data, f"case {i}"


def test_corpus_fuzz_np_contract(rng):
    from snappy_tpu.bench.corpus import make_corpus

    for name, data in make_corpus(256 * 1024, seed=7):
        blk = data[:65536]
        cb, dlen, pieces, pat = _plan(blk)
        meta, starts, ntr, bb, rb = _pack(cb, pieces, pat)
        out = execute_flat_np(meta, starts, ntr, bb, dlen)
        assert out.tobytes() == blk, name


def test_piece_cap_returns_none(rng):
    data = (open("/root/repo/README.md", "rb").read() * 3)[:16384]
    c = reference.compress(data)
    dlen, h = read_uvarint(c, 0)
    nt = native.parse_tags(c, h, dlen, _TMP)
    cb = np.frombuffer(c, np.uint8)
    assert plan_flat(_TMP, nt, cb, piece_cap=3) is None


def test_pack_cap_returns_none(rng):
    data = rng.randbytes(65536)  # literal rows, ~520 pieces
    cb, dlen, pieces, pat = _plan(data)
    rb = rows_b_for(len(cb))
    assert pack_trips(pieces, 1, rb) is None


def _native_plan(cb, rb):
    meta = np.empty((2 * NSUB * TRIP_CAP, VEC), np.int32)
    starts = np.empty((8, VEC), np.int32)
    pat = np.empty(DF.PAT_ROWS * VEC, np.uint8)
    nt = native.parse_tags(cb.tobytes(), read_uvarint(cb.tobytes(), 0)[1],
                           read_uvarint(cb.tobytes(), 0)[0], _TMP)
    ntr = native.plan_flat(_TMP, nt, cb, rb, meta, starts, pat)
    return ntr, meta, starts, pat


def test_native_planner_bitwise_parity(rng):
    """sn_plan_flat mirrors plan_flat + pack_trips decision-for-decision:
    meta, starts, trip count, and the pattern buffer are bit-identical."""
    for i, data in enumerate(_samples(rng)):
        cb, dlen, pieces, pat_py = _plan(data)
        rb = rows_b_for(len(cb))
        meta_py, starts_py, ntr_py = pack_trips(pieces, TRIP_CAP, rb)
        ntr, meta, starts, pat = _native_plan(cb, rb)
        assert ntr == ntr_py, f"case {i}"
        # meta rows beyond the packed trips are unspecified (the kernel
        # never reads them); compare the used region
        assert (meta[: 8 * ntr] == meta_py[: 8 * ntr]).all(), f"case {i}"
        assert (starts == starts_py).all(), f"case {i}"
        pad = np.zeros(DF.PAT_ROWS * VEC, np.uint8)
        pad[: len(pat_py)] = pat_py
        assert (pat == pad).all(), f"case {i}"


def test_native_planner_corpus_parity(rng):
    from snappy_tpu.bench.corpus import make_corpus

    for name, data in make_corpus(256 * 1024, seed=11):
        blk = data[:65536]
        cb, dlen, pieces, pat_py = _plan(blk)
        rb = rows_b_for(len(cb))
        meta_py, starts_py, ntr_py = pack_trips(pieces, TRIP_CAP, rb)
        ntr, meta, starts, pat = _native_plan(cb, rb)
        assert ntr == ntr_py and (meta[: 8 * ntr] == meta_py[: 8 * ntr]).all(), name
        out = execute_flat_np(meta, starts, ntr,
                              build_b_bytes(cb, pat, rb), dlen)
        assert out.tobytes() == blk, name


def test_native_planner_piece_cap(rng):
    data = rng.randbytes(65536)
    c = reference.compress(data)
    cb = np.frombuffer(c, np.uint8)
    rb = rows_b_for(len(cb))
    meta = np.empty((2 * NSUB * TRIP_CAP, VEC), np.int32)
    starts = np.empty((8, VEC), np.int32)
    pat = np.empty(DF.PAT_ROWS * VEC, np.uint8)
    nt = native.parse_tags(c, read_uvarint(c, 0)[1], 65536, _TMP)
    assert native.plan_flat(_TMP, nt, cb, rb, meta, starts, pat,
                            piece_cap=3) is None


def test_empty_plan_executes():
    pieces = np.zeros((0, 3), np.int32)
    meta, starts, ntr = pack_trips(pieces, TRIP_CAP, rows_b_for(VEC))
    assert ntr == 0
    bb = np.zeros(rows_b_for(VEC) * VEC, np.uint8)
    assert execute_flat_np(meta, starts, ntr, bb, 0).size == 0
