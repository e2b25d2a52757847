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
        b"a" * 5000,                      # offset-1 RLE
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
        for t in range(ntr & 0xFFFF):
            for s in range(NSUB):
                a = meta[2 * NSUB * t + s]
                qrel = a & 127
                assert int(qrel.max(initial=0)) <= W_ROWS - 2
                S = int(starts[t >> 5, (t & 31) * 4 + s]) & 1023
                assert 0 <= S <= rb - W_ROWS


def test_pallas_interpret_matches_np(rng):
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
                           interpret=True)
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
    tmp = np.empty((34000, 4), np.int32)  # per-call: thread-safety test
    nt = native.parse_tags(cb.tobytes(), read_uvarint(cb.tobytes(), 0)[1],
                           read_uvarint(cb.tobytes(), 0)[0], tmp)
    ntr = native.plan_flat(tmp, nt, cb, rb, meta, starts, pat)
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
        assert (meta[: 8 * (ntr & 0xFFFF)] == meta_py[: 8 * (ntr & 0xFFFF)]).all(), f"case {i}"
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
        assert ntr == ntr_py and (meta[: 8 * (ntr & 0xFFFF)] == meta_py[: 8 * (ntr & 0xFFFF)]).all(), name
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


def test_many_distinct_overlapping_copy_runs(rng):
    """300 distinct overlapping-copy runs (offsets 37..47) stress the
    mirror path end to end.  Bytes must stay exact in np and in the C++
    planner.  (Under planner v1 this exercised pattern-budget exhaustion;
    kept as a black-box regression.)"""
    parts = []
    for k in range(300):
        pat = rng.randbytes(37 + (k % 11))
        parts.append(pat * 5)  # overlapping copy, offset 37..47
    data = b"".join(parts)[:65000]
    cb, dlen, pieces, pat = _plan(data)
    meta, starts, ntr, bb, rb = _pack(cb, pieces, pat)
    out = execute_flat_np(meta, starts, ntr, bb, dlen)
    assert out.tobytes() == data
    ntr_c, meta_c, starts_c, pat_c = _native_plan(cb, rb)
    assert ntr_c == ntr
    assert (meta_c[: 8 * (ntr & 0xFFFF)] == meta[: 8 * (ntr & 0xFFFF)]).all()


def test_copy_of_copy_chains(rng):
    """Deep copy-of-copy chains with growing offsets: under planner v2
    these all ride mirrored runs resolved from the scratch decode.  seed
    data -> repeat -> re-copy slices with growing offsets."""
    base = rng.randbytes(997)
    data = bytearray(base)
    while len(data) < 60000:
        off = 100 + (len(data) * 7) % (len(data) - 200)
        ln = min(900, len(data) - off)
        data += bytes(data[-off:][:ln])  # snappy-expressible overlap mix
    data = bytes(data[:60000])
    cb, dlen, pieces, pat = _plan(data)
    meta, starts, ntr, bb, rb = _pack(cb, pieces, pat)
    assert execute_flat_np(meta, starts, ntr, bb, dlen).tobytes() == data
    ntr_c, meta_c, starts_c, pat_c = _native_plan(cb, rb)
    assert ntr_c == ntr and (meta_c[: 8 * (ntr & 0xFFFF)] == meta[: 8 * (ntr & 0xFFFF)]).all()


def test_pack_window_shrink(rng):
    """Pieces whose sources span more than W_ROWS rows inside one dst
    bin force the packer to shrink subpanels; invariants must hold and
    replay stays exact.  Long-range copies (offset ~60KB) interleaved
    with literals produce exactly that spread."""
    head = rng.randbytes(50000)
    tail = bytearray()
    for k in range(100):
        src = (k * 523) % 49000
        tail += head[src : src + 60] + bytes([k & 0xFF] * 4)
    data = head + bytes(tail)
    data = data[:65536]
    cb, dlen, pieces, pat = _plan(data)
    rb = rows_b_for(len(cb))
    pk = pack_trips(pieces, TRIP_CAP, rb)
    assert pk is not None
    meta, starts, ntr = pk
    for t in range(ntr & 0xFFFF):
        for s in range(NSUB):
            a = meta[2 * NSUB * t + s]
            assert int((a & 127).max(initial=0)) <= W_ROWS - 2
    bb = build_b_bytes(cb, pat, rb)
    assert execute_flat_np(meta, starts, ntr, bb, dlen).tobytes() == data


def test_native_planner_threaded_consistency(rng):
    """The C++ planner's thread_local state must not leak between
    interleaved plans of different blocks (the runtime pool planning
    pattern)."""
    from concurrent.futures import ThreadPoolExecutor

    blocks = [rng.randbytes(3000), b"ab" * 5000,
              (open("/root/repo/README.md", "rb").read() * 2)[:30000]] * 4
    expected = []
    for blk in blocks:
        cb, dlen, pieces, pat = _plan(blk)
        rb = rows_b_for(len(cb))
        meta, starts, ntr = pack_trips(pieces, TRIP_CAP, rb)
        expected.append((cb, rb, ntr, meta.copy()))

    def worker(args):
        blk, (cb, rb, ntr_py, meta_py) = args
        ntr, meta, starts, pat = _native_plan(cb, rb)
        return ntr == ntr_py and (meta[: 8 * (ntr & 0xFFFF)] == meta_py[: 8 * (ntr & 0xFFFF)]).all()

    with ThreadPoolExecutor(max_workers=4) as ex:
        assert all(ex.map(worker, zip(blocks, expected)))


def test_overlapping_copy_into_mismatched_period_run(rng):
    """Regression: an overlapping copy whose SOURCE lies inside an
    earlier periodic run but whose offset is NOT a multiple of that
    run's period (here off=4 into a period-7 run).  Planner v1's
    pattern-reuse branch kept period 7; the true output self-references
    with period 4.  Found as 3/768 corpus blocks decoding wrong on TPU;
    v2 replays the scratch decode so the case is structural, but the
    black-box check stays."""
    comp = np.frombuffer(b"and of ", np.uint8)
    recs = np.array([
        [0, 7, 0, 0],    # literal "and of " at 0
        [1, 35, 7, 7],   # copy off=7 len=35 -> period-7 run, out 7..42
        [1, 6, 4, 42],   # copy off=4 len=6, source 38..44 overlaps dst
    ], np.int32)
    # ground truth by direct emulation
    exp = bytearray(b"and of ")
    for _ in range(35):
        exp.append(exp[-7])
    for _ in range(6):
        exp.append(exp[-4])
    exp = bytes(exp)
    plan = plan_flat(recs, 3, comp)
    assert plan is not None
    pieces, pat = plan
    rb = rows_b_for(len(comp))
    meta, starts, ntr = pack_trips(pieces, TRIP_CAP, rb)
    out = execute_flat_np(meta, starts, ntr, build_b_bytes(comp, pat, rb),
                          len(exp))
    assert out.tobytes() == exp
    # C++ planner parity on the same records
    meta_c = np.empty((2 * NSUB * TRIP_CAP, VEC), np.int32)
    starts_c = np.empty((8, VEC), np.int32)
    pat_c = np.empty(DF.PAT_ROWS * VEC, np.uint8)
    g = native.plan_flat(recs, 3, comp, rb, meta_c, starts_c, pat_c)
    assert g == ntr
    out_c = execute_flat_np(meta_c, starts_c, g,
                            build_b_bytes(comp, pat_c, rb), len(exp))
    assert out_c.tobytes() == exp


def test_wide_corpus_sweep_np_contract(rng):
    """Breadth fuzz at production block count: 48 MB of corpus blocks
    through parse -> C++ plan -> np replay (the regression above was a
    3-in-768-blocks event; keep a wide net)."""
    from snappy_tpu.bench.corpus import make_corpus

    files = make_corpus(12 * 1024 * 1024, seed=29)
    data = b"".join(d for _, d in files)
    meta = np.empty((2 * NSUB * TRIP_CAP, VEC), np.int32)
    starts = np.empty((8, VEC), np.int32)
    pat = np.empty(DF.PAT_ROWS * VEC, np.uint8)
    bad = 0
    nblk = len(data) // 65536
    for k in range(nblk):
        blk = data[k * 65536 : (k + 1) * 65536]
        c = native.compress(blk)
        dlen, h = read_uvarint(c, 0)
        cb = np.frombuffer(c, np.uint8)
        nt = native.parse_tags(c, h, dlen, _TMP)
        rb = rows_b_for(len(cb))
        g = native.plan_flat(_TMP, nt, cb, rb, meta, starts, pat)
        assert g is not None, k
        out = execute_flat_np(meta, starts, g,
                              build_b_bytes(cb, pat, rb), dlen)
        bad += out.tobytes() != blk
    assert bad == 0, f"{bad}/{nblk} blocks wrong"


def test_empty_plan_executes():
    pieces = np.zeros((0, 3), np.int32)
    meta, starts, ntr = pack_trips(pieces, TRIP_CAP, rows_b_for(VEC))
    assert ntr == 0
    bb = np.zeros(rows_b_for(VEC) * VEC, np.uint8)
    assert execute_flat_np(meta, starts, ntr, bb, 0).size == 0


def test_trip_classes_are_homogeneous(rng):
    """pack_trips packs rot != 0 pieces into the leading trips and
    phase-aligned (rot == 0) pieces into the trailing n_aligned trips;
    the kernel's roll-free body depends on the trailing trips carrying
    NO rotation."""
    for data in _samples(rng):
        cb, dlen, pieces, pat = _plan(data)
        rb = rows_b_for(len(cb))
        pk = pack_trips(pieces, TRIP_CAP, rb)
        assert pk is not None
        meta, starts, ntr = pk
        n = ntr & 0xFFFF
        n_rot = n - (ntr >> 16)
        for t in range(n):
            for s in range(NSUB):
                a = meta[2 * NSUB * t + s]
                bw = meta[2 * NSUB * t + NSUB + s]
                valid = (bw & (1 << 21)) != 0
                rot = (a >> 7) & 127
                if t >= n_rot:  # aligned class: every valid piece rot==0
                    assert not (valid & (rot != 0)).any(), (t, s)
                # subpanels are rot-homogeneous: every valid piece's
                # rotation equals the starts word's rot field (the
                # kernel's single dynamic-shift roll depends on it)
                w = int(starts[t >> 5, (t & 31) * 4 + s])
                r0 = (w >> 20) & 127  # starts word: S | Dq<<10 | rot<<20
                assert not (valid & (rot != r0)).any(), (t, s, r0)


def test_aligned_majority_on_corpus(rng):
    """The planner's mirror phase-alignment must keep the bulk of
    corpus trips in the roll-free class (the round-2 decode perf story;
    guards against silent regression of the alignment heuristics)."""
    from snappy_tpu.bench.corpus import make_corpus

    files = make_corpus(4 * 1024 * 1024, seed=11)
    data = b"".join(d for _, d in files)
    meta = np.empty((2 * NSUB * TRIP_CAP, VEC), np.int32)
    starts = np.empty((8, VEC), np.int32)
    pat = np.empty(DF.PAT_ROWS * VEC, np.uint8)
    tot = aligned = 0
    for k in range(len(data) // 65536):
        blk = data[k * 65536 : (k + 1) * 65536]
        c = native.compress(blk)
        dlen, h = read_uvarint(c, 0)
        cb = np.frombuffer(c, np.uint8)
        nt = native.parse_tags(c, h, dlen, _TMP)
        g = native.plan_flat(_TMP, nt, cb, rows_b_for(len(cb)), meta,
                             starts, pat)
        assert g is not None
        tot += g & 0xFFFF
        aligned += g >> 16
    assert aligned / tot > 0.5, f"aligned {aligned}/{tot}"


def test_fused_planner_bit_identical_and_validating(rng):
    """plan_flat_fused (single-pass parse+plan, the production path)
    must produce bit-identical plans to parse_tags + plan_flat, and
    must reject corrupt streams exactly like parse_tags."""
    from snappy_tpu.errors import CorruptError

    meta2 = np.empty((2 * NSUB * TRIP_CAP, VEC), np.int32)
    starts2 = np.empty((8, VEC), np.int32)
    pat2 = np.empty(DF.PAT_ROWS * VEC, np.uint8)
    for i, data in enumerate(_samples(rng)):
        c = reference.compress(data)
        dlen, h = read_uvarint(c, 0)
        cb = np.frombuffer(c, np.uint8)
        rb = rows_b_for(len(cb))
        nt = native.parse_tags(c, h, dlen, _TMP)
        pieces, pat = plan_flat(_TMP, nt, cb)
        meta_py, starts_py, g_py = _pack(cb, pieces, pat)[:3]
        g = native.plan_flat_fused(cb, h, dlen, rb, meta2, starts2, pat2)
        assert g == g_py, f"case {i}"
        n = g & 0xFFFF
        assert (meta2[: 8 * n] == meta_py[: 8 * n]).all(), f"case {i}"
        assert (starts2 == starts_py).all(), f"case {i}"
    # corruption: truncated copy tag must raise, not plan garbage
    c = reference.compress(b"corrupt fused probe " * 2000)
    dlen, h = read_uvarint(c, 0)
    bad = np.frombuffer(c[:-3], np.uint8)
    try:
        native.plan_flat_fused(bad, h, dlen, rows_b_for(len(bad)),
                               meta2, starts2, pat2)
        raise AssertionError("truncated stream planned")
    except CorruptError:
        pass


def test_stage_flat_dec_parity_and_validation(rng):
    """sn_stage_flat_dec (plan + device B-row assembly in one call, the
    production staging path) must produce bit-identical plans to
    plan_flat_fused AND a B row whose replay reproduces the oracle
    bytes — with b_row passed uninitialized (np.empty), proving no
    piece ever gathers a byte the stager did not write."""
    from snappy_tpu.errors import CorruptError

    meta2 = np.empty((2 * NSUB * TRIP_CAP, VEC), np.int32)
    starts2 = np.empty((8, VEC), np.int32)
    pat2 = np.empty(DF.PAT_ROWS * VEC, np.uint8)
    meta3 = np.empty((2 * NSUB * TRIP_CAP, VEC), np.int32)
    starts3 = np.empty((8, VEC), np.int32)
    for i, data in enumerate(_samples(rng)):
        c = reference.compress(data)
        dlen, h = read_uvarint(c, 0)
        cb = np.frombuffer(c, np.uint8)
        rb = rows_b_for(len(cb))
        g = native.plan_flat_fused(cb, h, dlen, rb, meta2, starts2, pat2)
        b_row = np.full(rb * VEC, 0xEE, np.uint8)  # poison: unwritten
        g3 = native.stage_flat_dec(cb, h, dlen, rb, meta3, starts3, b_row)
        assert g3 == g, f"case {i}"
        n = g & 0xFFFF
        assert (meta3[: 8 * n] == meta2[: 8 * n]).all(), f"case {i}"
        assert (starts3 == starts2).all(), f"case {i}"
        out = execute_flat_np(meta3, starts3, g3, b_row, dlen)
        assert out.tobytes() == data, f"case {i}"
    # corruption must surface exactly like plan_flat_fused / parse_tags
    c = reference.compress(b"stage corrupt probe " * 2000)
    dlen, h = read_uvarint(c, 0)
    bad = np.frombuffer(c[:-3], np.uint8)
    rb = rows_b_for(len(bad))
    b_row = np.empty(rb * VEC, np.uint8)
    with pytest.raises(CorruptError):
        native.stage_flat_dec(bad, h, dlen, rb, meta3, starts3, b_row)


def test_stage_flat_dec_piece_cap_returns_none(rng):
    """Past a piece cap the stager returns None (caller falls back)."""
    data = rng.randbytes(8192)
    c = reference.compress(data)
    dlen, h = read_uvarint(c, 0)
    cb = np.frombuffer(c, np.uint8)
    rb = rows_b_for(len(cb))
    meta = np.empty((2 * NSUB * TRIP_CAP, VEC), np.int32)
    starts = np.empty((8, VEC), np.int32)
    b_row = np.empty(rb * VEC, np.uint8)
    assert native.stage_flat_dec(cb, h, dlen, rb, meta, starts, b_row,
                                 piece_cap=2) is None


class TestSegmentedRaw:
    """Large-raw device decode: segmented flat plans with a host-carried
    64 KiB history (sn_stage_flat_dec_seg + _decompress_raw_flat)."""

    def _foreign(self, data):
        import pyarrow as pa

        return pa.compress(data, codec="snappy", asbytes=True)

    def test_foreign_stream_roundtrip(self, monkeypatch):
        from snappy_tpu.bench.corpus import make_corpus
        from snappy_tpu.runtime import device_codec

        monkeypatch.setattr(device_codec, "_pallas_cache", True)
        monkeypatch.setattr(device_codec, "FLAT_MODE", "classify")
        data = b"".join(d for _, d in make_corpus(1 << 20, seed=31))[:400_000]
        raw = self._foreign(data)  # cross-64Ki copies (one C++ stream)
        assert device_codec.decompress(raw) == data

    def test_own_stream_and_boundary_sizes(self, monkeypatch):
        from snappy_tpu import native
        from snappy_tpu.runtime import device_codec

        monkeypatch.setattr(device_codec, "_pallas_cache", True)
        monkeypatch.setattr(device_codec, "FLAT_MODE", "classify")
        rng = np.random.default_rng(8)
        for n in (65_536, 65_537, 131_072 + 13, 200_000):
            data = (b"segmented raw " * 4096 + rng.bytes(n))[:n]
            raw = native.compress(data)
            assert device_codec.decompress(raw) == data, n

    def test_small_raw_selects_flat_engine(self, monkeypatch):
        """VERDICT r3 #5: in classify mode, raw streams of any size
        (here 1 KiB and 1 MiB) route through the segmented flat engine
        on TPU — the old 8 MiB threshold sent small streams to the slow
        jnp kernel.  (Flat v3 "id", the default, instead decodes raw
        host-destination streams with the host walk directly — see
        test_raw_id_mode_routing — and keeps the device for the
        decompress_to_device data-loader path.)"""
        from snappy_tpu import native
        from snappy_tpu.runtime import device_codec

        monkeypatch.setattr(device_codec, "_pallas_cache", True)
        monkeypatch.setattr(device_codec, "FLAT_MODE", "classify")
        calls = []
        real = device_codec._decompress_raw_flat

        def spy(data, dst_len, hdr):
            calls.append(dst_len)
            return real(data, dst_len, hdr)

        monkeypatch.setattr(device_codec, "_decompress_raw_flat", spy)
        for n in (1024, 1 << 20):
            data = (b"flat for every size " * 60000)[:n]
            raw = native.compress(data)
            assert device_codec.decompress(raw) == data
        assert calls == [1024, 1 << 20]

    def test_raw_id_mode_routing(self, monkeypatch):
        """Flat v3 routing contract: with a HOST destination the id
        walk IS the decode (no device round-trip — a raw stream has no
        CRC for the chip to verify), so _decompress_raw_flat must NOT
        run; the device path for raw is decompress_to_device."""
        from snappy_tpu import native
        from snappy_tpu.runtime import device_codec

        monkeypatch.setattr(device_codec, "_pallas_cache", True)
        monkeypatch.setattr(device_codec, "FLAT_MODE", "id")

        def boom(data, dst_len, hdr):  # pragma: no cover
            raise AssertionError("id mode must not take the device path")

        monkeypatch.setattr(device_codec, "_decompress_raw_flat", boom)
        data = (b"id mode raw " * 9000)[:100_000]
        raw = native.compress(data)
        assert device_codec.decompress(raw) == data

    def test_straddling_literal_and_copy(self, monkeypatch):
        """A literal spanning the 64 KiB segment boundary and a copy
        whose source lies wholly in the previous segment."""
        from snappy_tpu import native
        from snappy_tpu.runtime import device_codec

        monkeypatch.setattr(device_codec, "_pallas_cache", True)
        monkeypatch.setattr(device_codec, "FLAT_MODE", "classify")
        rng = np.random.default_rng(9)
        lit = rng.bytes(70_000)             # one huge literal straddles
        echo = lit[60_000:60_100] * 40      # matches reach across
        data = lit + echo + rng.bytes(10_000)
        raw = self._foreign(data)
        assert device_codec.decompress(raw) == data

    def test_truncated_raw_raises(self, monkeypatch):
        from snappy_tpu import native
        from snappy_tpu.errors import CorruptError
        from snappy_tpu.runtime import device_codec

        monkeypatch.setattr(device_codec, "_pallas_cache", True)
        monkeypatch.setattr(device_codec, "FLAT_MODE", "classify")
        rng = np.random.default_rng(10)
        raw = native.compress(rng.bytes(150_000))
        with pytest.raises(CorruptError):
            device_codec.decompress(raw[: len(raw) // 2])

    def test_seg_planner_parity_vs_host(self):
        """Per-segment planned+executed bytes equal the host decoder's
        at every boundary split of a compressible stream."""
        from snappy_tpu import native
        from snappy_tpu.runtime.device_codec import _decompress_raw_flat
        from snappy_tpu.spec.format import read_uvarint

        data = (b"the quick brown fox " * 9000)[:170_000]
        raw = native.compress(data)
        dst_len, hdr = read_uvarint(raw, 0)
        got = _decompress_raw_flat(raw, dst_len, hdr)
        assert got == data

    def test_giant_literal_spans_many_segments(self, monkeypatch):
        """A hand-built raw stream with one 300 KiB literal: the slice
        high-water tracking must stage only each segment's literal
        bytes (a slice measured to the walk position would blow the
        per-segment cap and force a spurious fallback)."""
        from snappy_tpu.runtime import device_codec
        from snappy_tpu.runtime.device_codec import _decompress_raw_flat
        from snappy_tpu.spec.format import put_uvarint, read_uvarint

        rng = np.random.default_rng(12)
        lit = rng.bytes(300_000)
        body = bytearray(put_uvarint(len(lit) + 8))
        n = len(lit) - 1
        body += bytes([63 << 2, n & 255, (n >> 8) & 255,
                       (n >> 16) & 255, (n >> 24) & 255])
        body += lit
        body += bytes([(3 << 2) | 2, 8, 0])   # tag2 copy: len 4, off 8
        body += bytes([1, 4])                 # tag1 copy: len 4, off 4
        raw = bytes(body)
        dst_len, hdr = read_uvarint(raw, 0)
        want = lit + lit[-8:-4] + lit[-8:-4]
        # oracle cross-check of the hand-built stream
        from snappy_tpu import native
        assert native.decompress(raw) == want[:dst_len]
        got = _decompress_raw_flat(raw, dst_len, hdr)
        assert got is not None, "giant literal forced a fallback"
        assert got == want[:dst_len]

    def test_seg_payload_past_sentinel(self):
        """Round-3 advisor high finding: payload pieces must be emitted
        slice-relative — a raw stream whose compressed payload crosses
        2^27 used to alias the mirror sentinel (absolute b >= 1<<27 was
        re-based as a mirror run), silently corrupting the decode.  This
        stages a >128 MiB single-literal stream segment by segment and
        np-executes the plans that straddle the sentinel."""
        from snappy_tpu import native
        from snappy_tpu.kernels.decode_flat import (
            NSUB,
            TRIP_CAP,
            VEC,
            execute_flat_np,
            rows_b_for,
        )
        from snappy_tpu.spec.format import put_uvarint, read_uvarint

        if not native.available():
            pytest.skip("native library unavailable")
        seg, cmax = 65536, 2 * 65536
        rng = np.random.default_rng(13)
        lit = rng.bytes((1 << 27) + 4 * seg)  # payload crosses 2^27
        body = bytearray(put_uvarint(len(lit)))
        n = len(lit) - 1
        body += bytes([63 << 2, n & 255, (n >> 8) & 255,
                       (n >> 16) & 255, (n >> 24) & 255])
        body += lit
        raw = np.frombuffer(bytes(body), np.uint8)
        dst_len, hdr = read_uvarint(bytes(body[:8]), 0)
        assert dst_len == len(lit)

        rb = rows_b_for(cmax)
        state = np.array([hdr, 0, 0, 0, 0, 0], np.int64)
        img = np.zeros(65536 + seg + 64, np.uint8)
        meta = np.empty((8 * TRIP_CAP, VEC), np.int32)
        starts = np.zeros((8, VEC), np.int32)
        b_row = np.empty(rb * VEC, np.uint8)
        nseg = (dst_len + seg - 1) // seg
        k_cross = ((1 << 27) - hdr - 5) // seg  # first seg past 2^27
        check = {0, k_cross - 1, k_cross, k_cross + 1, nseg - 1}
        done = 0
        for k in range(nseg):
            take = min(seg, dst_len - done)
            g = native.stage_flat_dec_seg(
                raw, dst_len, state, img, take, cmax, rb,
                meta, starts, b_row)
            assert g is not None, f"segment {k} fell back"
            if k in check:
                got = execute_flat_np(meta, starts, g, b_row, take)
                assert bytes(got) == lit[done:done + take], (
                    f"segment {k} corrupted (sentinel aliasing)")
            img[:65536] = img[take:take + 65536].copy()
            done += take
        assert done == dst_len
