"""Wave-group decoder: planner contract (np replay == oracle bytes),
pallas kernel parity (interpret mode), and planning invariants."""

import numpy as np
import pytest

from snappy_tpu.kernels.decode_wavegroup import (
    SLOTS,
    SPAN_BYTES,
    decode_blocks_wavegroup,
    execute_waves_np,
    pack_plan,
    plan_waves,
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
    words, g = plan_waves(_TMP, nt)
    return c, dlen, words, g


def _samples(rng):
    return [
        b"Wikipedia" * 3,
        b"a" * 5000,                      # offset-1 RLE -> doubling pieces
        b"ab" * 8000,                     # offset-2 RLE
        rng.randbytes(4000),              # literal-only
        (b"abcdefgh" * 600)[:4500],
        bytes(6000),
        rng.randbytes(50) + b"Q" * 3000 + rng.randbytes(50),
        (open("/root/repo/README.md", "rb").read() * 3)[:16384],
    ]


def test_planner_np_replay_matches_oracle(rng):
    for i, data in enumerate(_samples(rng)):
        c, dlen, words, g = _plan(data)
        out = execute_waves_np(words, g, np.frombuffer(c, np.uint8), dlen)
        assert out.tobytes() == data, f"case {i}"


def test_planner_invariants(rng):
    for data in _samples(rng):
        c, dlen, words, g = _plan(data)
        lens = words[:g, 1::2] >> 17
        dsts = words[:g, 1::2] & ((1 << 17) - 1)
        srcs = words[:g, 0::2] & ((1 << 17) - 1)
        isout = (words[:g, 0::2] >> 17) & 1
        used = lens > 0
        # group output spans within the cap
        for gi in range(g):
            u = used[gi]
            if not u.any():
                continue
            d0 = dsts[gi][u][0]
            assert (dsts[gi][u] + lens[gi][u] - d0 <= SPAN_BYTES).all()
            # copy sources end at or before the group start
            m = u & (isout[gi] == 1)
            assert (srcs[gi][m] + lens[gi][m] <= d0).all()
        assert (lens <= 128).all()
        # pieces tile the output exactly once, in order
        flat = [
            (int(d), int(l))
            for gi in range(g)
            for d, l in zip(dsts[gi][used[gi]], lens[gi][used[gi]])
        ]
        pos = 0
        for d, l in flat:
            assert d == pos
            pos += l
        assert pos == dlen


def test_kernel_parity_interpret(rng):
    samples = [s[:65536] for s in _samples(rng)]
    from conftest import make_corpus_samples

    samples += [s[:65536] for s in make_corpus_samples(rng, sizes=(65536,))]
    G_CAP = 8192
    B = len(samples)
    comp = np.zeros((B, 66560), np.uint8)
    ng = np.zeros(B, np.int32)
    wp = np.zeros((B, G_CAP // 8, 128), np.int32)
    for i, d in enumerate(samples):
        c, dlen, words, g = _plan(d)
        assert g <= G_CAP
        comp[i, : len(c)] = np.frombuffer(c, np.uint8)
        wp[i] = pack_plan(words, g, G_CAP)
        ng[i] = g
    out = np.asarray(
        decode_blocks_wavegroup(comp, wp, ng, out_max=65536, interpret=True)
    )
    for i, d in enumerate(samples):
        assert out[i, : len(d)].tobytes() == d, f"row {i}"


def test_plan_cap_overflow_returns_none():
    # a stream of single-byte literals needs one group per ~8 pieces;
    # with a tiny cap the planner must decline, not truncate
    data = bytes(range(256)) * 8
    c = reference.compress(data)
    dlen, h = read_uvarint(c, 0)
    nt = native.parse_tags(c, h, dlen, _TMP)
    assert plan_waves(_TMP, nt, cap_groups=1) is None


def test_empty_and_tiny(rng):
    for data in (b"x", b"ab", rng.randbytes(17)):
        c, dlen, words, g = _plan(data)
        out = execute_waves_np(words, g, np.frombuffer(c, np.uint8), dlen)
        assert out.tobytes() == data


def test_cpp_planner_matches_python(rng):
    """sn_plan_waves must reproduce the Python planner word-for-word."""
    for data in _samples(rng) + [rng.randbytes(30000)]:
        c = reference.compress(data)
        dlen, h = read_uvarint(c, 0)
        nt = native.parse_tags(c, h, dlen, _TMP)
        py = plan_waves(_TMP, nt)
        assert py is not None
        words_py, g_py = py
        words_c = np.zeros((16384, 16), np.int32)
        g_c = native.plan_waves(_TMP, nt, words_c)
        assert g_c == g_py
        assert (words_c[:g_c] == words_py[:g_py]).all()
    # cap overflow -> None, mirroring the Python planner
    data = bytes(range(256)) * 8
    c = reference.compress(data)
    dlen, h = read_uvarint(c, 0)
    nt = native.parse_tags(c, h, dlen, _TMP)
    tiny = np.zeros((1, 16), np.int32)
    assert native.plan_waves(_TMP, nt, tiny) is None
