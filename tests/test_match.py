"""Device match-finder: np contract, pallas kernel parity, native
emitter parity, and the ratio discipline (SURVEY.md §7.3.2)."""

import numpy as np
import pytest

from snappy_tpu import native
from snappy_tpu.kernels import encode_np, match_np, pallas_match
from snappy_tpu.spec import reference as oracle


def _rng():
    return np.random.default_rng(1234)


def _sample_blocks(rng, full=False):
    blocks = [
        b"",
        b"abc",
        b"abcabcabc",
        (b"the quick brown fox jumps over the lazy dog " * 200)[:6000],
        rng.bytes(3000),
        bytes(rng.integers(97, 102, 5000, dtype=np.uint8)),
    ]
    if full:
        blocks += [
            rng.bytes(65536),
            bytes(rng.integers(97, 102, 65536, dtype=np.uint8)),
            b"\x00" * 65536,
            bytes(range(256)) * 256,
        ]
    return blocks


def test_contract_candidates_brute():
    """find_candidates == brute-force nearest-prev/first-occ same-v."""
    rng = _rng()
    for blk in [
        b"abcabcabcxyzabc",
        bytes(rng.integers(97, 100, 700, dtype=np.uint8)),
        rng.bytes(300),
    ]:
        n = len(blk)
        npos = max(n - 3, 0)
        v = match_np.vwords(blk)[:npos]
        packed = match_np.find_candidates(blk)
        near, first = match_np.unpack_candidates(packed, npos)
        for p in range(match_np.BMAX if n < 50 else n):
            if p >= npos:
                assert packed[p] == np.int32(-1), p  # NONE|NONE<<16
                continue
            same = [q for q in range(p) if v[q] == v[p]]
            assert near[p] == (max(same) if same else -1), p
            assert first[p] == (min(same) if same else -1), p


def test_contract_ml_exact_brute():
    rng = _rng()
    blk = (rng.bytes(500) + b"needle in a haystack " * 100 + rng.bytes(500))
    b = np.frombuffer(blk, np.uint8)
    cand, ml = match_np.best_matches(blk)
    for p in rng.integers(4, len(blk) - 70, 150):
        c = cand[p]
        if c < 0:
            assert ml[p] == 0
            continue
        true = 0
        while (true < min(64, len(blk) - p)
               and b[p + true] == b[c + true]):
            true += 1
        assert ml[p] == min(true, 64), (p, c, ml[p], true)


def test_contract_roundtrip_and_ratio():
    """Emission decodes exactly; corpus blocks beat the reference
    encoder in aggregate (the engine ratio-guards the stragglers)."""
    from snappy_tpu.bench.corpus import make_corpus

    rng = _rng()
    for blk in _sample_blocks(rng):
        body = match_np.encode_block_sortmatch(blk)
        if len(blk):
            assert oracle.decode_block(body, len(blk)) == blk
        else:
            assert body == b""
    data = b"".join(d for _, d in make_corpus(1 << 20, seed=13))
    tot = ref = 0
    for i in range(0, len(data) - 65536, 65536):
        blk = data[i:i + 65536]
        tot += len(match_np.encode_block_sortmatch(blk))
        ref += len(native.compress(blk)) - 3
    assert tot < ref, (tot, ref)


def test_shift_starts_identity_under_cap():
    """The contract relies on _shift_starts being an identity when
    every copy length <= ML_CAP=64 (the native emitter omits the pass);
    falsify here if the argument ever breaks."""
    rng = _rng()
    for blk in _sample_blocks(rng, full=False) + [rng.bytes(20000)]:
        n = len(blk)
        if n < 4:
            continue
        cand, ml = match_np.best_matches(blk)
        assert ml.max(initial=0) <= match_np.ML_CAP
        pr = encode_np._prune(encode_np._parse(n, cand, ml, False))
        shifted = encode_np._shift_starts(pr)
        assert shifted.elems == pr.elems


def test_native_emit_parity():
    """sn_emit_from_cands is byte-exact to the np contract."""
    rng = _rng()
    for blk in _sample_blocks(rng, full=True):
        packed = np.ascontiguousarray(match_np.find_candidates(blk))
        assert native.emit_from_cands(blk, packed) == \
            match_np.encode_block_sortmatch(blk, packed)


def test_native_emit_fuzz_roundtrip():
    rng = _rng()
    for trial in range(30):
        n = int(rng.integers(0, 9000))
        kind = trial % 3
        if kind == 0:
            blk = rng.bytes(n)
        elif kind == 1:
            blk = bytes(rng.integers(97, 97 + 1 + trial % 6, n,
                                     dtype=np.uint8))
        else:
            piece = rng.bytes(max(1, n // 20))
            blk = (piece * 25)[:n]
        packed = np.ascontiguousarray(match_np.find_candidates(blk))
        body = native.emit_from_cands(blk, packed)
        if n:
            assert oracle.decode_block(body, n) == blk
        else:
            assert body == b""


@pytest.mark.parametrize("case", ["text", "random", "lowent", "tiny"])
def test_kernel_parity_interpret(case):
    """pallas_match (interpret mode) is bit-exact to the np contract."""
    rng = _rng()
    blk = {
        "text": (b"the quick brown fox jumps " * 600)[:12000],
        "random": rng.bytes(65536),
        "lowent": bytes(rng.integers(97, 102, 30000, dtype=np.uint8)),
        "tiny": b"abcabcabc",
    }[case]
    got = pallas_match.find_candidates_device([blk], interpret=True)[0]
    ref = match_np.find_candidates(blk).astype(np.int32)
    assert (got == ref).all()


def test_kernel_parity_batch_groups():
    """Batched dispatch (group > 1) keeps per-block npos plumbing."""
    rng = _rng()
    blocks = [b"aaaa" * 1000, rng.bytes(2000)]
    got = pallas_match.find_candidates_device(blocks, interpret=True,
                                              group=2)
    for i, blk in enumerate(blocks):
        ref = match_np.find_candidates(blk).astype(np.int32)
        assert (got[i] == ref).all(), i


def test_kernel_host_scatter_route():
    """home=False (sorted pairs + host scatter) matches the contract."""
    rng = _rng()
    blocks = [(b"scatter route " * 300)[:4000], rng.bytes(4096)]
    got = pallas_match.find_candidates_device(blocks, interpret=True,
                                              slots=4096, home=False)
    for i, blk in enumerate(blocks):
        ref = match_np.find_candidates(blk).astype(np.int32)[:4096]
        assert (got[i] == ref).all(), i
