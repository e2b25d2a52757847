"""Algorithm contract for the device match-finder (SURVEY.md §7.3.2).

The sort-based candidate search the pallas kernel (pallas_match.py)
implements on the MXU/VPU, expressed in exact numpy semantics.  Design
measured in round 3 (tools notes in docs/kernels.md): sorting the
4-byte v-words by (v, pos) yields, per position, the COLLISION-FREE
  * nearest previous occurrence of the same v (the best possible
    "last occurrence" a hash table could give), and
  * first occurrence of the same v (the long-range anchor),
and with exact match lengths capped at 64 the emission measures ~4%
SMALLER than the reference greedy encoder on the corpus mix (worse on
~1% of blocks — the runtime ratio-guards those per block).

Contract split (who computes what):
  device  — v-words, the (v, pos) sort, group scans, the packed
            candidate image in position order (`find_candidates`)
  host    — exact match lengths (`match_lengths`), parse + emission
            (encode_np._parse machinery / native sn_emit_from_cands)

Packing: one int32 per position, ``near | first << 16`` with 0xFFFF as
"none"; positions are block offsets < 65534 so the sentinel is safe.

The kernel pads every block to BMAX slots; positions >= npos (no full
4-byte word) carry pos-key BIG so they sort to the tail of their value
group and can never become another position's candidate.
"""

from __future__ import annotations

import numpy as np

BMAX = 65536          # block slots the kernel sorts (pow2, = max block)
NONE16 = 0xFFFF       # packed "no candidate" sentinel
BIG = 1 << 20         # pos key for invalid (tail) slots
ML_CAP = 64           # match-length cap (one snappy copy tag)

__all__ = [
    "BMAX", "NONE16", "ML_CAP",
    "vwords", "find_candidates", "unpack_candidates", "match_lengths",
    "best_matches", "encode_block_sortmatch",
]


def vwords(block: bytes | np.ndarray, slots: int = BMAX) -> np.ndarray:
    """uint32[slots] little-endian 4-byte words; the kernel's v image.

    Slots past ``len(block)`` read zero bytes (the kernel stages the
    block zero-padded), and the word at a position wraps nothing —
    positions >= npos are excluded from matching by construction, so
    only reproducibility matters here, not their values.
    """
    b = np.zeros(slots + 3, np.uint32)
    raw = np.frombuffer(bytes(block), np.uint8)
    b[: len(raw)] = raw
    return (b[:slots] | (b[1:slots+1] << 8) | (b[2:slots+2] << 16)
            | (b[3:slots+3] << 24)).astype(np.uint32)


def find_candidates(block: bytes | np.ndarray) -> np.ndarray:
    """int32[BMAX] packed candidates in position order (device contract).

    For every position p < npos = len(block)-3:
      near  = max{q < p : v[q] == v[p]}   (nearest previous same-v)
      first = min{q < p : v[q] == v[p]}   (first occurrence)
    packed as near | first << 16 (NONE16 where absent).  Positions
    >= npos pack NONE16 | NONE16 << 16.
    """
    n = len(block)
    npos = max(n - 3, 0)
    v = vwords(block)
    pos = np.arange(BMAX, dtype=np.int64)
    posk = np.where(pos < npos, pos, BIG + pos)  # invalid slots sort last
    order = np.lexsort((posk, v))                # sort by (v, pos-key)
    sv = v[order]
    sp = posk[order]
    same_prev = np.zeros(BMAX, bool)
    same_prev[1:] = sv[1:] == sv[:-1]

    near_s = np.full(BMAX, NONE16, np.int64)
    near_s[1:] = np.where(same_prev[1:], sp[:-1], NONE16)
    # group head position, propagated by segmented copy-scan
    headval = np.where(same_prev, -1, sp)
    headidx = np.maximum.accumulate(np.where(same_prev, -1, np.arange(BMAX)))
    first_s = headval[headidx]
    first_s = np.where(same_prev, first_s, NONE16)  # head itself: none

    # candidates must be real positions (invalid slots sort to group
    # tails, so a real slot never sees one; its own row is dropped here)
    valid_self = sp < BIG
    near_s = np.where(valid_self & (near_s < BIG), near_s, NONE16)
    first_s = np.where(valid_self & (first_s < BIG), first_s, NONE16)

    packed_s = np.where(valid_self, near_s | (first_s << 16),
                        NONE16 | (NONE16 << 16))
    out = np.empty(BMAX, np.int64)
    out[pos[order]] = packed_s  # scatter back to position order
    return out.astype(np.uint32).view(np.int32)


def unpack_candidates(packed: np.ndarray, npos: int) -> tuple[np.ndarray, np.ndarray]:
    """(near, first) int64 arrays with -1 for none, length = len(packed)."""
    u = packed.view(np.uint32).astype(np.int64)
    near = u & 0xFFFF
    first = u >> 16
    idx = np.arange(len(u))
    near = np.where((near != NONE16) & (idx < npos) & (near < idx), near, -1)
    first = np.where((first != NONE16) & (idx < npos) & (first < idx), first, -1)
    return near, first


def match_lengths(block: bytes | np.ndarray, p: np.ndarray, c: np.ndarray,
                  cap: int = ML_CAP) -> np.ndarray:
    """Exact byte match lengths between positions p and candidates c
    (host contract; native sn_emit_from_cands extends inline instead)."""
    b = np.frombuffer(bytes(block), np.uint8).astype(np.int64)
    n = len(b)
    m = np.zeros(len(p), np.int64)
    alive = np.ones(len(p), bool)
    for j in range(cap):
        ok = alive & (p + j < n) & (
            b[np.minimum(c + j, n - 1)] == b[np.minimum(p + j, n - 1)])
        m[ok] += 1
        alive = ok
    return np.minimum(m, np.minimum(cap, n - p))


def best_matches(block: bytes | np.ndarray,
                 packed: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
    """(cand, ml) int64[len(block)] — best of {near, first} by exact ml
    (ties to the nearer candidate), the encode_np-style match arrays."""
    n = len(block)
    npos = max(n - 3, 0)
    if packed is None:
        packed = find_candidates(block)
    near, first = unpack_candidates(packed[:n] if len(packed) > n else packed, npos)
    near, first = near[:n], first[:n]
    best_c = np.full(n, -1, np.int64)
    best_l = np.zeros(n, np.int64)
    for candk in (near, first):
        vi = np.where(candk >= 0)[0]
        if not len(vi):
            continue
        lk = match_lengths(block, vi, candk[vi])
        lk = np.where(lk >= 4, lk, 0)
        better = (lk > best_l[vi]) | ((lk == best_l[vi]) & (candk[vi] > best_c[vi]))
        ui = vi[better]
        best_c[ui] = candk[vi][better]
        best_l[ui] = lk[better]
    ml = np.where(best_c >= 0, best_l, 0)
    return best_c, ml


def encode_block_sortmatch(block: bytes | np.ndarray,
                           packed: np.ndarray | None = None) -> bytes:
    """Emission for one block from sort-derived candidates: greedy
    parse + prune (the np emission contract the native emitter
    mirrors).  Measured on the corpus mix: greedy-only is -3.7% vs the
    reference encoder (the lazy pass buys ~0.6pt more but doubles the
    host walk; the engine ratio-guards per block either way).  The
    _shift_starts pass is an identity under ML_CAP=64 — no copy can
    reach the 65..67 chop window, and any d-shift pays >= lit_cost(d)
    for at most 1 saved tag byte — and is kept here so the parity tests
    falsify that argument if the cap ever changes (the native emitter
    omits it).  No preamble — block body only."""
    from . import encode_np

    n = len(block)
    if n == 0:
        return b""
    if n < 4:
        from snappy_tpu.spec import reference as _oracle
        out = bytearray()
        _oracle.emit_literal(out, bytes(block))
        return bytes(out)
    cand, ml = best_matches(block, packed)
    pr = encode_np._parse(n, cand, ml, False)
    pr = encode_np._shift_starts(encode_np._prune(pr))
    return encode_np._emit(pr, bytes(block))
