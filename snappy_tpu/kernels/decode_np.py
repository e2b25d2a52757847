"""Parallel Snappy decoder — numpy reference implementation.

Algorithm contract for the device decoder (jnp / Pallas).  Decoding is
inherently sequential in two places; both become log-step parallel
primitives (SURVEY.md §7.3.1, PAPERS.md "Massively-Parallel Lossless
Data Decompression"):

  1. TAG BOUNDARIES.  Where each element starts depends on all previous
     element lengths.  We speculatively parse a tag at EVERY byte
     position (vectorized), giving a successor function next[p]; the true
     tag starts are the orbit of the first position under next, marked by
     pointer-doubling (log2(max_tags) gather+scatter rounds).

  2. COPY RESOLUTION.  A copy may reference bytes produced by any earlier
     element, including overlapping self-references (RLE).  Every output
     byte gets a source pointer: literal bytes point into the compressed
     input (encoded negative), copy bytes point to an earlier OUTPUT
     position (j - offset).  Pointer-doubling (ptr = ptr[ptr], 16 rounds)
     resolves every chain to a literal source; one final gather produces
     the bytes.

Validation mirrors the reference decoder's full error surface
(SURVEY.md §8.3): zero offsets, offsets reaching before the block start,
length overruns, truncated varints, and decoded-size mismatches all
raise CorruptError.
"""

from __future__ import annotations

import numpy as np

from snappy_tpu.errors import CorruptError
from snappy_tpu.spec.format import read_uvarint

__all__ = ["decompress", "decode_elements_np"]

_SENTINEL = np.int64(1) << 40  # "past the end" marker for next[]


def _parse_all_positions(comp: np.ndarray):
    """Speculative tag parse at every byte position (all vector ops).

    Returns (nxt, out_len, offset, lit_src, hdr_len) arrays of length n.
    """
    n = len(comp)
    b = comp.astype(np.int64)

    def shifted(k):
        out = np.zeros(n, dtype=np.int64)
        if n > k:
            out[: n - k] = b[k:]
        return out

    b0, b1, b2, b3, b4 = b, shifted(1), shifted(2), shifted(3), shifted(4)
    tag = b0 & 3
    x = b0 >> 2

    # literal header length and literal byte count
    lit_hdr = np.select(
        [x < 60, x == 60, x == 61, x == 62],
        [1, 2, 3, 4],
        default=5,
    )
    lit_len = (
        np.select(
            [x < 60, x == 60, x == 61, x == 62],
            [x, b1, b1 | (b2 << 8), b1 | (b2 << 8) | (b3 << 16)],
            default=b1 | (b2 << 8) | (b3 << 16) | (b4 << 24),
        )
        + 1
    )

    is_lit = tag == 0
    is_c1 = tag == 1
    is_c2 = tag == 2
    # copy4 otherwise

    hdr = np.select([is_lit, is_c1, is_c2], [lit_hdr, 2, 3], default=5)
    out_len = np.select(
        [is_lit, is_c1],
        [lit_len, 4 + ((b0 >> 2) & 7)],
        default=1 + x,
    )
    offset = np.select(
        [is_lit, is_c1, is_c2],
        [0, ((b0 & 0xE0) << 3) | b1, b1 | (b2 << 8)],
        default=b1 | (b2 << 8) | (b3 << 16) | (b4 << 24),
    )
    nxt = np.where(is_lit, lit_hdr + lit_len, hdr) + np.arange(n)
    lit_src = np.arange(n) + lit_hdr
    return nxt, out_len, offset, lit_src, hdr


def _mark_reachable(nxt: np.ndarray, start: int, n: int) -> np.ndarray:
    """Orbit of `start` under `nxt`, via pointer doubling.

    jump[p] after k rounds = position after 2^k elements; mark is
    propagated by scattering through jump.  log2 rounds over the array.
    """
    size = len(nxt)
    jump = np.minimum(nxt, size)  # clamp into [0, size]
    jump = np.where(jump < 0, size, jump)
    ext = np.concatenate([jump, [size]])  # slot `size` = absorbing sentinel
    mark = np.zeros(size + 1, dtype=bool)
    if start < size:
        mark[start] = True
    rounds = max(1, int(np.ceil(np.log2(max(2, size)))))
    for _ in range(rounds):
        targets = np.where(mark, ext, size)
        newmark = mark.copy()
        newmark[targets[mark]] = True
        if (newmark == mark).all():
            break
        mark = newmark
        ext2 = ext[np.minimum(ext, size)]
        ext = np.minimum(ext2, size)
    return mark[:size]


def decode_elements_np(comp: np.ndarray, start: int, dst_len: int) -> np.ndarray:
    """Decode the element stream comp[start:] into dst_len bytes."""
    n = len(comp)
    if dst_len == 0:
        if start != n:
            raise CorruptError("trailing bytes after empty stream")
        return np.zeros(0, dtype=np.uint8)
    if start >= n:
        raise CorruptError("decoded size differs from preamble")
    nxt, out_len, offset, lit_src, hdr = _parse_all_positions(comp)

    reached = _mark_reachable(nxt, start, n)
    tag_pos = np.where(reached)[0]

    # The walk must land exactly on n (the reachability clamp means a tag
    # overrunning the input just never marks n; detect by simulating the
    # final hop from the last reached tag).
    if len(tag_pos) == 0:
        raise CorruptError("no elements")
    last = tag_pos[-1]
    if nxt[last] != n:
        raise CorruptError("element overruns input")

    t_out = out_len[tag_pos]
    t_off = offset[tag_pos]
    t_lit = lit_src[tag_pos]
    t_is_lit = (comp[tag_pos] & 3) == 0

    out_start = np.zeros(len(tag_pos), dtype=np.int64)
    out_start[1:] = np.cumsum(t_out)[:-1]
    total = out_start[-1] + t_out[-1]
    if total != dst_len:
        raise CorruptError("decoded size differs from preamble")

    # validation
    if (t_out > dst_len - out_start).any():
        raise CorruptError("element overruns output")
    bad_copy = ~t_is_lit & ((t_off <= 0) | (t_off > out_start))
    if bad_copy.any():
        raise CorruptError("zero copy offset or offset before block start")
    if (t_is_lit & (t_lit + t_out > n)).any():
        raise CorruptError("literal overruns input")

    # per-output-byte tag id
    marks = np.zeros(dst_len, dtype=np.int64)
    marks[out_start] = 1
    tid = np.cumsum(marks) - 1

    j = np.arange(dst_len, dtype=np.int64)
    rel = j - out_start[tid]
    is_lit_b = t_is_lit[tid]
    ptr = np.where(is_lit_b, -(t_lit[tid] + rel) - 1, j - t_off[tid])

    # pointer doubling: copy bytes chase to a literal source (chains can
    # be as long as the output; log2 rounds with early exit)
    for _ in range(40):
        pos = ptr >= 0
        if not pos.any():
            break
        ptr = np.where(pos, ptr[np.maximum(ptr, 0)], ptr)
    return comp[(-ptr - 1)].astype(np.uint8)


def decompress(src: bytes) -> bytes:
    """Raw Snappy stream decode via the parallel algorithm."""
    comp = np.frombuffer(src, dtype=np.uint8)
    dst_len, hdr = read_uvarint(src, 0)
    return decode_elements_np(comp, hdr, dst_len).tobytes()
