"""Pallas TPU encoder: sequential-per-block greedy matcher, emission-
exact to the reference encoder.

Reproduces, decision for decision, the classic greedy hash-table
encodeBlock that the ratio target is measured against (SURVEY.md §8.1;
spec/reference.py is the oracle) — probe/insert with the skip
heuristic, 4-byte match verification, vectorized match extension, the
reference's copy length-chopping rules, and the post-match double-
insert.  Byte-identical emission makes the "compressed size <= the
reference on every input" bound structural on this path: the output IS
the reference encoding.

Machinery shared with the decoder (pallas_decode): bytes live as int32
[rows, 128] in VMEM, unaligned 128-byte windows are one dynamic sublane
slice + one `pltpu.roll` + a lane select, and emissions are merge+
overshoot row writes.  The hash table is a [128,128] int32 VMEM scratch
per interleaved block (row = h >> 7, lane = h & 127; reads extract via
roll, writes via lane-mask select).  Block state (phase, cursors, skip,
hashes, output position) lives in SMEM scratch — SMEM scalar access is
~free (tools/mosaic_probe5.py) — so the while_loop carries only the
done flag.

Control flow is a flat two-phase state machine per block (PROBE: the
skip loop, one probe per trip; MATCH: extend + emit copy + double-
insert, one copy per trip; TAIL: the trailing literal), with LANES
blocks interleaved per grid step for latency hiding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snappy_tpu.kernels.pallas_decode import VEC, _emit, _window, rows_for
from snappy_tpu.spec.format import (
    HASH_MUL,
    INPUT_MARGIN,
    MIN_NON_LITERAL_BLOCK_SIZE,
    max_encoded_len,
)

__all__ = ["encode_blocks_pallas", "ELANES"]

ELANES = 2  # blocks interleaved per grid step

# SMEM state slots (per interleaved block)
_DONE, _PHASE, _NEXT_S, _SKIP, _NEXT_HASH, _S, _CAND, _NEXT_EMIT, _O, _SHIFT = range(10)
_NSLOTS = 16

_P_PROBE, _P_MATCH, _P_TAIL = 0, 1, 2


def _u32(w, k):
    """Little-endian 4-byte load from window w at static lane k."""
    return w[0, k] | (w[0, k + 1] << 8) | (w[0, k + 2] << 16) | (w[0, k + 3] << 24)


def _hash(u, shift):
    return jax.lax.shift_right_logical(u * jnp.int32(HASH_MUL), shift)


def _lane_extract(row, l):
    """row: [1,128]; scalar at dynamic lane l (roll + static read)."""
    return pltpu.roll(row, shift=(VEC - l) & (VEC - 1), axis=1)[0, 0]


def _table_read_insert(table_ref, j, h, value, lane1):
    """candidate = table[h]; table[h] = value  (one row RMW)."""
    hq = h >> 7
    hl = h & (VEC - 1)
    row = table_ref[j, pl.ds(hq, 1), :]
    cand = _lane_extract(row, hl)
    table_ref[j, pl.ds(hq, 1), :] = jnp.where(lane1 == hl, value, row)
    return cand


def _emit_literal(out_ref, src_ref, j, start, length, o, lane1):
    """Emit a literal element (header + body) at output byte offset o.
    Caller guarantees length >= 1.  Returns nothing; the new output
    position is o + header_len(length) + length (computed by caller)."""
    n = length - 1
    hdr_len = jnp.where(n < 60, 1, jnp.where(n < 256, 2, 3))
    t0 = jnp.where(
        n < 60, (n << 2), jnp.where(n < 256, (60 << 2), (61 << 2))
    )
    t1 = jnp.where(n < 60, 0, n & 0xFF)
    t2 = jnp.where(n < 256, 0, (n >> 8) & 0xFF)
    hv = jnp.where(
        lane1 == 0, t0, jnp.where(lane1 == 1, t1, jnp.where(lane1 == 2, t2, 0))
    )
    _emit(out_ref, j, hv, o >> 7, o & (VEC - 1), lane1)
    ob = o + hdr_len
    dq0 = ob >> 7
    dr = ob & (VEC - 1)
    sq0 = start >> 7
    sr = start & (VEC - 1)
    nvec = (length + VEC - 1) >> 7

    def chunk(k, _):
        ws = _window(src_ref, j, sq0 + k, sr, lane1)
        _emit(out_ref, j, ws, dq0 + k, dr, lane1)
        return 0

    jax.lax.fori_loop(0, nvec, chunk, 0)


def _literal_out_len(length):
    n = length - 1
    return length + jnp.where(n < 60, 1, jnp.where(n < 256, 2, 3))


def _emit_copy(out_ref, j, offset, length, o, lane1):
    """Reference emit_copy chopping (spec/reference.py:68-88).  Returns
    nothing; new output position = o + _copy_out_len(offset, length)."""
    n68 = jnp.where(length >= 68, (length - 68) // 64 + 1, 0)

    def chop(k, _):
        hv = jnp.where(
            lane1 == 0, (63 << 2) | 2,
            jnp.where(lane1 == 1, offset & 0xFF,
                      jnp.where(lane1 == 2, (offset >> 8) & 0xFF, 0)),
        )
        _emit(out_ref, j, hv, (o + k * 3) >> 7, (o + k * 3) & (VEC - 1), lane1)
        return 0

    jax.lax.fori_loop(0, n68, chop, 0)
    o1 = o + n68 * 3
    rem = length - n68 * 64

    @pl.when(rem > 64)
    def _():
        hv = jnp.where(
            lane1 == 0, (59 << 2) | 2,
            jnp.where(lane1 == 1, offset & 0xFF,
                      jnp.where(lane1 == 2, (offset >> 8) & 0xFF, 0)),
        )
        _emit(out_ref, j, hv, o1 >> 7, o1 & (VEC - 1), lane1)

    o2 = jnp.where(rem > 64, o1 + 3, o1)
    rem2 = jnp.where(rem > 64, rem - 60, rem)
    use2 = (rem2 >= 12) | (offset >= 2048)
    t0 = jnp.where(
        use2,
        ((rem2 - 1) << 2) | 2,
        ((offset >> 8) << 5) | ((rem2 - 4) << 2) | 1,
    )
    t1 = offset & 0xFF
    t2 = jnp.where(use2, (offset >> 8) & 0xFF, 0)
    hv = jnp.where(
        lane1 == 0, t0, jnp.where(lane1 == 1, t1, jnp.where(lane1 == 2, t2, 0))
    )
    _emit(out_ref, j, hv, o2 >> 7, o2 & (VEC - 1), lane1)


def _copy_out_len(offset, length):
    n68 = jnp.where(length >= 68, (length - 68) // 64 + 1, 0)
    rem = length - n68 * 64
    extra = jnp.where(rem > 64, 3, 0)
    rem2 = jnp.where(rem > 64, rem - 60, rem)
    last = jnp.where((rem2 >= 12) | (offset >= 2048), 3, 2)
    return n68 * 3 + extra + last


def _match_len(src_ref, j, a, b, limit, lane1):
    """Length of the common prefix of src[a:] and src[b:], capped at
    limit, in 128-byte vector steps."""

    def cond(st):
        k, found, ml = st
        return ~found

    def body(st):
        k, found, ml = st
        wa = _window(src_ref, j, (a + k * VEC) >> 7, (a + k * VEC) & (VEC - 1), lane1)
        wb = _window(src_ref, j, (b + k * VEC) >> 7, (b + k * VEC) & (VEC - 1), lane1)
        diff = wa != wb
        mm = jnp.min(jnp.where(diff[0, :], lane1[0, :], jnp.int32(VEC)))
        total = k * VEC + mm
        hit_end = total >= limit
        done = (mm < VEC) | hit_end
        return k + 1, done, jnp.minimum(total, limit)

    _, _, ml = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.bool_(False), jnp.int32(0))
    )
    return ml


def _kernel(lens_ref, src_ref, out_ref, clen_ref, err_ref, table_ref, st_ref):
    g = pl.program_id(0)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, VEC), 1)

    # ---- per-block init -------------------------------------------------
    for j in range(ELANES):
        n = lens_ref[g * ELANES + j]
        table_ref[j, :, :] = jnp.zeros((VEC, VEC), jnp.int32)
        # reference table sizing: smallest pow2 >= n in [256, 16384]
        shift = jnp.int32(24)
        size = jnp.int32(256)
        for _k in range(6):
            grow = (size < 16384) & (size < n)
            shift = jnp.where(grow, shift - 1, shift)
            size = jnp.where(grow, size * 2, size)
        st_ref[j, _SHIFT] = shift
        st_ref[j, _O] = 0
        st_ref[j, _NEXT_EMIT] = 0
        st_ref[j, _SKIP] = 32
        st_ref[j, _S] = 0
        st_ref[j, _CAND] = 0
        st_ref[j, _DONE] = jnp.where(n == 0, 1, 0)
        st_ref[j, _PHASE] = jnp.where(
            n < MIN_NON_LITERAL_BLOCK_SIZE, jnp.int32(_P_TAIL), jnp.int32(_P_PROBE)
        )
        st_ref[j, _NEXT_S] = 1
        w = _window(src_ref, j, 0, 1, lane1)  # bytes 1..128
        st_ref[j, _NEXT_HASH] = jnp.where(
            n >= MIN_NON_LITERAL_BLOCK_SIZE, _hash(_u32(w, 0), shift), 0
        )

    def cond(dn):
        return dn == 0

    def body(dn):
        for j in range(ELANES):
            _step(j, lens_ref, g, src_ref, out_ref, table_ref, st_ref, lane1)
        alldone = st_ref[0, _DONE]
        for j in range(1, ELANES):
            alldone &= st_ref[j, _DONE]
        return alldone

    jax.lax.while_loop(cond, body, jnp.int32(0))

    for j in range(ELANES):
        clen_ref[g * ELANES + j] = st_ref[j, _O]
        err_ref[g * ELANES + j] = 0


def _step(j, lens_ref, g, src_ref, out_ref, table_ref, st_ref, lane1):
    n = lens_ref[g * ELANES + j]
    s_limit = n - INPUT_MARGIN
    phase = st_ref[j, _PHASE]
    done = st_ref[j, _DONE]
    shift = st_ref[j, _SHIFT]

    # ---- PROBE: one skip-loop iteration --------------------------------
    @pl.when((done == 0) & (phase == _P_PROBE))
    def _():
        skip = st_ref[j, _SKIP]
        s = st_ref[j, _NEXT_S]
        bytes_between = skip >> 5
        next_s = s + bytes_between
        st_ref[j, _SKIP] = skip + bytes_between

        @pl.when(next_s > s_limit)
        def _():
            st_ref[j, _PHASE] = _P_TAIL

        @pl.when(next_s <= s_limit)
        def _():
            next_hash = st_ref[j, _NEXT_HASH]
            cand = _table_read_insert(table_ref, j, next_hash, s, lane1)
            wn = _window(src_ref, j, next_s >> 7, next_s & (VEC - 1), lane1)
            st_ref[j, _NEXT_HASH] = _hash(_u32(wn, 0), shift)
            st_ref[j, _NEXT_S] = next_s
            ws = _window(src_ref, j, s >> 7, s & (VEC - 1), lane1)
            wc = _window(src_ref, j, cand >> 7, cand & (VEC - 1), lane1)
            hit = _u32(ws, 0) == _u32(wc, 0)

            @pl.when(hit)
            def _():
                # emit the pending literal [next_emit, s) and enter MATCH
                next_emit = st_ref[j, _NEXT_EMIT]
                lit = s - next_emit
                _emit_literal(out_ref, src_ref, j, next_emit, lit, st_ref[j, _O], lane1)
                st_ref[j, _O] = st_ref[j, _O] + _literal_out_len(lit)
                st_ref[j, _S] = s
                st_ref[j, _CAND] = cand
                st_ref[j, _PHASE] = _P_MATCH

    # ---- MATCH: extend, emit copy, double-insert -----------------------
    @pl.when((done == 0) & (phase == _P_MATCH))
    def _():
        base = st_ref[j, _S]
        cand = st_ref[j, _CAND]
        ext = _match_len(src_ref, j, cand + 4, base + 4, n - base - 4, lane1)
        length = 4 + ext
        s_end = base + length
        o = st_ref[j, _O]
        _emit_copy(out_ref, j, base - cand, length, o, lane1)
        st_ref[j, _O] = o + _copy_out_len(base - cand, length)
        st_ref[j, _NEXT_EMIT] = s_end

        @pl.when(s_end >= s_limit)
        def _():
            st_ref[j, _PHASE] = _P_TAIL

        @pl.when(s_end < s_limit)
        def _():
            # reference double-insert: one 8-byte load at s_end-1
            w8 = _window(src_ref, j, (s_end - 1) >> 7, (s_end - 1) & (VEC - 1), lane1)
            x_lo = _u32(w8, 0)       # load32(s_end-1)
            x_mid = _u32(w8, 1)      # load32(s_end)
            x_hi = _u32(w8, 2)       # load32(s_end+1)
            _table_read_insert(table_ref, j, _hash(x_lo, shift), s_end - 1, lane1)
            cand2 = _table_read_insert(
                table_ref, j, _hash(x_mid, shift), s_end, lane1
            )
            wc2 = _window(src_ref, j, cand2 >> 7, cand2 & (VEC - 1), lane1)
            again = x_mid == _u32(wc2, 0)

            @pl.when(again)
            def _():
                st_ref[j, _S] = s_end
                st_ref[j, _CAND] = cand2

            @pl.when(~again)
            def _():
                st_ref[j, _NEXT_HASH] = _hash(x_hi, shift)
                st_ref[j, _NEXT_S] = s_end + 1
                st_ref[j, _SKIP] = 32
                st_ref[j, _PHASE] = _P_PROBE

    # ---- TAIL: trailing literal, finish --------------------------------
    @pl.when((done == 0) & (phase == _P_TAIL))
    def _():
        next_emit = st_ref[j, _NEXT_EMIT]
        rest = n - next_emit

        @pl.when(rest > 0)
        def _():
            _emit_literal(out_ref, src_ref, j, next_emit, rest, st_ref[j, _O], lane1)
            st_ref[j, _O] = st_ref[j, _O] + _literal_out_len(rest)

        st_ref[j, _DONE] = 1


def encode_blocks_pallas(blocks_u8, lens, bmax: int,
                         interpret: bool | None = None):
    """Encode a padded batch of <=64 KiB blocks (element streams only,
    no varint preamble — the runtime owns framing).

    blocks_u8: uint8[B, bmax] (bmax a multiple of 128, B a multiple of
    ELANES); lens int32[B].  Returns (comp uint8[B, cap], clens
    int32[B], err int32[B]); the emission is byte-identical to
    spec.reference.encode_block.  interpret=None auto-selects the
    pallas interpreter off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _encode_blocks_pallas_jit(
        blocks_u8, lens, bmax=bmax, interpret=interpret
    )


@functools.partial(jax.jit, static_argnames=("bmax", "interpret"))
def _encode_blocks_pallas_jit(blocks_u8, lens, bmax: int, interpret: bool):
    B, width = blocks_u8.shape
    assert width == bmax and bmax % VEC == 0
    assert B % ELANES == 0, f"batch must be a multiple of {ELANES}"
    sr = rows_for(bmax)
    cap_bytes = max_encoded_len(bmax) + VEC
    orows = rows_for(cap_bytes)
    src3 = jnp.zeros((B, sr, VEC), jnp.int32)
    src3 = src3.at[:, : bmax // VEC, :].set(
        blocks_u8.astype(jnp.int32).reshape(B, bmax // VEC, VEC)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // ELANES,),
        in_specs=[
            pl.BlockSpec((ELANES, sr, VEC), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ELANES, orows, VEC), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((ELANES, VEC, VEC), jnp.int32),
            pltpu.SMEM((ELANES, _NSLOTS), jnp.int32),
        ],
    )
    out3, clens, err = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, orows, VEC), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ),
        interpret=interpret,
    )(lens, src3)
    comp = out3.reshape(B, orows * VEC).astype(jnp.uint8)
    return comp, clens, err
