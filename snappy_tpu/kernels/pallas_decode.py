"""Pallas TPU decoder: sequential-per-block, windowed sublane layout,
interleaved across blocks for latency hiding.

Round-1 history: the first sequential kernel kept each block's bytes on
the LANE axis and addressed them with dynamic-start lane slices; the
remote Mosaic compile service rejected exactly that (plus while_loop and
scalar VMEM reads at the time).  The round-2 compile service inverted
the constraint set (tools/mosaic_probe.py): dynamic-start SUBLANE
slices, dynamic `pltpu.roll`, scalar VMEM reads, while_loop and pl.when
all compile — and lane-axis dynamic addressing is what fails.

Formulation (all in sublane/roll space):

- each block's byte stream lives in VMEM as int32 [rows, 128], byte i at
  [i >> 7, i & 127] (u8 VMEM tiling is also rejected; int32 it is);
- an unaligned 128-byte window at byte offset s is one dynamically
  sliced [2,128] row pair rotated by a single `pltpu.roll` and
  lane-selected between the two rotated rows;
- an emission at output offset d is the window rotated to d's lane
  phase, written as one lane-masked merge row (preserving bytes < d)
  plus one overshoot row (garbage beyond the emission is overwritten by
  the next emission — output is produced strictly left to right);
- overlapping copies (offset < 128, the RLE family) become periodic
  patterns via mask+roll doubling, entered only when off < 128
  (measured roll latency is ~70 ns — tools/mosaic_probe5.py — so the
  doubling chain is gated, not unconditional);
- long literals loop over 128-byte chunks whose source/destination lane
  phases are loop-invariant (both advance by whole rows).

Performance structure (probe-measured, docs/performance.md): per-tag
cost is dominated by dependency-chain latency (dyn load ~45 ns, roll
~70 ns, scalar extract ~45 ns; issue is ~free).  The kernel therefore
interleaves LANES=4 independent blocks per grid step — four dependency
chains overlap, hiding most of the latency.  The caller should sort
rows by compressed length so co-scheduled blocks finish together
(`argsort_rows` helper); output order is restored by the caller's
indexed assembly.

Validation mirrors decode_np's checks; err != 0 rows are re-decoded by
the caller on a reference path for exact error surfacing.  Bounds
arithmetic uses subtraction forms (ln > dlen - d) so hostile 4-byte
lengths cannot wrap int32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_blocks_pallas", "rows_for", "argsort_rows", "LANES"]

VEC = 128
LANES = 8  # blocks interleaved per grid step (latency hiding)

ERR_NONE = 0
ERR_LITERAL = 1
ERR_COPY = 2
ERR_DST_SHORT = 3
ERR_SRC_TRAIL = 4


def rows_for(nbytes: int, pad_rows: int = 2) -> int:
    """VMEM rows holding nbytes plus window-overshoot padding, rounded
    to the int32 sublane tile (8)."""
    r = (nbytes + VEC - 1) // VEC + pad_rows
    return (r + 7) & ~7


def argsort_rows(clens) -> "jnp.ndarray":
    """Host-side schedule: order rows by compressed length so the LANES
    blocks sharing a grid step have similar tag counts (the step runs
    until its slowest block finishes)."""
    import numpy as np

    return np.argsort(np.asarray(clens), kind="stable").astype(np.int32)


def _window(ref3, j, q, r, lane1):
    """Bytes q*128+r .. +127 of block j in a [LANES, R, 128] ref as a
    [1, 128] vector (single roll + row select)."""
    two = ref3[j, pl.ds(q, 2), :]
    rolled = pltpu.roll(two, shift=(VEC - r) & (VEC - 1), axis=1)
    return jnp.where(lane1 < VEC - r, rolled[0:1, :], rolled[1:2, :])


def _emit(out_ref, j, w, dq, dr, lane1):
    """Write window w (bytes d..d+127, d = dq*128+dr) into block j of
    out_ref, preserving bytes before d and overshooting after.

    out_ref may be a per-lane [1, R, 128] ref (j ignored <=> 0): each
    interleaved block gets its OWN output ref so Mosaic's alias analysis
    does not serialize the lanes' independent load/store chains."""
    rot = pltpu.roll(w, shift=dr, axis=1)
    cur = out_ref[j, pl.ds(dq, 1), :]
    out_ref[j, pl.ds(dq, 1), :] = jnp.where(lane1 >= dr, rot, cur)
    out_ref[j, pl.ds(dq + 1, 1), :] = rot


def _step_one(j, s, d, comp_ref, comp32_ref, out_ref, clen, dlen, lane1):
    """Decode one element of block j.  Returns (s', d', err).

    Parsing reads the word-combined mirror (comp32[i] = LE32 of bytes
    i..i+3): two vector->scalar extracts (~45 ns each, serial) replace
    five byte extracts."""
    w32 = _window(comp32_ref, j, s >> 7, s & (VEC - 1), lane1)
    u0 = w32[0, 0]
    u1 = w32[0, 1]
    b0 = u0 & 255
    b1 = (u0 >> 8) & 255
    b2 = (u0 >> 16) & 255
    b3 = jax.lax.shift_right_logical(u0, 24) & 255
    b4 = u1 & 255
    tag = b0 & 3
    x = b0 >> 2
    is_lit = tag == 0

    w1 = jnp.int32(1)
    lit_hdr = jnp.where(
        x < 60, w1,
        jnp.where(x == 60, w1 * 2, jnp.where(x == 61, w1 * 3,
                                             jnp.where(x == 62, w1 * 4, w1 * 5))),
    )
    lit_ln = (
        jnp.where(
            x < 60, x,
            jnp.where(
                x == 60, b1,
                jnp.where(
                    x == 61, b1 | (b2 << 8),
                    jnp.where(
                        x == 62, b1 | (b2 << 8) | (b3 << 16),
                        b1 | (b2 << 8) | (b3 << 16) | (b4 << 24),
                    ),
                ),
            ),
        )
        + 1
    )
    cop_hdr = jnp.where(tag == 1, w1 * 2, jnp.where(tag == 2, w1 * 3, w1 * 5))
    cop_ln = jnp.where(tag == 1, 4 + (x & 7), 1 + x)
    off = jnp.where(
        tag == 1, ((b0 & 0xE0) << 3) | b1,
        jnp.where(tag == 2, b1 | (b2 << 8),
                  b1 | (b2 << 8) | (b3 << 16) | (b4 << 24)),
    )

    hdr = jnp.where(is_lit, lit_hdr, cop_hdr)
    ln = jnp.where(is_lit, lit_ln, cop_ln)

    # subtraction-form bounds: every term fits i32 (s,d,clen,dlen are
    # block-local), so hostile 4-byte lengths cannot wrap the check
    bad_common = (hdr > clen - s) | (ln <= 0) | (ln > dlen - d)
    lit_bad = bad_common | (ln > clen - s - hdr)
    cop_bad = bad_common | (off <= 0) | (off > d)
    e = jnp.where(
        is_lit,
        jnp.where(lit_bad, jnp.int32(ERR_LITERAL), jnp.int32(ERR_NONE)),
        jnp.where(cop_bad, jnp.int32(ERR_COPY), jnp.int32(ERR_NONE)),
    )
    ok = e == ERR_NONE

    dq0 = d >> 7
    dr = d & (VEC - 1)

    # Branch-merged common path: load BOTH candidate source windows
    # unconditionally (independent dyn loads are pipelined ~free,
    # probe5) with clamped-safe addresses, select the real one, and do
    # ONE gated emission.  Only overlap-extension and >128-byte
    # literals take real branches.
    lit_src = jnp.where(is_lit & ok, s + hdr, jnp.int32(0))
    cop_src = jnp.where((~is_lit) & ok, d - off, jnp.int32(0))
    w_lit = _window(comp_ref, j, lit_src >> 7, lit_src & (VEC - 1), lane1)
    w_cop = _window(out_ref, 0, cop_src >> 7, cop_src & (VEC - 1), lane1)

    def extend(p):
        # periodic extension for overlapping copies: 7 dependent rolls
        # (~500 ns), so gated on off < 128
        v = off
        for _i in range(7):
            p = jnp.where(lane1 < v, p, pltpu.roll(p, shift=v, axis=1))
            v = jnp.minimum(v * 2, VEC)
        return p

    w_cop = jax.lax.cond(
        ((~is_lit) & ok & (off < VEC)), extend, lambda p: p, w_cop
    )
    w = jnp.where(is_lit, w_lit, w_cop)

    @pl.when(ok)
    def _():
        _emit(out_ref, 0, w, dq0, dr, lane1)

    @pl.when(ok & is_lit & (ln > VEC))
    def _():
        # long literal: remaining 128-byte chunks (first already emitted)
        sb = s + hdr
        sq0 = sb >> 7
        sr = sb & (VEC - 1)
        nvec = (ln + VEC - 1) >> 7

        def chunk(k, _):
            ws = _window(comp_ref, j, sq0 + k, sr, lane1)
            _emit(out_ref, 0, ws, dq0 + k, dr, lane1)
            return 0

        jax.lax.fori_loop(1, nvec, chunk, 0)

    s2 = s + hdr + jnp.where(is_lit, ln, 0)
    d2 = d + ln
    return (
        jnp.where(e == ERR_NONE, s2, s),
        jnp.where(e == ERR_NONE, d2, d),
        e,
    )


def _kernel(starts_ref, clens_ref, dlens_ref, comp_ref, comp32_ref, *refs):
    out_refs = refs[:LANES]
    err_ref = refs[LANES]
    g = pl.program_id(0)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, VEC), 1)

    starts = [starts_ref[g * LANES + j] for j in range(LANES)]
    clens = [clens_ref[g * LANES + j] for j in range(LANES)]
    dlens = [dlens_ref[g * LANES + j] for j in range(LANES)]

    def cond(state):
        ss, ds, es = state
        active = (ss[0] < clens[0]) & (es[0] == 0)
        for j in range(1, LANES):
            active |= (ss[j] < clens[j]) & (es[j] == 0)
        return active

    def body(state):
        ss, ds, es = state
        ns, nd, ne = [], [], []
        for j in range(LANES):
            run = (ss[j] < clens[j]) & (es[j] == 0)
            # masked step: inactive blocks idle (their refs untouched
            # because _step_one's writes are pl.when-gated on e, and we
            # force e=ERR_NONE->no-write by clamping s to a benign spot)
            s_j = jnp.where(run, ss[j], jnp.int32(0))
            d_j = jnp.where(run, ds[j], jnp.int32(0))
            s2, d2, e2 = _step_one(
                j, s_j, d_j, comp_ref, comp32_ref, out_refs[j],
                jnp.where(run, clens[j], jnp.int32(0)),
                jnp.where(run, dlens[j], jnp.int32(0)),
                lane1,
            )
            ns.append(jnp.where(run, s2, ss[j]))
            nd.append(jnp.where(run, d2, ds[j]))
            ne.append(jnp.where(run, e2, es[j]))
        return tuple(ns), tuple(nd), tuple(ne)

    zeros = tuple(jnp.int32(0) for _ in range(LANES))
    ss, ds, es = jax.lax.while_loop(
        cond, body, (tuple(starts), zeros, zeros)
    )
    for j in range(LANES):
        err = es[j]
        err = jnp.where(
            (err == 0) & (ds[j] != dlens[j]), jnp.int32(ERR_DST_SHORT), err
        )
        err = jnp.where(
            (err == 0) & (ss[j] != clens[j]), jnp.int32(ERR_SRC_TRAIL), err
        )
        err_ref[g * LANES + j] = err


def decode_blocks_pallas(comp_u8, starts, clens, dlens, out_max: int,
                         interpret: bool | None = None):
    """Decode a padded batch of snappy element streams.

    comp_u8: uint8[B, cmax] (cmax a multiple of 128, B a multiple of
    LANES); starts/clens/dlens int32[B].  Returns (out uint8[B, out_max],
    err int32[B]).  interpret=None auto-selects the pallas interpreter
    off-TPU (Mosaic targets TPU; CPU is the hermetic test backend).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _decode_blocks_pallas_jit(
        comp_u8, starts, clens, dlens, out_max=out_max, interpret=interpret
    )


@functools.partial(jax.jit, static_argnames=("out_max", "interpret"))
def _decode_blocks_pallas_jit(comp_u8, starts, clens, dlens, out_max: int,
                              interpret: bool):
    B, cmax = comp_u8.shape
    assert cmax % VEC == 0, "compressed row width must be a multiple of 128"
    assert out_max % VEC == 0, "out_max must be a multiple of 128"
    assert B % LANES == 0, f"batch must be a multiple of {LANES}"
    cr = rows_for(cmax)
    orows = rows_for(out_max)
    comp3 = jnp.zeros((B, cr, VEC), jnp.int32)
    comp3 = comp3.at[:, : cmax // VEC, :].set(
        comp_u8.astype(jnp.int32).reshape(B, cmax // VEC, VEC)
    )
    # word-combined mirror for the 2-extract parse (cheap XLA prepass)
    flat = comp3.reshape(B, cr * VEC)
    w32 = (
        flat
        | jnp.roll(flat, -1, axis=1) << 8
        | jnp.roll(flat, -2, axis=1) << 16
        | jnp.roll(flat, -3, axis=1) << 24
    )
    comp32 = w32.reshape(B, cr, VEC)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B // LANES,),
        in_specs=[
            pl.BlockSpec((LANES, cr, VEC), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, cr, VEC), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # one output ref per interleaved lane: distinct buffers keep
            # Mosaic's alias analysis from serializing the lanes
            *[
                pl.BlockSpec((1, orows, VEC), lambda g, *_: (g, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(LANES)
            ],
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
    )
    *outs, err = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(
            *[
                jax.ShapeDtypeStruct((B // LANES, orows, VEC), jnp.int32)
                for _ in range(LANES)
            ],
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ),
        interpret=interpret,
    )(starts, clens, dlens, comp3, comp32)
    # lane j of group g is block g*LANES+j
    out3 = jnp.stack(outs, axis=1).reshape(B, orows, VEC)
    out = out3.reshape(B, orows * VEC)[:, :out_max].astype(jnp.uint8)
    return out, err
