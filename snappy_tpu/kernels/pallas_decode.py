"""Pallas TPU decoder: sequential-per-block, windowed sublane layout.

Round-1 history: the first sequential kernel kept each block's bytes on
the LANE axis and addressed them with dynamic-start lane slices; the
remote Mosaic compile service rejected exactly that (plus while_loop and
scalar VMEM reads at the time).  The round-2 compile service inverted
the constraint set (tools/mosaic_probe.py): dynamic-start SUBLANE
slices, dynamic `pltpu.roll`, scalar VMEM reads, while_loop and pl.when
all compile — and lane-axis dynamic addressing is what fails.

This kernel is therefore formulated entirely in sublane/roll space:

- each block's byte stream lives in VMEM as int32 [rows, 128], byte i at
  [i >> 7, i & 127] (u8 VMEM tiling is also rejected; int32 it is);
- an unaligned 128-byte window at byte offset s is two dynamically
  sliced rows rotated by `pltpu.roll` and lane-selected;
- an emission at output offset d is the window rotated to d's lane
  phase, written as one lane-masked merge row (preserving bytes < d)
  plus one overshoot row (garbage beyond the emission is overwritten by
  the next emission — output is produced strictly left to right);
- overlapping copies (offset < 128, the RLE family) become periodic
  patterns via 7 mask+roll doubling steps, then emit like any copy
  (snappy copy elements are <= 64 bytes — format.py tag spec — so every
  copy is a single window);
- long literals loop over 128-byte chunks whose source/destination lane
  phases are loop-invariant (both advance by whole rows).

Parallelism comes from the grid (one block per step, double-buffered by
the pallas pipeline); blocks are independent by format design
(SURVEY.md §7.4, §8.1).

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

__all__ = ["decode_blocks_pallas", "rows_for"]

VEC = 128

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


def _roll(x, shift):
    return pltpu.roll(x, shift=shift, axis=1)


def _window(ref3, q, r, lane):
    """Bytes q*128+r .. +127 of a [1, R, 128] ref as a [1, 128] vector."""
    two = ref3[0, pl.ds(q, 2), :]
    sh = (VEC - r) & (VEC - 1)
    lo = _roll(two[0:1, :], sh)
    hi = _roll(two[1:2, :], sh)
    return jnp.where(lane < VEC - r, lo, hi)


def _emit(out_ref, w, dq, dr, lane):
    """Write window w (bytes d..d+127, d = dq*128+dr) into out_ref,
    preserving bytes before d and overshooting after; the overshoot is
    overwritten by later emissions."""
    rot = _roll(w, dr)
    cur = out_ref[0, pl.ds(dq, 1), :]
    out_ref[0, pl.ds(dq, 1), :] = jnp.where(lane >= dr, rot, cur)
    out_ref[0, pl.ds(dq + 1, 1), :] = rot


def _kernel(starts_ref, clens_ref, dlens_ref, comp_ref, out_ref, err_ref):
    b = pl.program_id(0)
    start = starts_ref[b]
    clen = clens_ref[b]
    dlen = dlens_ref[b]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, VEC), 1)

    def cond(state):
        s, d, err = state
        return (s < clen) & (err == 0)

    def body(state):
        s, d, err = state
        w = _window(comp_ref, s >> 7, s & (VEC - 1), lane)
        b0, b1, b2, b3, b4 = (w[0, 0], w[0, 1], w[0, 2], w[0, 3], w[0, 4])
        tag = b0 & 3
        x = b0 >> 2
        is_lit = tag == 0

        # -- literal header (nested where: jnp.select lowers via an
        # argmax Mosaic rejects for int32) ---------------------------------
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

        # -- copy header ---------------------------------------------------
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

        dq0 = d >> 7
        dr = d & (VEC - 1)

        @pl.when(is_lit & (e == ERR_NONE))
        def _():
            sb = s + hdr
            sq0 = sb >> 7
            sr = sb & (VEC - 1)
            nvec = (ln + VEC - 1) >> 7

            def chunk(k, _):
                ws = _window(comp_ref, sq0 + k, sr, lane)
                _emit(out_ref, ws, dq0 + k, dr, lane)
                return 0

            jax.lax.fori_loop(0, nvec, chunk, 0)

        @pl.when((~is_lit) & (e == ERR_NONE))
        def _():
            src = d - off
            p = _window(out_ref, src >> 7, src & (VEC - 1), lane)
            # periodic extension for overlapping copies (off < 128);
            # off >= 128 makes every step a no-op mask
            v = jnp.minimum(off, VEC)
            for _i in range(7):
                p = jnp.where(lane < v, p, _roll(p, v))
                v = jnp.minimum(v * 2, VEC)
            _emit(out_ref, p, dq0, dr, lane)

        s2 = s + hdr + jnp.where(is_lit, ln, 0)
        d2 = d + ln
        return (
            jnp.where(e == ERR_NONE, s2, s),
            jnp.where(e == ERR_NONE, d2, d),
            e,
        )

    s_end, d_end, err = jax.lax.while_loop(
        cond, body, (start, jnp.int32(0), jnp.int32(0))
    )
    err = jnp.where((err == 0) & (d_end != dlen), jnp.int32(ERR_DST_SHORT), err)
    err = jnp.where((err == 0) & (s_end != clen), jnp.int32(ERR_SRC_TRAIL), err)
    err_ref[b] = err


@functools.partial(jax.jit, static_argnames=("out_max", "interpret"))
def decode_blocks_pallas(comp_u8, starts, clens, dlens, out_max: int,
                         interpret: bool = False):
    """Decode a padded batch of snappy element streams.

    comp_u8: uint8[B, cmax] (cmax a multiple of 128); starts/clens/dlens
    int32[B].  Returns (out uint8[B, out_max], err int32[B]).
    """
    B, cmax = comp_u8.shape
    assert cmax % VEC == 0, "compressed row width must be a multiple of 128"
    assert out_max % VEC == 0, "out_max must be a multiple of 128"
    cr = rows_for(cmax)
    orows = rows_for(out_max)
    comp3 = jnp.zeros((B, cr, VEC), jnp.int32)
    comp3 = comp3.at[:, : cmax // VEC, :].set(
        comp_u8.astype(jnp.int32).reshape(B, cmax // VEC, VEC)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, cr, VEC), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, orows, VEC), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
    )
    out3, err = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, orows, VEC), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ),
        interpret=interpret,
    )(starts, clens, dlens, comp3)
    out = out3.reshape(B, orows * VEC)[:, :out_max].astype(jnp.uint8)
    return out, err
