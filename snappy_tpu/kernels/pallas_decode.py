"""Pallas TPU decoder: sequential-per-block, parallel-across-blocks.

The XLA pointer-doubling decoder is bound by XLA's slow TPU gather
lowering (~9 ns/element; docs/performance.md).  This kernel takes the
opposite trade: each grid step decodes ONE block with a sequential tag
loop in VMEM — scalar parsing, but all byte movement as 128-wide
vector copies via dynamic-start/static-size slices, which Mosaic
compiles to real vector ops.  Blocks are independent, so the grid (and
multiple cores) provide the parallelism.

Techniques:
- dynamic copy lengths are made static by OVERSHOOT: every copy rounds
  up to whole 128-byte vectors; the garbage tail is overwritten by the
  next element (elements are emitted strictly left to right), and
  buffers are padded so overshoot never faults.
- overlapping copies (offset < 128, the RLE family) take a scalar
  byte loop; their cost is bounded by the block size and they come in
  streams with few tags, so the budget balances.
- validation mirrors the jnp decoder's error codes; err != 0 rows are
  re-decoded by the caller on a reference path.

Layout: int32 throughout (u8 VMEM tiling + scalar reads are less
portable across Mosaic versions); the runtime converts at the edges.

STATUS (round 1): bit-exact in interpret mode (tests/test_pallas_decode
.py).  The build environment's remote Mosaic compile service crashes
(HTTP 500, helper exit 1) on the exact constructs every sequential
decoder needs - narrowed by minimal probes to: (a) ANY dynamic-start
pl.ds load/store (static starts compile fine), (b) ANY
jax.lax.while_loop, (c) scalar reads from VMEM, (d) DMA into SMEM
scratch.  The on-hardware run is blocked on the toolchain, not the
kernel design or the hardware.  Revisit when the compile service is
updated; the XLA jnp decoder remains the production path meanwhile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_blocks_pallas"]

VEC = 128


ROWS = 8  # blocks per grid step (TPU sublane divisibility)


def _kernel(starts_ref, clens_ref, dlens_ref, comp_ref, out_ref, err_ref):
    base = pl.program_id(0) * ROWS
    for row in range(ROWS):
        _decode_row(
            row, starts_ref, clens_ref, dlens_ref, comp_ref, out_ref, err_ref,
            base,
        )


def _decode_row(row, starts_ref, clens_ref, dlens_ref, comp_ref, out_ref, err_ref, base):
    i = base + row
    start = starts_ref[i]
    comp_len = clens_ref[i]
    dst_len = dlens_ref[i]

    def rd(idx):
        return comp_ref[row, idx]

    def vec_copy_fwd(src_base, dst_base, nbytes):
        """Copy nbytes (rounded up to VEC) comp->out."""
        nvec = (nbytes + VEC - 1) // VEC

        def body(k, _):
            out_ref[row, pl.ds(dst_base + k * VEC, VEC)] = comp_ref[
                row, pl.ds(src_base + k * VEC, VEC)
            ]
            return 0

        jax.lax.fori_loop(0, nvec, body, 0)

    def vec_copy_self(src_base, dst_base, nbytes):
        nvec = (nbytes + VEC - 1) // VEC

        def body(k, _):
            out_ref[row, pl.ds(dst_base + k * VEC, VEC)] = out_ref[
                row, pl.ds(src_base + k * VEC, VEC)
            ]
            return 0

        jax.lax.fori_loop(0, nvec, body, 0)

    def byte_copy_self(src_base, dst_base, nbytes):
        def body(k, _):
            out_ref[row, dst_base + k] = out_ref[row, src_base + k]
            return 0

        jax.lax.fori_loop(0, nbytes, body, 0)

    def cond(state):
        s, d, err = state
        return (s < comp_len) & (err == 0)

    def body(state):
        s, d, err = state
        b0 = rd(s)
        tag = b0 & 3
        x = b0 >> 2

        def lit_case(_):
            hdr = jnp.select(
                [x < 60, x == 60, x == 61, x == 62], [1, 2, 3, 4], 5
            )
            ln = (
                jnp.select(
                    [x < 60, x == 60, x == 61, x == 62],
                    [
                        x,
                        rd(s + 1),
                        rd(s + 1) | (rd(s + 2) << 8),
                        rd(s + 1) | (rd(s + 2) << 8) | (rd(s + 3) << 16),
                    ],
                    rd(s + 1)
                    | (rd(s + 2) << 8)
                    | (rd(s + 3) << 16)
                    | (rd(s + 4) << 24),
                )
                + 1
            )
            bad = (
                (ln <= 0)
                | (s + hdr + ln > comp_len)
                | (d + ln > dst_len)
            )

            def do(_):
                vec_copy_fwd(s + hdr, d, ln)
                return 0

            jax.lax.cond(bad, lambda _: 0, do, 0)
            return s + hdr + ln, d + ln, jnp.where(bad, jnp.int32(1), 0)

        def copy_case(_):
            hdr = jnp.select([tag == 1, tag == 2], [2, 3], 5)
            ln = jnp.where(tag == 1, 4 + ((b0 >> 2) & 7), 1 + x)
            off = jnp.select(
                [tag == 1, tag == 2],
                [
                    ((b0 & 0xE0) << 3) | rd(s + 1),
                    rd(s + 1) | (rd(s + 2) << 8),
                ],
                rd(s + 1)
                | (rd(s + 2) << 8)
                | (rd(s + 3) << 16)
                | (rd(s + 4) << 24),
            )
            bad = (
                (off <= 0)
                | (off > d)
                | (s + hdr > comp_len)
                | (d + ln > dst_len)
            )

            def do(_):
                jax.lax.cond(
                    off >= VEC,
                    lambda _: (vec_copy_self(d - off, d, ln), 0)[1],
                    lambda _: (byte_copy_self(d - off, d, ln), 0)[1],
                    0,
                )
                return 0

            jax.lax.cond(bad, lambda _: 0, do, 0)
            return s + hdr, d + ln, jnp.where(bad, jnp.int32(2), 0)

        s2, d2, e = jax.lax.cond(tag == 0, lit_case, copy_case, 0)
        return s2, d2, jnp.where(err != 0, err, e)

    s0 = start
    s_end, d_end, err = jax.lax.while_loop(
        cond, body, (s0, jnp.int32(0), jnp.int32(0))
    )
    err = jnp.where((err == 0) & (d_end != dst_len), jnp.int32(3), err)
    err = jnp.where((err == 0) & (s_end != comp_len), jnp.int32(4), err)
    err_ref[i] = err


@functools.partial(
    jax.jit, static_argnames=("out_max", "interpret")
)
def decode_blocks_pallas(comp_i32, starts, clens, dlens, out_max: int,
                         interpret: bool = False):
    """comp_i32: int32[B, CMAX+pad] byte values; returns
    (out int32[B, out_max+pad], err int32[B])."""
    B, cmax = comp_i32.shape
    assert B % ROWS == 0, f"batch must be a multiple of {ROWS}"
    opad = out_max + 2 * VEC
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, cmax), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ROWS, opad), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
    )
    out, err = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, opad), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ),
        interpret=interpret,
    )(starts, clens, dlens, comp_i32)
    return out[:, :out_max], err
