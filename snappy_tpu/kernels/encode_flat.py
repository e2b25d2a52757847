"""Flat-plan ENCODE emission: the host matcher's output replayed on
device by the flat gather/compose kernel (kernels/decode_flat.py).

Division of labour mirrors the flat/wave decode engines: the host runs
the native matcher (the irreducibly-sequential hash-table walk, ~1.4
GB/s C++) and sn_plan_flat_enc derives a dependency-free piece plan
from the parsed element — literal data gathers straight from the input
block (out[lit_dst] == input[out_start] by construction), while
preamble/tag/copy bytes (plus literal runs <= 24 B, inlined to merge
segments) ride in a contiguous tag buffer.  The device then emits the
compressed element byte-for-byte with MXU one-hot gather/compose trips
and fuses the uncompressed-data CRC from the same B buffer.

Because the emission is byte-identical to the host encoder's, the
ratio bound is structural (compressed size == native C++ == go-style
greedy, the bound BASELINE.json defines) and the runtime skips
RATIO_GUARD on this engine — the host-side encode that the guard used
to burn per chunk IS the planning pass here.

B-buffer row layout (B = one block's gather source, uint8 rows of 128):
  row 0          zero pad (piece sources may reach left of the input)
  rows 1..512    the input block (64 KiB span, zero-padded)
  rows 513..1025 tag buffer (TAG_ROWS rows)
  last rows      guard + sublane-tile rounding
"""

from __future__ import annotations

import numpy as np

from snappy_tpu.kernels.decode_flat import (
    NSUB,
    VEC,
    decode_blocks_flat,
    execute_flat_np,
)

__all__ = [
    "SRC_SPAN",
    "TAG_ROWS",
    "RB_ENC",
    "OUT_ROWS_ENC",
    "ENC_TRIP_CAP",
    "build_b_enc",
    "encode_blocks_flat",
    "replay_enc_np",
]

SRC_SPAN = 65536           # input block span in B (bytes)
# Encode plans are small (~1.3 trips/block measured: literal inlining
# collapses them), and per-grid-step DMA volume is the encode path's
# measured floor — so the encode caps are sized for the realistic
# envelope, not the format's worst case.  Overflow falls back to the
# host emission, which the planning pass computed anyway (free).
TAG_ROWS = 512             # tag buffer rows (64 KiB: the planner's
                           # first inline rung routes literals <= 1024 B
                           # through the aligned tag segment, so the
                           # buffer is sized for mostly-inlined blocks)
ENC_TRIP_CAP = 24          # device trips per block (12288 pieces)

# pad row + input span + tag rows + guard, rounded to the int32 tile
RB_ENC = ((1 + SRC_SPAN // VEC + TAG_ROWS + 1) + 7) & ~7

# device output panel: worst-case compressed length of a 64 KiB block
# (sn_max_compressed_length ~= 32 + n + n/6) is 76,475 B -> dst bin 4;
# the kernel's compose RMW writes whole 128-row bins, so the panel must
# cover 5 full bins
OUT_ROWS_ENC = 640
ENC_DST_MAX = OUT_ROWS_ENC * VEC


def build_b_enc(block: np.ndarray, tagbuf: np.ndarray,
                tag_used: int) -> np.ndarray:
    """Host-side B buffer for one block: pad row + input + tag bytes."""
    b = np.zeros(RB_ENC * VEC, dtype=np.uint8)
    b[VEC : VEC + len(block)] = block
    tb = VEC + SRC_SPAN
    b[tb : tb + tag_used] = tagbuf[:tag_used]
    return b


def replay_enc_np(meta: np.ndarray, starts: np.ndarray, n_trips: int,
                  b_bytes: np.ndarray, comp_len: int) -> np.ndarray:
    """Numpy contract: the packed encode plan replayed by the shared
    flat executor must reproduce the host encoder's element exactly."""
    return execute_flat_np(meta, starts, n_trips, b_bytes, comp_len,
                           out_rows=OUT_ROWS_ENC)


def encode_blocks_flat(b_u8, meta, starts, ntrips,
                       interpret: bool | None = None):
    """Emit packed encode plans on device via the shared flat kernel.

    b_u8: uint8[B, RB_ENC*128] (build_b_enc); meta: int32[B,
    8*ENC_TRIP_CAP, 128]; starts: int32[B, 8, 128]; ntrips: int32[B].
    Returns uint8[B, OUT_ROWS_ENC*128] compressed elements (callers
    slice to the realized lengths, which the host planner knows).
    """
    return decode_blocks_flat(b_u8, meta, starts, ntrips,
                              dst_max=ENC_DST_MAX, interpret=interpret,
                              out_rows=OUT_ROWS_ENC)
