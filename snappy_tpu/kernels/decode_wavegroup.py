"""Wave-group decoder: host-planned groups of independent emissions,
executed as one value-space composition per group on the TPU.

Motivation (docs/performance.md): the sequential pallas decoder pays a
~500 ns dependency chain PER TAG because Mosaic executes strictly in
order.  The wave-group formulation amortizes that chain over up to
SLOTS=8 emissions: the host (which already tag-parses the stream on the
production framed path — native sn_parse_tags) groups consecutive
emissions whose *sources all precede the group's output start*, and the
kernel executes a whole group with

    1 span load + per-slot {pair load (pipelined), row select,
    ONE roll, mask-compose} + 1 span store

The key identity making a slot branch- and shift-cheap: with
u[l] = byte src + ((l - src%128) mod 128) (a lane select over the
loaded row pair, no roll) and v = roll(u, (dst - src) mod 128), the
broadcast of v over the span satisfies  v[p mod 128] = byte
src + (p - dst)  for every output position p with 0 <= p - dst < 128 —
so a lane mask places the slot's bytes anywhere in the span.

Planning rules (plan_waves):
- literals split into <=128-byte pieces (comp-sourced);
- copies with offset >= length stay whole (<= 64 bytes by format);
- overlapping copies (offset < length) expand into offset-doubling
  pieces, each sourced strictly below its own destination;
- a piece joins the current group iff the group has a free slot, the
  piece's source range ends at or before the group's output start, and
  the group span stays within SPAN_BYTES;
- otherwise the group is flushed and a new group starts at the piece.

The planner is the schedule oracle: `execute_waves_np` replays a plan
byte-for-byte on numpy and is the contract the pallas kernel is fuzzed
against.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "SLOTS",
    "WAVE_G_CAP",
    "SPAN_BYTES",
    "SPAN_ROWS",
    "plan_waves",
    "execute_waves_np",
]

SLOTS = 8
# Wave-plan capacity: one kernel variant (compile time matters through
# the remote Mosaic service); plans that exceed it fall back per chunk.
# Out of the runtime ladder since round 3 (VERDICT r2 #6) — the flat
# engine dominates it everywhere — kept as a standalone engine with
# its own tests and bench phase.
WAVE_G_CAP = 8192
SPAN_ROWS = 10          # compose window rows (span + alignment slack)
SPAN_BYTES = (SPAN_ROWS - 2) * 128  # group output span cap (1024)

# packed slot words (2 x i32 per slot):
#   w1 = src | is_out << 17
#   w2 = dst | len << 17
_SRC_MASK = (1 << 17) - 1


def plan_waves(recs: np.ndarray, n_tags: int, cap_groups: int | None = None):
    """Plan wave groups from sn_parse_tags records.

    recs: int32[T, 4] rows (kind, out_len, offset|lit_src, out_start).
    Returns (words int32[G, SLOTS*2], n_groups) or None if the plan
    exceeds cap_groups (caller falls back to another engine).
    Empty slots have len 0 (masks select nothing).
    """
    groups: list[list[tuple[int, int, int, int]]] = []
    cur: list[tuple[int, int, int, int]] = []
    d0 = 0

    def flush():
        nonlocal cur
        if cur:
            groups.append(cur)
            cur = []

    def admit(src: int, dst: int, ln: int, is_out: int):
        nonlocal cur, d0
        need_new = (
            len(cur) == SLOTS
            or (is_out and src + ln > d0)
            or (dst + ln - d0 > SPAN_BYTES)
        )
        if need_new or not cur:
            flush()
            d0 = dst
        cur.append((src, dst, ln, is_out))

    for t in range(n_tags):
        kind, out_len, arg, out_start = (
            int(recs[t, 0]), int(recs[t, 1]), int(recs[t, 2]), int(recs[t, 3])
        )
        if kind == 0:  # literal from comp at arg
            pos = 0
            while pos < out_len:
                ln = min(128, out_len - pos)
                admit(arg + pos, out_start + pos, ln, 0)
                pos += ln
        else:  # copy with offset arg
            off = arg
            d = out_start
            remaining = out_len
            cur_off = off
            while remaining > 0:
                ln = min(cur_off, remaining, 128)
                admit(d - cur_off, d, ln, 1)
                d += ln
                remaining -= ln
                cur_off += ln
        if cap_groups is not None and len(groups) > cap_groups:
            return None
    flush()
    if cap_groups is not None and len(groups) > cap_groups:
        return None

    g = len(groups)
    words = np.zeros((max(g, 1), SLOTS * 2), dtype=np.int32)
    for gi, grp in enumerate(groups):
        for k, (src, dst, ln, is_out) in enumerate(grp):
            words[gi, 2 * k] = src | (is_out << 17)
            words[gi, 2 * k + 1] = dst | (ln << 17)
    return words, g


def execute_waves_np(words: np.ndarray, n_groups: int, comp: np.ndarray,
                     dst_len: int) -> np.ndarray:
    """Numpy contract for the kernel: replay a plan exactly as the
    pallas kernel does (group-ordered, slot-ordered composition)."""
    out = np.zeros(dst_len + 2 * 128, dtype=np.uint8)
    for g in range(n_groups):
        for k in range(SLOTS):
            w1 = int(words[g, 2 * k])
            w2 = int(words[g, 2 * k + 1])
            ln = w2 >> 17
            if ln == 0:
                continue
            src = w1 & _SRC_MASK
            is_out = (w1 >> 17) & 1
            dst = w2 & _SRC_MASK
            buf = out if is_out else comp
            out[dst : dst + ln] = buf[src : src + ln]
    return out[:dst_len]


# ---------------------------------------------------------------------
# pallas kernel

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snappy_tpu.kernels.pallas_decode import VEC, rows_for

_M17 = (1 << 17) - 1


def pack_plan(words: np.ndarray, n_groups: int, g_cap: int) -> np.ndarray:
    """Pack a [G, SLOTS*2] plan into the kernel's row layout:
    group g lives at row g//8, lanes (g%8)*16 .. +15 of a
    [g_cap//8, 128] int32 array."""
    assert g_cap % 8 == 0 and n_groups <= g_cap
    out = np.zeros((g_cap // 8, VEC), dtype=np.int32)
    flat = out.reshape(g_cap, 16)
    flat[:n_groups] = words[:n_groups]
    return out


def _wg_kernel(ngroups_ref, comp_ref, words_ref, out_ref):
    b = pl.program_id(0)
    ng = ngroups_ref[b]
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, VEC), 1)
    lane_sr = jax.lax.broadcasted_iota(jnp.int32, (SPAN_ROWS, VEC), 1)
    row_sr = jax.lax.broadcasted_iota(jnp.int32, (SPAN_ROWS, VEC), 0)

    def cond(g):
        return g < ng

    def body(g):
        wrow = words_ref[0, pl.ds(g >> 3, 1), :]
        wr = pltpu.roll(wrow, shift=(VEC - ((g & 7) * 16)) & (VEC - 1), axis=1)
        w = [wr[0, k] for k in range(16)]
        d0 = w[1] & _M17
        row0 = d0 >> 7
        span = out_ref[0, pl.ds(row0, SPAN_ROWS), :]
        flat = (row0 + row_sr) * VEC + lane_sr
        for k in range(SLOTS):
            w1 = w[2 * k]
            w2 = w[2 * k + 1]
            srck = w1 & _M17
            isout = jax.lax.shift_right_logical(w1, 17) & 1
            dk = w2 & _M17
            lk = jax.lax.shift_right_logical(w2, 17)
            sq = srck >> 7
            pair_o = out_ref[0, pl.ds(sq, 2), :]
            pair_c = comp_ref[0, pl.ds(sq, 2), :]
            pair = jnp.where(isout == 1, pair_o, pair_c)
            srl = srck & (VEC - 1)
            u = jnp.where(lane1 >= srl, pair[0:1, :], pair[1:2, :])
            # v[p mod 128] == byte srck + (p - dk) for p in [dk, dk+lk)
            v = pltpu.roll(u, shift=(dk - srck) & (VEC - 1), axis=1)
            mask = (flat >= dk) & (flat < dk + lk)
            span = jnp.where(mask, jnp.broadcast_to(v, (SPAN_ROWS, VEC)), span)
        out_ref[0, pl.ds(row0, SPAN_ROWS), :] = span
        return g + 1

    jax.lax.while_loop(cond, body, jnp.int32(0))


def decode_blocks_wavegroup(comp_u8, words_packed, ngroups, out_max: int,
                            interpret: bool | None = None):
    """Execute wave plans on device.

    comp_u8: uint8[B, cmax]; words_packed: int32[B, WROWS, 128]
    (pack_plan layout); ngroups: int32[B].  Returns uint8[B, out_max].
    Plans come from validated streams (sn_parse_tags + plan_waves), so
    the kernel performs no validation of its own; the runtime's device
    CRC still covers the output end to end.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _wg_jit(comp_u8, words_packed, ngroups, out_max=out_max,
                   interpret=interpret)


@functools.partial(jax.jit, static_argnames=("out_max", "interpret"))
def _wg_jit(comp_u8, words_packed, ngroups, out_max: int, interpret: bool):
    B, cmax = comp_u8.shape
    assert cmax % VEC == 0 and out_max % VEC == 0
    cr = rows_for(cmax)
    orows = rows_for(out_max, pad_rows=SPAN_ROWS)
    wrows = words_packed.shape[1]
    comp3 = jnp.zeros((B, cr, VEC), jnp.int32)
    comp3 = comp3.at[:, : cmax // VEC, :].set(
        comp_u8.astype(jnp.int32).reshape(B, cmax // VEC, VEC)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, cr, VEC), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wrows, VEC), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, orows, VEC), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out3 = pl.pallas_call(
        _wg_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, orows, VEC), jnp.int32),
        interpret=interpret,
    )(ngroups, comp3, words_packed)
    return out3.reshape(B, orows * VEC)[:, :out_max].astype(jnp.uint8)
