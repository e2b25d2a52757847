"""On-chip match finding: the sort-based candidate search (SURVEY.md
§7.3.2) as one pallas TPU kernel.

Contract: kernels.match_np.find_candidates — for every position of a
64 KiB block, the nearest previous and the first occurrence of the same
4-byte v-word, packed ``near | first << 16`` (0xFFFF = none), in
position order.  Bit-exact to the numpy contract (tests enforce); the
measured emission built on these candidates is ~4% SMALLER than the
reference greedy encoder (match_np docstring).

Formulation (all VPU/ROLL-local, no gathers):
  1. v-words from the staged word image via phase shifts (4 lane/sublane
     rolls), stacked phase-major into a [512,128] panel; the element's
     true block position is iota arithmetic.
  2. Bitonic sort of (v ^ 1<<31, pos-key) — 136 compare-exchange
     substages; XOR partners live on a single axis per substage (lane
     bits 0..6, sublane bits 7..15), so each is two static pltpu.rolls
     and selects.  Invalid tail positions carry pos-key BIG and sink to
     their value group's end, where no real position can see them.
  3. In sorted order: nearest-prev = the flat predecessor when v is
     equal; first-occurrence = segmented copy-scan of group heads
     (16 doubling steps of flat shifts).
  4. A second bitonic sort by true position routes the packed result
     back to position order.

The whole matcher is data-independent straight-line vector code — one
compiled program, no per-block control flow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .match_np import BIG, BMAX, NONE16

VEC = 128
LOG_N = 16                     # log2(BMAX)

__all__ = ["find_candidates_device", "stage_words"]


def _ile(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _axis_xor(x, j, bit0):
    """partner values x[f ^ (1 << j)] for row-major flat f over
    [rows, VEC]; bit j lives in a single axis, so the exchange is two
    static rolls + a bit-select on the hoisted mask (wrapped lanes are
    never selected)."""
    d = 1 << j
    if j < 7:
        up = pltpu.roll(x, shift=VEC - d, axis=1)   # x[.., l + d]
        dn = pltpu.roll(x, shift=d, axis=1)         # x[.., l - d]
    else:
        ds = d >> 7
        up = pltpu.roll(x, shift=x.shape[0] - ds, axis=0)
        dn = pltpu.roll(x, shift=ds, axis=0)
    return jnp.where(bit0, up, dn)


def _hoist_bits(shape, log_n):
    """bit j of the row-major flat index f, computed once per kernel:
    bits[j] is the i32 0/1 plane, bits0[j] the (bit == 0) mask."""
    bits = []
    for j in range(log_n + 1):
        if j >= log_n:
            bits.append(jnp.zeros(shape, jnp.int32))
        elif j < 7:
            bits.append((_ile(shape, 1) >> j) & 1)
        else:
            bits.append((_ile(shape, 0) >> (j - 7)) & 1)
    bits0 = [b == 0 for b in bits]
    return bits, bits0


def _bitonic(khi, klo, payloads, hoisted=None):
    """Ascending bitonic sort by (khi, klo); klo values are distinct.
    payloads move with the keys.  log2(n)*(log2(n)+1)/2 compare-exchange
    substages, fully unrolled; per-substage masks come from the hoisted
    bit planes (one compare each)."""
    shape = khi.shape
    log_n = (shape[0] * VEC).bit_length() - 1
    bits, bits0 = hoisted if hoisted is not None else _hoist_bits(
        shape, log_n)
    for k in range(log_n):
        for j in range(k, -1, -1):
            pkhi = _axis_xor(khi, j, bits0[j])
            pklo = _axis_xor(klo, j, bits0[j])
            lt = (khi < pkhi) | ((khi == pkhi) & (klo < pklo))
            take_min = bits[k + 1] == bits[j]
            use_partner = take_min ^ lt
            khi = jnp.where(use_partner, pkhi, khi)
            klo = jnp.where(use_partner, pklo, klo)
            payloads = [
                jnp.where(use_partner, _axis_xor(p, j, bits0[j]), p)
                for p in payloads
            ]
    return khi, klo, payloads


def _flat_shift(x, d, fill):
    """y[f] = x[f - d] for row-major flat f (d > 0); f < d gets fill."""
    dl = d % VEC
    dr = d // VEC
    if dl == 0:
        y = pltpu.roll(x, shift=dr, axis=0)
    else:
        a = pltpu.roll(x, shift=dl, axis=1)
        y = jnp.where(
            _ile(x.shape, 1) < dl,
            pltpu.roll(a, shift=dr + 1, axis=0),
            pltpu.roll(a, shift=dr, axis=0),
        )
    f = _ile(x.shape, 0) * VEC + _ile(x.shape, 1)
    return jnp.where(f >= d, y, fill)


def _match_kernel(scal_ref, w_ref, out_ref, *, group, slots, home):
    rows_w = slots // (4 * VEC)   # word-image rows
    log_n = slots.bit_length() - 1
    log_rw = rows_w.bit_length() - 1
    for g in range(group):
        # the scalar-prefetch ref is the WHOLE array (not grid-blocked)
        npos = scal_ref[pl.program_id(0) * group + g]
        w = w_ref[g]

        # flat-next word (word i+1); i = 128*r + l over [rows_w,128]
        nl = pltpu.roll(w, shift=VEC - 1, axis=1)
        nxt = jnp.where(_ile(w.shape, 1) == VEC - 1,
                        pltpu.roll(nl, shift=rows_w - 1, axis=0), nl)
        phases = [w]
        for k in (1, 2, 3):
            phases.append(
                jax.lax.shift_right_logical(w, jnp.int32(8 * k))
                | (nxt << jnp.int32(32 - 8 * k)))
        v = jnp.concatenate(phases, axis=0)          # phase-major panel

        # true block position: p = 4*(rows_w*... word idx) + phase
        S = _ile(v.shape, 0)
        L = _ile(v.shape, 1)
        pos = ((S & (rows_w - 1)) * (4 * VEC)) + 4 * L + (S >> log_rw)

        khi = v ^ jnp.int32(-0x80000000)             # unsigned-order bias
        klo = jnp.where(pos < npos, pos, pos + BIG)  # invalid slots last

        hoisted = _hoist_bits(v.shape, log_n)
        khi, klo, _ = _bitonic(khi, klo, [], hoisted)

        # nearest previous same-v (the flat predecessor in sorted order);
        # masks stay i32 0/1 — Mosaic rejects scalar-bool broadcasts
        # (vector i8 -> i1 truncation)
        prev_khi = _flat_shift(khi, 1, jnp.int32(0))
        prev_klo = _flat_shift(klo, 1, jnp.int32(BIG))
        fidx = S * VEC + L
        same_prev = jnp.where((prev_khi == khi) & (fidx > 0),
                              jnp.int32(1), jnp.int32(0))
        near = jnp.where((same_prev != 0) & (prev_klo < BIG), prev_klo,
                         jnp.int32(NONE16))

        # first occurrence: segmented copy-scan of group-head positions
        val = jnp.where(same_prev == 0, klo, jnp.int32(BIG + BMAX))
        flag = 1 - same_prev  # 1 at group heads
        for step in range(log_n):
            d = 1 << step
            pv = _flat_shift(val, d, jnp.int32(BIG + BMAX))
            pf = _flat_shift(flag, d, jnp.int32(1))
            val = jnp.where(flag != 0, val, pv)
            flag = jnp.maximum(flag, pf)
        first = jnp.where((same_prev != 0) & (val < BIG), val,
                          jnp.int32(NONE16))

        valid_self = klo < BIG
        near = jnp.where(valid_self, near, jnp.int32(NONE16))
        first = jnp.where(valid_self, first, jnp.int32(NONE16))
        packed = near | (first << 16)

        key2 = klo & jnp.int32(BIG - 1)  # true position
        if home:
            # route back to position order on device (second sort)
            zero = jnp.zeros_like(key2)
            _, _, pls = _bitonic(key2, zero, [packed], hoisted)
            out_ref[g] = pls[0]
        else:
            # ship (position, packed) pairs in sorted order; the host
            # scatters them home (one vectorized np write per block) —
            # saves the 136-substage second sort, doubles D2H
            rows_v = key2.shape[0]
            out_ref[g, :rows_v] = key2
            out_ref[g, rows_v:] = packed


@functools.partial(jax.jit,
                   static_argnames=("interpret", "group", "home"))
def _match_jit(w_i32, npos, interpret: bool, group: int,
               home: bool = True):
    B, rows_w, _ = w_i32.shape
    slots = rows_w * 4 * VEC
    rows_v = (slots // VEC) * (1 if home else 2)
    Bp = (B + group - 1) // group * group
    if Bp != B:
        w_i32 = jnp.pad(w_i32, ((0, Bp - B), (0, 0), (0, 0)))
        npos = jnp.pad(npos, ((0, Bp - B),))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // group,),
        in_specs=[
            pl.BlockSpec((group, rows_w, VEC), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, rows_v, VEC), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_match_kernel, group=group, slots=slots,
                          home=home),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, rows_v, VEC), jnp.int32),
        interpret=interpret,
    )(npos.astype(jnp.int32), w_i32)[:B]


def stage_words(blocks: list[bytes],
                slots: int = BMAX) -> tuple[np.ndarray, np.ndarray]:
    """(w_i32[B,slots/512,128], npos[B]) host staging for a batch:
    each block's bytes zero-padded to ``slots`` and viewed as int32
    words.  slots: power of two >= 4096 (>= every block length);
    smaller sorts for tests, BMAX in production."""
    B = len(blocks)
    assert slots >= 4096 and slots & (slots - 1) == 0
    w = np.zeros((B, slots), np.uint8)
    npos = np.zeros(B, np.int32)
    for i, blk in enumerate(blocks):
        b = np.frombuffer(bytes(blk), np.uint8)
        assert len(b) <= slots
        w[i, : len(b)] = b
        npos[i] = max(len(b) - 3, 0)
    return w.view(np.int32).reshape(B, slots // 512, VEC), npos


def scatter_home(pairs: np.ndarray) -> np.ndarray:
    """Host half of the home=False route: (position, packed) pairs in
    sorted order -> packed candidates in position order.  pairs:
    int32[B, 2*rows_v, VEC]; one vectorized scatter per block."""
    B, two_rows, _ = pairs.shape
    half = two_rows // 2
    key = pairs[:, :half].reshape(B, -1)
    val = pairs[:, half:].reshape(B, -1)
    out = np.empty_like(val)
    for b in range(B):
        out[b, key[b]] = val[b]
    return out


def find_candidates_device(blocks: list[bytes], *,
                           interpret: bool | None = None,
                           group: int = 1, slots: int = BMAX,
                           home: bool = True) -> np.ndarray:
    """int32[B, slots] packed candidates (match_np.find_candidates
    contract) for a batch of blocks, computed on device.  home=False
    ships sorted (position, packed) pairs and scatters on the host —
    identical result, ~1.8x faster kernel, 2x D2H."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    w_i32, npos = stage_words(blocks, slots)
    out = _match_jit(jnp.asarray(w_i32), jnp.asarray(npos),
                     interpret=interpret, group=group, home=home)
    if home:
        return np.asarray(out).reshape(len(blocks), slots)
    return scatter_home(np.asarray(out))
