"""Flat-plan decoder: host resolves every output byte to a dependency-free
source, the TPU executes 512-piece trips with MXU one-hot gathers.

Why (docs/performance.md): every prior on-TPU decode engine is bound by
Mosaic's strictly in-order execution of a serial dependency chain —
~370-900 ns per group/tag.  The flat plan removes the chain entirely:
every *piece* reads a linear window of a byte buffer ``B`` (= one zero
pad row + the compressed payload + a "mirror" side-buffer), so no piece
depends on another piece's output.

Planner (v2.5, the round-3 refinement of the round-2 redesign): the
tag stream is already validated (native sn_parse_tags), so the host
replays it into the mirror region of B DIRECTLY as a full output
IMAGE (mirror[j] = out[j], a tight C++ LZ loop), then classifies
emissions in one pass:

- literals >= DIRECT_T gather straight from the compressed payload;
- copies >= DIRECT_T whose source lies inside one literal's output
  remap to the payload (out[s0..s0+L) == comp bytes by construction);
- everything else — short emissions and copy-of-copy chains — rides a
  pending *run*: maximal dst-contiguous spans emitted as full-row
  linear pieces pointing at the image (no copy, no padding).

Because the mirror base is 128-aligned and mirror[j] = out[j], EVERY
run piece has rot == 0 by construction: the whole run class rides the
kernel's roll-free aligned trip body, subpanels pack phase-uniform and
window-perfect (consecutive mirror rows), and the v2 machinery this
replaces — per-run memcpy into a compacted mirror, per-run phase pads,
the 64-row pad slack, and the mirror-capacity fallback — is deleted
outright.  v2 measured effects carried forward: pieces/block ~20x
below one-piece-per-emission; v2.5 removes up to 64 KiB/block of host
memcpy and drops decode trips/block toward 1 (every run subpanel is
aligned AND window-dense).

Round-3 measurement note (docs/performance.md): the VERDICT-suggested
alternative — device-side copy resolution via dependency-LEVELED trips
so the host ships unresolved plans — was measured DEAD on tag-dense
data: corpus chains reach level 2587 with a near-uniform level
distribution (341 trips/block at level-homogeneous subpanels vs 2.3
today), because text copies source bytes written moments earlier.  The
host replay stays; the win is making it write the device buffer once.

Device kernel: pieces are split at output-row boundaries (dst stays in
one 128-byte row, len <= 128) and carry a linear source: out[drow*128+l]
= B[base + l - dphi] for l in [dphi, dphi+len).  The kernel executes 4
subpanels of 128 pieces per loop trip.  Per subpanel: a one-hot [128, W]
row-select matmul against a dynamically sliced W-row window of B
gathers every piece's source row pair at MXU rate; per-piece lane
alignment is applied either by take_along_axis(axis=1) or by a masked
7-roll barrel shifter (both Mosaic-provable; see tools/mosaic_probe9/10);
and a one-hot [128, 128] compose matmul scatters the masked piece rows
into the subpanel's 128-row destination bin of the output (dynamic-start
read-modify-write accumulate, the wave kernel's proven construct).
Disjoint destination bytes make the f32 accumulation exact.  The packer
bins pieces by (dst>>14, then source row) so both the gather and the
compose stay windowed — a full-height compose matmul is the one
construct the Mosaic service rejects (tools/mosaic_probe10).

The runtime's device CRC covers the output end to end.
`execute_flat_np` replays a *packed* plan byte-for-byte on numpy and is
the contract the pallas kernel is tested against.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "PANEL",
    "NSUB",
    "W_ROWS",
    "PAT_ROWS",
    "TRIP_CAP",
    "plan_flat",
    "pack_trips",
    "execute_flat_np",
    "decode_blocks_flat",
    "build_b_bytes",
    "rows_b_for",
    "mirror_base_for",
]

VEC = 128
NSUB = 4             # subpanels per device loop trip
PANEL = NSUB * VEC   # pieces per trip
W_ROWS = 128         # source window rows per subpanel (static slice width)
PAT_ROWS = 512       # mirror rows: a full 64 KiB output IMAGE
                     # (mirror[j] = out[j]; v2's pad slack is gone —
                     # the aligned base makes every run piece rot 0)
OUT_ROWS = 520       # 64 KiB output + slack, multiple of 8
TRIP_CAP = 48        # device trips per block (fallback past this).
                     # Corpus plans run 2-3 trips; halving the cap from
                     # 96 halves the meta panel's VMEM + DMA per block
                     # (the budget that bounds the kernel's group size)

# Emissions >= DIRECT_T whose bytes exist verbatim in the payload
# (literals, and copies sourced inside one literal) become direct
# payload gathers; everything else rides mirrored runs.  Measured on the
# bench corpus: pieces/block 10744 -> 513 (~1 device trip).
#
# The threshold is sized for the packer's ROT-HOMOGENEOUS subpanels: a
# direct gather lands at an arbitrary phase, so each distinct literal
# costs its own rotation group — worth it only when the literal spans
# many same-rot full rows.  Below the threshold the bytes ride the
# mirror instead, where the planner phase-aligns them for the roll-free
# aligned trip class (a 40 B-literal corpus fragmented into 75+ trips
# under DIRECT_T=32; see test_many_distinct_overlapping_copy_runs).
DIRECT_T = 4096


def rows_b_for(cmax: int) -> int:
    """Rows of the B buffer for a given compressed row width: one zero
    pad row + payload rows (the mirror image starts on the next row
    boundary, so its base is 128-aligned) + mirror + one trailing
    guard row, rounded to the int32 sublane tile."""
    r = 1 + (cmax + VEC - 1) // VEC + PAT_ROWS + 1
    return (r + 7) & ~7


def mirror_base_for(clen: int) -> int:
    """B byte address of mirror[0]: first row boundary past the
    payload.  128-aligned by construction — the property that makes
    every mirror piece rot 0 (mirror[j] = out[j], so source phase ==
    destination phase)."""
    return (VEC + clen + VEC - 1) & ~(VEC - 1)


def plan_flat(recs: np.ndarray, n_tags: int, comp: np.ndarray,
              piece_cap: int | None = None):
    """Resolve a parsed tag stream into dependency-free pieces (v2).

    recs: int32[T, 4] rows (kind, out_len, offset|lit_src, out_start)
    from sn_parse_tags; comp: uint8[clen] payload (tag bytes included —
    lit_src offsets index into it).

    Returns (pieces int32[P, 3] of (b_src, dst, len), mirror uint8
    [PAT_ROWS*128]) or None when piece_cap or the mirror capacity is
    exceeded (caller falls back to another engine).  This is the
    readable contract; native sn_plan_flat mirrors it
    decision-for-decision (tests enforce bit-identical outputs).
    """
    COMP_BASE = VEC  # B byte address of comp[0] (row 0 is the pad row)
    out_end = 0
    if n_tags:
        out_end = int(recs[n_tags - 1, 3]) + int(recs[n_tags - 1, 1])
    if out_end > PAT_ROWS * VEC:
        return None  # block exceeds the 64 KiB image (caller falls back)

    # scratch decode: the stream is already validated, replay it.  The
    # scratch IS the mirror (a full output image): pat[j] = out[j].
    dec = np.zeros(PAT_ROWS * VEC, dtype=np.uint8)
    for t in range(n_tags):
        kind, L, arg, d = (int(recs[t, 0]), int(recs[t, 1]),
                           int(recs[t, 2]), int(recs[t, 3]))
        if kind == 0:
            dec[d : d + L] = comp[arg : arg + L]
        else:
            s0 = d - arg
            if arg >= L:
                dec[d : d + L] = dec[s0 : s0 + L]
            else:  # overlapping: periodic extension
                reps = (L + arg - 1) // arg
                dec[d : d + L] = np.tile(dec[s0:d], reps)[:L]

    pieces: list[tuple[int, int, int]] = []
    pat_base0 = mirror_base_for(len(comp))  # 128-aligned mirror base

    # literal output intervals (ascending), for copy -> payload remap
    import bisect

    lit_s: list[int] = []
    lit_e: list[int] = []
    lit_a: list[int] = []

    def emit_linear(b: int, dst: int, ln: int) -> None:
        while ln > 0:
            take = min(ln, VEC - (dst & (VEC - 1)))
            pieces.append((b, dst, take))
            b += take
            dst += take
            ln -= take

    run_start = -1
    run_end = -1

    def flush_run() -> None:
        nonlocal run_start
        if run_start < 0:
            return
        # the mirror is the output image at an aligned base: the run's
        # source address is pat_base0 + run_start — same phase as the
        # destination, so every piece is rot 0 (roll-free trip class)
        emit_linear(pat_base0 + run_start, run_start, run_end - run_start)
        run_start = -1

    for t in range(n_tags):
        kind, L, arg, d = (int(recs[t, 0]), int(recs[t, 1]),
                           int(recs[t, 2]), int(recs[t, 3]))
        b_direct = -1
        if kind == 0:
            lit_s.append(d)
            lit_e.append(d + L)
            lit_a.append(arg)
            if L >= DIRECT_T:
                b_direct = COMP_BASE + arg
        elif L >= DIRECT_T:
            s0 = d - arg
            i = bisect.bisect_right(lit_s, s0) - 1
            if i >= 0 and lit_e[i] >= s0 + L:
                b_direct = COMP_BASE + lit_a[i] + (s0 - lit_s[i])
        if b_direct >= 0:
            flush_run()
            emit_linear(b_direct, d, L)
        else:
            if run_start < 0:
                run_start = d
            elif run_end != d:  # non-contiguous (cannot happen: tags tile)
                flush_run()
                run_start = d
            run_end = d + L
        if piece_cap is not None and len(pieces) > piece_cap:
            return None
    flush_run()
    if piece_cap is not None and len(pieces) > piece_cap:
        return None

    return np.array(pieces, dtype=np.int32).reshape(-1, 3), dec



# B-word valid bit: pad lanes have it clear, so their mask selects
# nothing and they contribute zero regardless of destination.
_VALID = 1 << 21


def pack_trips(pieces: np.ndarray, trip_cap: int, rb: int):
    """Sort pieces by (rot class, rot, dst row, source row) and pack
    them into trips.

    A trip holds NSUB subpanels of up to 128 pieces.  Each subpanel
    reads one dynamically-placed W_ROWS-row window of B (all its
    pieces' source row pairs fit a [S, S+W_ROWS-1] span) and composes
    into one dynamically-placed 128-row destination window starting at
    Dq = min(drow) — the FREE-DSTART packing (tools/mosaic_probe20:
    the compose RMW accepts arbitrary dynamic row starts at no cost),
    which drops the old dbin-homogeneity constraint so subpanels pack
    ~bin-boundary-free and plans need fewer trips.

    Trips are CLASS-HOMOGENEOUS: pieces with rot != 0 pack into the
    leading trips, rot == 0 pieces (phase-aligned mirror runs — the
    planner aligns them on purpose) into the trailing trips, padded to
    a trip boundary between the classes.  The kernel runs the trailing
    trips through a roll-free body (no rotation, no second row gather).

    Within the rot class, subpanels are additionally ROT-HOMOGENEOUS:
    every piece of a subpanel shares one rotation, carried in the
    subpanel's starts word — the kernel applies it as a SINGLE
    dynamic-shift ``pltpu.roll`` instead of a per-piece 7-step masked
    barrel shifter (the dominant rot-trip latency, ~1.2 us/trip
    measured; tools/mosaic_probe16).  Long literals' pieces share one
    rotation by construction (consecutive rows, one phase), so the
    extra grouping fragments little.

    Returns (meta int32[2*NSUB*trip_cap, 128], starts int32[8, 128],
    packed) or None if more than trip_cap trips are needed, where
    packed = n_trips | (n_aligned_trips << 16).  A plain trip count
    (high bits 0) therefore stays valid — every trip takes the full
    body.  Layout: trip t rows [2*NSUB*t .. +NSUB) hold the A words of
    subpanels 0..3 (qrel | rot<<7), rows [.. +2*NSUB) the B words
    (dphi | lenm1<<7 | drel<<14 | _VALID, drel = drow - Dq); subpanel
    s's packed (S | Dq<<10 | rot<<20) word lives at
    starts[t>>5, (t&31)*4+s].  The kernel clamps the compose window to
    the output panel (Dc = min(Dq, out_rows-128)) and shifts drel by
    Dq - Dc, so Dq near the panel tail needs no packer-side knowledge
    of out_rows.
    """
    P = len(pieces)
    meta = np.zeros((2 * NSUB * trip_cap, VEC), dtype=np.int32)
    starts = np.zeros((8, VEC), dtype=np.int32)
    if P == 0:
        return meta, starts, 0
    if trip_cap > 256:
        raise ValueError("trip_cap exceeds the starts-plane capacity")

    b = pieces[:, 0]
    dst = pieces[:, 1]
    ln = pieces[:, 2]
    dphi = dst & (VEC - 1)
    base = b - dphi          # may reach into the pad row (>= 0)
    q = base >> 7
    rot = (VEC - (base & (VEC - 1))) & (VEC - 1)
    drow = dst >> 7
    cls = (rot == 0).astype(np.int32)  # rot pieces first, aligned last

    order = np.lexsort((q, drow, rot, cls))
    q_s = q[order]
    rot_s = rot[order]
    drow_s = drow[order]
    R = int(P - cls.sum())  # index of the first aligned piece

    n_sub = 0
    rot_subs = 0
    i = 0
    while i < P:
        if i == R and n_sub % NSUB:  # class boundary: pad to a trip
            n_sub += NSUB - n_sub % NSUB
        t, s = divmod(n_sub, NSUB)
        if t >= trip_cap:
            return None
        r0 = int(rot_s[i])
        d0 = int(drow_s[i])       # min drow: drow ascends within (cls,rot)
        qlo = qhi = int(q_s[i])
        cls_end = R if i < R else P
        j = i + 1
        # greedy extension: rot-homogeneous, src rows fit one W_ROWS
        # window, dst rows fit one 128-row window
        while j < min(i + VEC, cls_end):
            idx = j
            if int(rot_s[idx]) != r0 or int(drow_s[idx]) - d0 > VEC - 1:
                break
            nqlo = min(qlo, int(q_s[idx]))
            nqhi = max(qhi, int(q_s[idx]))
            if nqhi - min(nqlo, rb - W_ROWS) > W_ROWS - 2:
                break
            qlo, qhi = nqlo, nqhi
            j += 1
        S = min(qlo, rb - W_ROWS)
        idx = order[i:j]
        k = j - i
        a_words = ((q[idx] - S) | (rot[idx] << 7)).astype(np.int32)
        b_words = (
            dphi[idx] | ((ln[idx] - 1) << 7) | ((drow[idx] - d0) << 14)
            | _VALID
        ).astype(np.int32)
        meta[2 * NSUB * t + s, :k] = a_words
        meta[2 * NSUB * t + NSUB + s, :k] = b_words
        starts[t >> 5, (t & 31) * 4 + s] = S | (d0 << 10) | (r0 << 20)
        n_sub += 1
        if i < R:
            rot_subs = n_sub
        i = j
    n_trips = (n_sub + NSUB - 1) // NSUB
    n_aligned = n_trips - (rot_subs + NSUB - 1) // NSUB
    return meta, starts, n_trips | (n_aligned << 16)


def execute_flat_np(meta: np.ndarray, starts: np.ndarray, n_trips: int,
                    b_bytes: np.ndarray, dst_len: int,
                    out_rows: int = OUT_ROWS) -> np.ndarray:
    """Numpy contract: replay a packed plan exactly as the kernel does
    (trip-ordered, piece-ordered; disjoint writes).  n_trips may carry
    the aligned-trip count in its high bits (pack_trips) — the replay
    is class-agnostic (rot == 0 rotates by nothing)."""
    out = np.zeros(out_rows * VEC, dtype=np.uint8)
    for t in range(n_trips & 0xFFFF):
        for s in range(NSUB):
            w = int(starts[t >> 5, (t & 31) * 4 + s])
            S = w & 1023
            Dq = (w >> 10) & 1023
            # clamp the compose window to the panel, exactly as the
            # kernel does; drel shifts by the clamp amount
            D = min(Dq, out_rows - VEC)
            for k in range(VEC):
                a = int(meta[2 * NSUB * t + s, k])
                bw = int(meta[2 * NSUB * t + NSUB + s, k])
                if not (bw & _VALID):
                    continue
                qrel = a & 127
                rot = (a >> 7) & 127
                dphi = bw & 127
                lnm1 = (bw >> 7) & 127
                drel = ((bw >> 14) & 127) + (Dq - D)
                phi = (VEC - rot) & (VEC - 1)
                base = (S + qrel) * VEC + phi
                for l in range(dphi, dphi + lnm1 + 1):
                    out[(D + drel) * VEC + l] = b_bytes[base + l]
    return out[:dst_len]


def build_b_bytes(comp: np.ndarray, mirror: np.ndarray, rb: int) -> np.ndarray:
    """Host-side B buffer: pad row + comp + image mirror (at the
    128-aligned base) + guard."""
    b = np.zeros(rb * VEC, dtype=np.uint8)
    b[VEC : VEC + len(comp)] = comp
    mb = mirror_base_for(len(comp))
    b[mb : mb + len(mirror)] = mirror
    return b


# ---------------------------------------------------------------------
# pallas kernel

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _subpanel_gather(mrow_a, mrow_b, bwin_i32, lane_p, rot_u=None,
                     aligned: bool = False):
    """One 128-piece subpanel's one-hot row gather.
    Returns (v (128,128) f32 gathered source bytes, mask, drel (1,128)).
    aligned=True asserts every piece has rot == 0 (pack_trips' trailing
    trip class).  For the rot class, rot_u is the subpanel's uniform
    rotation (pack_trips packs subpanels rot-homogeneous): instead of
    gathering the row PAIR with two matmuls and rolling the result, the
    WINDOW itself is pre-shifted by the uniform phase — one dynamic
    lane roll + one static sublane roll + lane select, all off the
    gather's result chain — so both classes take a single gather
    matmul: w_shift[r, l] = B[(S+r)*128 + phi + l], v[p] =
    w_shift[qrel[p]]."""
    a_col = jnp.transpose(mrow_a, (1, 0))            # (128,1)
    b_col = jnp.transpose(mrow_b, (1, 0))
    qrel = a_col & 127
    dphi = b_col & 127
    lenm1 = jax.lax.shift_right_logical(b_col, 7) & 127
    valid = (b_col & _VALID) != 0
    drel = jax.lax.shift_right_logical(mrow_b, 14) & 127   # (1,128)
    mask = valid & (lane_p >= dphi) & (lane_p - dphi <= lenm1)
    if aligned:
        w = bwin_i32
    else:
        # rolls stay i32 (bf16 pltpu.roll is rejected); rot_u in 1..127
        a = pltpu.roll(bwin_i32, shift=rot_u, axis=1)
        a_up = pltpu.roll(a, shift=W_ROWS - 1, axis=0)   # a[(r+1) % W]
        lane_w2 = jax.lax.broadcasted_iota(jnp.int32, (W_ROWS, VEC), 1)
        w = jnp.where(lane_w2 < rot_u, a, a_up)
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (VEC, W_ROWS), 1)
    # one-hot row gather of every piece's (pre-shifted) source row (MXU)
    rs0 = (lane_w == qrel).astype(jnp.bfloat16)
    v = jax.lax.dot_general(rs0, w.astype(jnp.bfloat16),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return v, mask, drel


def _flat_kernel(scal_ref, b_ref, meta_ref, out_ref,
                 *, out_rows: int, group: int, trip_cap: int):
    # Formulation constraints (measured, tools/mosaic_probe9/10/12/13/
    # 20): B is i32 in VMEM (8-sublane tile -> arbitrary dynamic window
    # starts compile; bf16 refs with unaligned dyn starts do not),
    # windows are cast to bf16 *after* the slice, per-trip scalar words
    # (S | Dq | rot) are read from the PREFETCHED scalar array with
    # dynamic indices — the one dynamic-index read Mosaic accepts
    # (probe20: -6.5%/trip vs the VMEM starts row + roll + lane
    # extracts it replaced), rolls stay f32 (bf16 pltpu.roll is
    # rejected), and the compose stays per-subpanel (the (128,512)
    # one-hot compose is rejected in situ) but starts at an ARBITRARY
    # dynamic row Dq (probe20: free) — the packer no longer bins
    # destinations.  Subpanels are rot-homogeneous (pack_trips), so
    # lane alignment is applied to the WINDOW, not the gather result:
    # one dynamic lane roll + one static sublane roll + select
    # pre-shift the window by the subpanel's uniform phase, and a
    # SINGLE gather matmul replaces the row-pair gather (two matmuls +
    # result roll) — the rot body drops to the aligned body's matmul
    # count, and the rolls sit off the gather's dependency chain.  (The
    # per-piece 7-step barrel shifter this lineage replaced cost ~1.2
    # us/trip; tools/mosaic_probe16 at B=1024.)  `group` blocks share
    # one grid step to amortize the per-step fixed cost
    # (tools/mosaic_probe15).
    blk = pl.program_id(0)
    stride = 1 + NSUB * trip_cap
    lane_p = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 0)

    for g in range(group):
        sbase = (blk * group + g) * stride
        word = scal_ref[sbase]
        n = word & 0xFFFF
        # leading trips carry rot != 0 pieces (full body); trailing
        # trips are phase-aligned (roll-free body) — pack_trips packs
        # the classes into disjoint trips on purpose
        n_rot = n - (jax.lax.shift_right_logical(word, 16) & 0xFFFF)
        out_ref[g, :, :] = jnp.zeros((out_rows, VEC), jnp.float32)

        def make_body(aligned, g=g, sbase=sbase):
            def body(i, c):
                mrow = meta_ref[g, pl.ds(2 * NSUB * i, 2 * NSUB), :]
                vs, masks, drels, Ds = [], [], [], []
                for s in range(NSUB):
                    w = scal_ref[sbase + 1 + i * NSUB + s]
                    S = w & 1023
                    Dq = jax.lax.shift_right_logical(w, 10) & 1023
                    # clamp the compose window to the panel; the
                    # one-hot row shifts by the clamp amount so the
                    # write lands at the true destination
                    Dc = jnp.minimum(Dq, out_rows - VEC)
                    Ds.append((Dc, Dq - Dc))
                    rot_u = jax.lax.shift_right_logical(w, 20) & 127
                    bwin = b_ref[g, pl.ds(S, W_ROWS), :]
                    if aligned:
                        v, mask, drel = _subpanel_gather(
                            mrow[s:s + 1, :], mrow[NSUB + s:NSUB + s + 1, :],
                            bwin, lane_p, aligned=True)
                    else:
                        v, mask, drel = _subpanel_gather(
                            mrow[s:s + 1, :], mrow[NSUB + s:NSUB + s + 1, :],
                            bwin, lane_p, rot_u=rot_u)
                    vs.append(v)
                    masks.append(mask)
                    drels.append(drel)
                for s in range(NSUB):
                    mk = jnp.where(masks[s], vs[s], 0.0)
                    # one-hot compose matmul scatters the 128 masked piece
                    # rows into the subpanel's 128-row destination window;
                    # disjoint destination bytes keep the f32 accumulation
                    # exact
                    Dc, dadj = Ds[s]
                    ds_t = (row_iota == drels[s] + dadj).astype(jnp.bfloat16)
                    contrib = jax.lax.dot_general(
                        ds_t, mk.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    out_ref[g, pl.ds(Dc, VEC), :] += contrib
                return c
            return body

        jax.lax.fori_loop(0, n_rot, make_body(False), jnp.int32(0))
        jax.lax.fori_loop(n_rot, n, make_body(True), jnp.int32(0))


GROUP = 4  # blocks per grid step (amortizes the ~8 us/step fixed cost)


def decode_blocks_flat(b_u8, meta, starts, ntrips, dst_max: int,
                       interpret: bool | None = None,
                       out_rows: int = OUT_ROWS,
                       group: int | None = None,
                       raw_out: bool = False):
    """Execute packed flat plans on device.

    b_u8: uint8[B, rb*128] host-built B buffers (build_b_bytes), or
    int32[B, rb, 128] pre-cast by the host (skips a full-HBM-pass XLA
    cast per call — the staging path the runtime and bench use);
    meta: int32[B, 2*NSUB*trip_cap, 128]; starts: int32[B, 8, 128];
    ntrips: int32[B].  Returns uint8[B, dst_max].  out_rows sizes the
    device output panel (decode: OUT_ROWS; the flat-encode emission
    path passes a larger panel for worst-case compressed lengths).
    group blocks share one grid step (padded with empty plans).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if group is None:
        group = GROUP
    return _flat_jit(b_u8, meta, starts, ntrips, dst_max=dst_max,
                     interpret=interpret,
                     out_rows=out_rows, group=group, raw_out=raw_out)


@functools.partial(jax.jit,
                   static_argnames=("dst_max", "interpret",
                                    "out_rows", "group", "raw_out"))
def _flat_jit(b_u8, meta, starts, ntrips, dst_max: int, interpret: bool,
              out_rows: int, group: int,
              raw_out: bool = False):
    if b_u8.ndim == 3:  # pre-cast int32 (B, rb, VEC)
        b_i32 = b_u8
        B, rb, _ = b_u8.shape
    else:
        B, nbytes = b_u8.shape
        rb = nbytes // VEC
        b_i32 = b_u8.astype(jnp.int32).reshape(B, rb, VEC)
    nmr = meta.shape[1]
    trip_cap = nmr // (2 * NSUB)
    Bp = (B + group - 1) // group * group
    if Bp != B:  # pad with empty plans (ntrips 0)
        pad = ((0, Bp - B), (0, 0), (0, 0))
        b_i32 = jnp.pad(b_i32, pad)
        meta = jnp.pad(meta, pad)
        starts = jnp.pad(starts, pad)
        ntrips = jnp.pad(ntrips, ((0, Bp - B),))
    # scalar-prefetch plan words: per block [packed count, then trip t
    # subpanel s's (S | Dq<<10 | rot<<20) word at 1 + t*NSUB + s].  The
    # starts plane already stores trip t subpanel s at flat index
    # t*NSUB + s, so this is a slice + concat, not a repack.
    scal = jnp.concatenate(
        [ntrips.astype(jnp.int32).reshape(Bp, 1),
         starts.reshape(Bp, 8 * VEC)[:, : NSUB * trip_cap]],
        axis=1).reshape(-1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // group,),
        in_specs=[
            pl.BlockSpec((group, rb, VEC), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, nmr, VEC), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, out_rows, VEC),
                               lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out3 = pl.pallas_call(
        functools.partial(_flat_kernel,
                          out_rows=out_rows, group=group,
                          trip_cap=trip_cap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, out_rows, VEC), jnp.float32),
        interpret=interpret,
    )(scal, b_i32, meta)
    if raw_out:  # bench ablation: f32 panel as-is (holds exact 0..255)
        return out3[:B]
    # one cast pass: the f32 panel holds exact integers 0..255
    out = out3.astype(jnp.uint8).reshape(Bp, out_rows * VEC)
    return out[:B, :dst_max]
