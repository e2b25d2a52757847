"""Probe 20: two flat-kernel reworks, compile + cost on synthetic plans.

  smem    — per-trip scalar words (S | dstart | rot) read from the
            PREFETCHED scalar array with dynamic indices, replacing the
            starts VMEM row read + pltpu.roll + 4 lane extracts
            (~300 ns/trip of serial scalar plumbing).  Dynamic SMEM
            scalar reads are the one dynamic-index read Mosaic accepts
            (ntrips_ref[...] compiles today).
  dstart  — compose RMW windows at ARBITRARY dynamic row starts
            (pl.ds(D, 128) with D not bin-aligned): would let the packer
            drop the dbin-homogeneous subpanel constraint and pack
            ~100%-dense subpanels (fewer trips).

Variants: base (current plumbing), smem, smem+dstart.
Usage: python tools/mosaic_probe20.py [B] [trips]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from snappy_tpu.utils.jaxcache import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snappy_tpu.kernels.decode_flat import (
    NSUB,
    VEC,
    W_ROWS,
    _subpanel_gather,
)
from snappy_tpu.utils import hostmem

hostmem.tune_allocator()

_VALID = 1 << 21
B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
TRIPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
RB = 1040
OUT_ROWS = 520
NCALL = 8
TRIP_CAP = max(4, TRIPS)
GROUP = 4
REPS = 8


def make_kernel(variant: str):
    use_smem = variant in ("smem", "smem+dstart")

    def kern(scal_ref, b_ref, starts_ref, meta_ref, out_ref):
        blk = pl.program_id(0)
        lane_p = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 1)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 0)
        for g in range(GROUP):
            word0 = scal_ref[(blk * GROUP + g) * (1 + 4 * TRIP_CAP)]
            n = word0 & 0xFFFF
            out_ref[g, :, :] = jnp.zeros((OUT_ROWS, VEC), jnp.float32)

            def body(i, c, g=g):
                mrow = meta_ref[g, pl.ds(2 * NSUB * i, 2 * NSUB), :]
                if not use_smem:
                    srow = starts_ref[g, pl.ds(i >> 5, 1), :]
                    sr = pltpu.roll(
                        srow, shift=(VEC - ((i & 31) * NSUB)) & (VEC - 1),
                        axis=1)
                vs, masks, drels, Ds = [], [], [], []
                for s in range(NSUB):
                    if use_smem:
                        w = scal_ref[(blk * GROUP + g) * (1 + 4 * TRIP_CAP)
                                     + 1 + i * 4 + s]
                    else:
                        w = sr[0, s]
                    S = w & 1023
                    Ds.append(jax.lax.shift_right_logical(w, 10) & 1023)
                    rot_u = jax.lax.shift_right_logical(w, 20) & 127
                    bwin = b_ref[g, pl.ds(S, W_ROWS), :]
                    v, mask, drel = _subpanel_gather(
                        mrow[s:s + 1, :], mrow[NSUB + s:NSUB + s + 1, :],
                        bwin, lane_p, rot_u=rot_u)
                    vs.append(v)
                    masks.append(mask)
                    drels.append(drel)
                for s in range(NSUB):
                    mk = jnp.where(masks[s], vs[s], 0.0)
                    ds_t = (row_iota == drels[s]).astype(jnp.bfloat16)
                    contrib = jax.lax.dot_general(
                        ds_t, mk.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    out_ref[g, pl.ds(Ds[s], VEC), :] += contrib
                return c

            jax.lax.fori_loop(0, n, body, jnp.int32(0))

    return kern


@functools.partial(jax.jit, static_argnames=("variant",))
def run(scal, b_i32, starts, meta, variant: str):
    Bp = b_i32.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // GROUP,),
        in_specs=[
            pl.BlockSpec((GROUP, RB, VEC), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 8, VEC), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 2 * NSUB * TRIP_CAP, VEC),
                         lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GROUP, OUT_ROWS, VEC),
                               lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        make_kernel(variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, OUT_ROWS, VEC), jnp.float32),
    )(scal, b_i32, starts, meta)
    return out


def synth(B, trips, rng, free_dstart=False):
    NMR = 2 * NSUB * TRIP_CAP
    b_i32 = rng.integers(0, 256, (B, RB, VEC)).astype(np.int32)
    meta = np.zeros((B, NMR, VEC), np.int32)
    starts = np.zeros((B, 8, VEC), np.int32)
    scal = np.zeros((B, 1 + 4 * TRIP_CAP), np.int32)
    scal[:, 0] = trips
    for t in range(trips):
        for s in range(NSUB):
            qrel = rng.integers(0, W_ROWS - 1, VEC)
            rot = int(rng.integers(1, VEC))
            drel = np.arange(VEC)
            meta[:, 2 * NSUB * t + s, :] = qrel | (rot << 7)
            meta[:, 2 * NSUB * t + NSUB + s, :] = (
                0 | (127 << 7) | (drel << 14) | _VALID)
            S = int(rng.integers(0, RB - W_ROWS))
            if free_dstart:
                D = int(rng.integers(0, OUT_ROWS - VEC))
            else:
                D = ((t * NSUB + s) % 4) * VEC
            w = S | (D << 10) | (rot << 20)
            starts[:, t >> 5, (t & 31) * 4 + s] = w
            scal[:, 1 + t * 4 + s] = w
    return scal, b_i32, starts, meta


def replay_np(scal, b_i32, meta, blk):
    out = np.zeros((OUT_ROWS, VEC), np.float32)
    n = int(scal[blk, 0]) & 0xFFFF
    bb = b_i32[blk].reshape(-1)
    for i in range(n):
        for s in range(NSUB):
            w = int(scal[blk, 1 + i * 4 + s])
            S = w & 1023
            D = (w >> 10) & 1023
            rot = (w >> 20) & 127
            phi = (VEC - rot) & (VEC - 1)
            for k in range(VEC):
                a = int(meta[blk, 2 * NSUB * i + s, k])
                bw = int(meta[blk, 2 * NSUB * i + NSUB + s, k])
                if not (bw & _VALID):
                    continue
                qrel = a & 127
                dphi = bw & 127
                lnm1 = (bw >> 7) & 127
                drel = (bw >> 14) & 127
                base = (S + qrel) * VEC + phi
                for l in range(dphi, dphi + lnm1 + 1):
                    out[D + drel, l] += bb[base + l]
    return out


rng = np.random.default_rng(0)
print(f"devices: {jax.devices()}", flush=True)
combine = jax.jit(lambda *xs: sum(jnp.sum(x[:, :1, :1]) for x in xs))

for label, variant, free_d in (
    ("base", "base", False),
    ("smem", "smem", False),
    ("smem+dstart", "smem+dstart", True),
):
    scal, b_i32, starts, meta = synth(B, TRIPS, rng, free_dstart=free_d)
    args = tuple(map(jax.device_put, (scal.reshape(-1), b_i32, starts, meta)))
    t0 = time.time()
    try:
        out = run(*args, variant=variant)
        got = np.asarray(out[0])
    except Exception as e:
        print(f"{label:12s} FAILED: {str(e)[:160]}", flush=True)
        continue
    comp = time.time() - t0
    want = replay_np(scal, b_i32, meta, 0)
    ok = np.array_equal(got, want)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(REPS):
            c = combine(run(*args, variant=variant))
            acc = c if acc is None else acc + c
        float(np.asarray(acc).item())
        times.append((time.perf_counter() - t0) / REPS)
    best = min(times)
    print(f"{label:12s} exact={ok} {best*1e3:7.2f} ms/call "
          f"{best/B*1e6:6.2f} us/block {best/(B*TRIPS)*1e9:6.0f} ns/trip "
          f"(compile {comp:.1f}s)", flush=True)
