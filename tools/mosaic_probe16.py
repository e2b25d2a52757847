"""Probe 16: per-trip cost decomposition of the flat kernel.

Times four kernel variants on identical synthetic plans (output bytes
are NOT checked for the ablated variants — timing only):
  full      — the production kernel (u0+u1 gather, 7-roll barrel shifter)
  noroll    — rolls removed (models a rot==0 trip class)
  noroll1g  — rolls removed AND u1 gather removed (the aligned-trip body)
  mmshift   — barrel shifter steps as one-hot matmuls instead of
              pltpu.roll (tests whether matmul issue beats roll latency)
  normw     — noroll1g with the dynamic-start += accumulate replaced by
              a static-position plain store (isolates the RMW cost)
  nocompose — noroll1g minus the compose matmul AND the RMW (gather +
              mask only; isolates gather cost)
  noslice   — noroll1g with STATIC window starts (S=0; wrong bytes,
              isolates the dynamic-start b_ref slice cost)
  noscal    — noroll1g with no starts-plane read at all (S=0, D from
              loop index; isolates the scalar plumbing cost)
  empty     — meta/starts reads only (loop + scalar-plumbing floor)

Usage: python tools/mosaic_probe16.py [B] [trips]
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

from snappy_tpu.utils import hostmem

hostmem.tune_allocator()

VEC = 128
NSUB = 4
W_ROWS = 128
OUT_ROWS = 520
_VALID = 1 << 21

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
TRIPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
GROUP = 4
RB = 1040


def make_kernel(variant: str, group: int):
    def kern(ntrips_ref, b_ref, starts_ref, meta_ref, out_ref):
        blk = pl.program_id(0)
        lane_p = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 1)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 0)
        if variant == "mmshift":
            rowi = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 0)
            coli = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 1)
            shifts = [
                (((rowi + (1 << k)) & (VEC - 1)) == coli).astype(jnp.bfloat16)
                for k in range(7)
            ]
        for g in range(group):
            n = ntrips_ref[blk * group + g]
            out_ref[g, :, :] = jnp.zeros((OUT_ROWS, VEC), jnp.float32)

            def body(i, c, g=g):
                srow = starts_ref[g, pl.ds(i >> 5, 1), :]
                sr = pltpu.roll(
                    srow, shift=(VEC - ((i & 31) * NSUB)) & (VEC - 1), axis=1)
                mrow = meta_ref[g, pl.ds(2 * NSUB * i, 2 * NSUB), :]
                vs, rots, masks, drels, Ds = [], [], [], [], []
                if variant == "empty":
                    acc = (sr[0, 0] + mrow[0, 0]).astype(jnp.float32)
                    out_ref[g, 0:1, :] += jnp.full((1, VEC), acc, jnp.float32)
                    return c
                for s in range(NSUB):
                    w = sr[0, s]
                    if variant == "noscal":
                        S = jnp.int32(0)
                        Ds.append(((i + s) & 3) * VEC)
                    else:
                        S = w & 1023
                        Ds.append(jax.lax.shift_right_logical(w, 10) * VEC)
                    if variant in ("noslice", "noscal"):
                        bwin = b_ref[g, 0:W_ROWS, :].astype(jnp.bfloat16)
                    else:
                        bwin = b_ref[g, pl.ds(S, W_ROWS), :].astype(jnp.bfloat16)
                    a_col = jnp.transpose(mrow[s:s + 1, :], (1, 0))
                    b_col = jnp.transpose(mrow[NSUB + s:NSUB + s + 1, :], (1, 0))
                    qrel = a_col & 127
                    rot = jax.lax.shift_right_logical(a_col, 7) & 127
                    dphi = b_col & 127
                    lenm1 = jax.lax.shift_right_logical(b_col, 7) & 127
                    valid = (b_col & _VALID) != 0
                    drel = jax.lax.shift_right_logical(
                        mrow[NSUB + s:NSUB + s + 1, :], 14) & 127
                    lane_w = jax.lax.broadcasted_iota(
                        jnp.int32, (VEC, W_ROWS), 1)
                    rs0 = (lane_w == qrel).astype(jnp.bfloat16)
                    u0 = jax.lax.dot_general(
                        rs0, bwin, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    phi = (VEC - rot) & (VEC - 1)
                    if variant in ("noroll1g", "normw", "nocompose", "noslice", "noscal"):
                        v = u0
                    else:
                        rs1 = (lane_w == qrel + 1).astype(jnp.bfloat16)
                        u1 = jax.lax.dot_general(
                            rs1, bwin, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        v = jnp.where(lane_p >= phi, u0, u1)
                    mask = valid & (lane_p >= dphi) & (lane_p - dphi <= lenm1)
                    vs.append(v)
                    rots.append(rot)
                    masks.append(mask)
                    drels.append(drel)
                if variant == "full":
                    for k in range(7):
                        for s in range(NSUB):
                            bit = (jax.lax.shift_right_logical(rots[s], k)
                                   & 1) == 1
                            vs[s] = jnp.where(
                                bit, pltpu.roll(vs[s], shift=1 << k, axis=1),
                                vs[s])
                elif variant == "mmshift":
                    for k in range(7):
                        for s in range(NSUB):
                            bit = (jax.lax.shift_right_logical(rots[s], k)
                                   & 1) == 1
                            rolled = jax.lax.dot_general(
                                vs[s].astype(jnp.bfloat16), shifts[k],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                            vs[s] = jnp.where(bit, rolled, vs[s])
                for s in range(NSUB):
                    mk = jnp.where(masks[s], vs[s], 0.0)
                    if variant == "nocompose":
                        out_ref[g, s * VEC:(s + 1) * VEC, :] = mk
                        continue
                    ds_t = (row_iota == drels[s]).astype(jnp.bfloat16)
                    contrib = jax.lax.dot_general(
                        ds_t, mk.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if variant == "normw":
                        out_ref[g, s * VEC:(s + 1) * VEC, :] = contrib
                    else:
                        out_ref[g, pl.ds(Ds[s], VEC), :] += contrib
                return c

            jax.lax.fori_loop(0, n, body, jnp.int32(0))

    return kern


@functools.partial(jax.jit, static_argnames=("variant", "group"))
def run(ntrips, b_i32, starts, meta, variant: str, group: int):
    Bp = b_i32.shape[0]
    nmr = meta.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // group,),
        in_specs=[
            pl.BlockSpec((group, RB, VEC), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 8, VEC), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, nmr, VEC), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, OUT_ROWS, VEC),
                               lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        make_kernel(variant, group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, OUT_ROWS, VEC), jnp.float32),
    )(ntrips, b_i32, starts, meta)
    return out[:, :1, :1]


def synth(B, trips, rng):
    """Synthetic full plans: every trip has 4 full subpanels of rot!=0
    full-row pieces (worst-case realistic shape)."""
    NMR = 2 * NSUB * 32
    b_i32 = rng.integers(0, 256, (B, RB, VEC)).astype(np.int32)
    meta = np.zeros((B, NMR, VEC), np.int32)
    starts = np.zeros((B, 8, VEC), np.int32)
    ntr = np.full(B, trips, np.int32)
    for t in range(trips):
        for s in range(NSUB):
            qrel = rng.integers(0, W_ROWS - 1, VEC)
            rot = rng.integers(1, VEC, VEC)
            drel = np.arange(VEC)
            meta[:, 2 * NSUB * t + s, :] = qrel | (rot << 7)
            meta[:, 2 * NSUB * t + NSUB + s, :] = (
                0 | (127 << 7) | (drel << 14) | _VALID)
            S = int(rng.integers(0, RB - W_ROWS))
            starts[:, t >> 5, (t & 31) * 4 + s] = S | ((t % 4) << 10)
    return ntr, b_i32, meta, starts


rng = np.random.default_rng(0)
ntr, b_i32, meta, starts = synth(B, TRIPS, rng)
print(f"devices: {jax.devices()}", flush=True)
args = tuple(map(jax.device_put, (ntr, b_i32, starts, meta)))

# ONE fused sync per measurement (the relay's per-sync floor is ~5-30 ms
# — syncing per call hides every variant delta; r2 measurement gotcha)
combine = jax.jit(lambda *xs: sum(jnp.sum(x) for x in xs))
NCALL = 8
for variant in ("full", "noroll", "noroll1g", "mmshift", "normw", "nocompose", "noslice", "noscal", "empty"):
    t0 = time.time()
    out = run(*args, variant=variant, group=GROUP)
    float(np.asarray(combine(out)).item())
    comp = time.time() - t0
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        outs = [run(*args, variant=variant, group=GROUP)
                for _ in range(NCALL)]
        float(np.asarray(combine(*outs)).item())
        times.append((time.perf_counter() - t0) / NCALL)
    best = min(times)
    ns_trip = best / (B * TRIPS) * 1e9
    print(f"{variant:10s} {best*1e3:8.2f} ms/call  {best/B*1e6:7.2f} us/block"
          f"  {ns_trip:7.0f} ns/trip (compile {comp:.1f}s)", flush=True)
