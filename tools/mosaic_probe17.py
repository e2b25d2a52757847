"""Probe 17: what sets the flat kernel's per-block floor?

Sweeps an EMPTY trip body (meta/starts reads + one out row write, b
optionally touched) over {group} x {rb rows} x {meta rows} to separate
  (a) HBM->VMEM DMA volume (time scales with rb/nmr)
  (b) per-grid-step pipeline latency (time scales 1/group)
All timings use ONE fused sync per measurement (relay floor ~5-30 ms).

Usage: python tools/mosaic_probe17.py [B] [trips]
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
OUT_ROWS = 512

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
TRIPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
NCALL = 8


def make_kernel(group: int, touch_b: bool, out_rows: int):
    def kern(ntrips_ref, b_ref, starts_ref, meta_ref, out_ref):
        blk = pl.program_id(0)
        for g in range(group):
            n = ntrips_ref[blk * group + g]
            out_ref[g, :, :] = jnp.zeros((out_rows, VEC), jnp.float32)

            def body(i, c, g=g):
                srow = starts_ref[g, pl.ds(i >> 5, 1), :]
                sr = pltpu.roll(
                    srow, shift=(VEC - ((i & 31) * NSUB)) & (VEC - 1), axis=1)
                mrow = meta_ref[g, pl.ds(2 * NSUB * i, 2 * NSUB), :]
                acc = (sr[0, 0] + mrow[0, 0]).astype(jnp.float32)
                if touch_b:
                    S = sr[0, 0] & 1023
                    brow = b_ref[g, pl.ds(S, 8), :].astype(jnp.float32)
                    acc = acc + brow[0, 0]
                out_ref[g, 0:1, :] += jnp.full((1, VEC), acc, jnp.float32)
                return c

            jax.lax.fori_loop(0, n, body, jnp.int32(0))

    return kern


@functools.partial(jax.jit, static_argnames=("group", "touch_b", "rb",
                                              "nmr", "out_rows"))
def run(ntrips, b_i32, starts, meta, group: int, touch_b: bool, rb: int,
        nmr: int, out_rows: int):
    Bp = b_i32.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // group,),
        in_specs=[
            pl.BlockSpec((group, rb, VEC), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 8, VEC), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, nmr, VEC), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, out_rows, VEC),
                               lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        make_kernel(group, touch_b, out_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, out_rows, VEC), jnp.float32),
    )(ntrips, b_i32, starts, meta)
    return out[:, :1, :1]


rng = np.random.default_rng(0)
print(f"devices: {jax.devices()}", flush=True)
combine = jax.jit(lambda *xs: sum(jnp.sum(x) for x in xs))

CONFIGS = [
    # (group, rb, nmr, out_rows, touch_b)
    (4, 1040, 256, 520, False),   # probe16 shape
    (4, 1040, 256, 520, True),
    (4, 512, 256, 520, True),     # rb halved
    (4, 256, 256, 520, True),     # rb quartered
    (4, 1040, 32, 520, True),     # meta trimmed
    (4, 256, 32, 512, True),      # everything trimmed
    (8, 1040, 256, 520, True),    # group scaling
    (16, 1040, 256, 520, True),
    (8, 256, 32, 512, True),
    (16, 256, 32, 512, True),
    (32, 256, 32, 512, True),
]

for group, rb, nmr, out_rows, touch in CONFIGS:
    ntr = np.full(B, TRIPS, np.int32)
    b_i32 = rng.integers(0, 256, (B, rb, VEC)).astype(np.int32)
    meta = rng.integers(0, 128, (B, nmr, VEC)).astype(np.int32)
    starts = rng.integers(0, rb - 8, (B, 8, VEC)).astype(np.int32)
    args = tuple(map(jax.device_put, (ntr, b_i32, starts, meta)))
    kb_blk = (rb + nmr + 8) * VEC * 4 / 1024 + out_rows * VEC * 4 / 1024
    t0 = time.time()
    try:
        out = run(*args, group=group, touch_b=touch, rb=rb, nmr=nmr,
                  out_rows=out_rows)
        float(np.asarray(combine(out)).item())
    except Exception as e:
        print(f"g={group:2d} rb={rb:4d} nmr={nmr:3d} out={out_rows} "
              f"touch={int(touch)}  FAILED: {str(e)[:120]}", flush=True)
        continue
    comp = time.time() - t0
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        outs = [run(*args, group=group, touch_b=touch, rb=rb, nmr=nmr,
                    out_rows=out_rows) for _ in range(NCALL)]
        float(np.asarray(combine(*outs)).item())
        times.append((time.perf_counter() - t0) / NCALL)
    best = min(times)
    us_blk = best / B * 1e6
    gbs = B * 65536 / best / 1e9
    print(f"g={group:2d} rb={rb:4d} nmr={nmr:3d} out={out_rows} touch={int(touch)}"
          f"  {kb_blk:6.0f} KB/blk  {us_blk:7.2f} us/block"
          f"  ({gbs:5.1f} GB/s-equiv, {kb_blk/us_blk/1.024:5.1f} GB/s DMA,"
          f" compile {comp:.1f}s)", flush=True)
