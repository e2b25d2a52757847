"""Probe 18: decompose the flat kernel's ~13.7 us/block fixed floor
(probe17: volume- and group-independent).

Ablations target what scales per BLOCK in the empty kernel:
  base     — probe17 empty body (zero-init full out + 2-trip loop)
  noinit   — skip the full out zero-init (write first row only)
  tinyout  — out_rows=8 (kills out zero-init AND out writeback DMA)
  onebuf   — only the meta input spec (no b, no starts)
  notrip   — ntrips = 0 (no fori_loop iterations at all)
  flatgrid — group=1, one block per step (per-step = per-block direct)
Also sweeps B (256 vs 1024) on `base` to separate per-call overhead.

Usage: python tools/mosaic_probe18.py
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
RB = 256
NMR = 32
NCALL = 8


def make_kernel(group: int, variant: str, out_rows: int, nbuf: int):
    def kern(*refs):
        ntrips_ref = refs[0]
        out_ref = refs[-1]
        meta_ref = refs[-2]
        blk = pl.program_id(0)
        for g in range(group):
            n = ntrips_ref[blk * group + g]
            if variant in ("noinit", "tinyout"):
                out_ref[g, 0:8, :] = jnp.zeros((8, VEC), jnp.float32)
            else:
                out_ref[g, :, :] = jnp.zeros((out_rows, VEC), jnp.float32)

            def body(i, c, g=g):
                mrow = meta_ref[g, pl.ds(2 * NSUB * i, 2 * NSUB), :]
                acc = mrow[0, 0].astype(jnp.float32)
                out_ref[g, 0:1, :] += jnp.full((1, VEC), acc, jnp.float32)
                return c

            jax.lax.fori_loop(0, n, body, jnp.int32(0))

    return kern


@functools.partial(jax.jit, static_argnames=("group", "variant", "out_rows",
                                              "nbuf"))
def run(ntrips, b_i32, starts, meta, group: int, variant: str,
        out_rows: int, nbuf: int):
    Bp = ntrips.shape[0]
    in_specs = []
    args = []
    if nbuf >= 3:
        in_specs.append(pl.BlockSpec((group, RB, VEC), lambda b, *_: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(b_i32)
    if nbuf >= 2:
        in_specs.append(pl.BlockSpec((group, 8, VEC), lambda b, *_: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(starts)
    in_specs.append(pl.BlockSpec((group, NMR, VEC), lambda b, *_: (b, 0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(meta)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // group,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((group, out_rows, VEC),
                               lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        make_kernel(group, variant, out_rows, nbuf),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, out_rows, VEC), jnp.float32),
    )(ntrips, *args)
    return out[:, :1, :1]


rng = np.random.default_rng(0)
print(f"devices: {jax.devices()}", flush=True)
combine = jax.jit(lambda *xs: sum(jnp.sum(x) for x in xs))

CONFIGS = [
    # (label, B, group, variant, out_rows, nbuf, trips)
    ("base",      256, 4, "base",    512, 3, 2),
    ("base-B1k", 1024, 4, "base",    512, 3, 2),
    ("noinit",    256, 4, "noinit",  512, 3, 2),
    ("tinyout",   256, 4, "tinyout",   8, 3, 2),
    ("onebuf",    256, 4, "base",    512, 1, 2),
    ("notrip",    256, 4, "base",    512, 3, 0),
    ("allcut",    256, 4, "tinyout",   8, 1, 0),
    ("flatgrid",  256, 1, "base",    512, 3, 2),
    ("g32cut",    256, 32, "tinyout",  8, 1, 0),
]

for label, B, group, variant, out_rows, nbuf, trips in CONFIGS:
    ntr = np.full(B, trips, np.int32)
    b_i32 = rng.integers(0, 256, (B, RB, VEC)).astype(np.int32)
    meta = rng.integers(0, 128, (B, NMR, VEC)).astype(np.int32)
    starts = rng.integers(0, RB - 8, (B, 8, VEC)).astype(np.int32)
    args = tuple(map(jax.device_put, (ntr, b_i32, starts, meta)))
    t0 = time.time()
    try:
        out = run(*args, group=group, variant=variant, out_rows=out_rows,
                  nbuf=nbuf)
        float(np.asarray(combine(out)).item())
    except Exception as e:
        print(f"{label:9s} FAILED: {str(e)[:120]}", flush=True)
        continue
    comp = time.time() - t0
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        outs = [run(*args, group=group, variant=variant, out_rows=out_rows,
                    nbuf=nbuf) for _ in range(NCALL)]
        float(np.asarray(combine(*outs)).item())
        times.append((time.perf_counter() - t0) / NCALL)
    best = min(times)
    print(f"{label:9s} B={B:4d} g={group:2d} out={out_rows:3d} nbuf={nbuf} "
          f"trips={trips}  {best*1e3:7.2f} ms/call  {best/B*1e6:7.2f} us/block"
          f" (compile {comp:.1f}s)", flush=True)
