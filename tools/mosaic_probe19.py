"""Probe 19: why do PRODUCTION trips cost ~5.5 us when synthetic
full-rot trips cost ~2.1 us (probe16 at B=1024)?

Two production-only properties are emulated on the CURRENT kernel
(decode_flat._flat_kernel, uniform-rot body):
  samebin — all 4 subpanels of a trip compose into the SAME dst bin
            (the packer's (cls,rot,dbin,q) order makes neighbouring
            subpanels share bins; RMW += chains on one bin serialize)
  varn    — per-block trip counts vary 1..3 (pipeline drain/refill
            between the grouped blocks' loops)
  mixed   — rot trips followed by aligned trips per block (the class
            split's two fori_loops)
against the probe16-style baseline (distinct bins, fixed n, rot only).

Uses the production kernel via decode_blocks_flat (raw_out) on packed
synthetic plans built with the REAL starts-word layout
(S | bn<<10 | rot<<13).

Usage: python tools/mosaic_probe19.py [B] [trips]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from snappy_tpu.utils.jaxcache import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp

from snappy_tpu.kernels.decode_flat import NSUB, VEC, W_ROWS, decode_blocks_flat
from snappy_tpu.utils import hostmem

hostmem.tune_allocator()

_VALID = 1 << 21
B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
TRIPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
RB = 1040
OUT_ROWS = 520
NCALL = 8
TRIP_CAP = 32


def synth(B, trips, rng, samebin=False, varn=False, aligned_tail=False):
    NMR = 2 * NSUB * TRIP_CAP
    b_i32 = rng.integers(0, 256, (B, RB, VEC)).astype(np.int32)
    meta = np.zeros((B, NMR, VEC), np.int32)
    starts = np.zeros((B, 8, VEC), np.int32)
    if varn:
        ntr = rng.integers(1, trips + 2, B).astype(np.int32)  # avg ~trips
    else:
        ntr = np.full(B, trips, np.int32)
    nmax = int(ntr.max())
    n_aligned = np.zeros(B, np.int32)
    for t in range(nmax):
        al_t = aligned_tail and t >= (nmax + 1) // 2
        for s in range(NSUB):
            qrel = rng.integers(0, W_ROWS - 1, VEC)
            rot = 0 if al_t else int(rng.integers(1, VEC))
            drel = np.arange(VEC)
            meta[:, 2 * NSUB * t + s, :] = qrel | (rot << 7)
            meta[:, 2 * NSUB * t + NSUB + s, :] = (
                0 | (127 << 7) | (drel << 14) | _VALID)
            S = int(rng.integers(0, RB - W_ROWS))
            bn = (t % 4) if samebin else ((t * NSUB + s) % 4)
            starts[:, t >> 5, (t & 31) * 4 + s] = (
                S | (bn << 10) | (rot << 13))
        if al_t:
            n_aligned += (ntr > t).astype(np.int32)
    return b_i32, meta, starts, (ntr | (n_aligned << 16)).astype(np.int32)


rng = np.random.default_rng(0)
print(f"devices: {jax.devices()}", flush=True)
combine = jax.jit(lambda *xs: sum(jnp.sum(x[:, :1, :1]) for x in xs))

CONFIGS = [
    ("base",          dict()),
    ("samebin",       dict(samebin=True)),
    ("varn",          dict(varn=True)),
    ("samebin+varn",  dict(samebin=True, varn=True)),
    ("aligned-tail",  dict(aligned_tail=True)),
    ("all-three",     dict(samebin=True, varn=True, aligned_tail=True)),
]

for label, kw in CONFIGS:
    b_i32, meta, starts, ntr = synth(B, TRIPS, rng, **kw)
    tripsum = int((ntr & 0xFFFF).sum())
    args = tuple(map(jax.device_put, (b_i32, meta, starts, ntr)))
    t0 = time.time()
    out = decode_blocks_flat(*args, dst_max=65536, raw_out=True)
    float(np.asarray(combine(out)).item())
    comp = time.time() - t0
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        outs = [decode_blocks_flat(*args, dst_max=65536, raw_out=True)
                for _ in range(NCALL)]
        float(np.asarray(combine(*outs)).item())
        times.append((time.perf_counter() - t0) / NCALL)
    best = min(times)
    print(f"{label:13s} {best*1e3:7.2f} ms/call  {best/B*1e6:6.2f} us/block"
          f"  {best/tripsum*1e9:6.0f} ns/trip (compile {comp:.1f}s)",
          flush=True)
