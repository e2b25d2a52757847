"""Capture a jax.profiler trace of one decode batch on the TPU
(SURVEY.md §5: the build equivalent of the reference's progress/debug
stream).  Profiles the FLAT engine (the production decode path) by
default; pass `pallas` to profile the standalone sequential kernel.
Writes a TensorBoard-format trace under traces/ and prints the wall
time of the traced region.

Usage: python tools/tpu_profile.py [flat|pallas] [outdir]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from snappy_tpu.utils.jaxcache import setup_compilation_cache

setup_compilation_cache()

import jax

from snappy_tpu import native
from snappy_tpu.bench.corpus import make_corpus
from snappy_tpu.spec.format import read_uvarint

engine = sys.argv[1] if len(sys.argv) > 1 else "flat"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/traces"
os.makedirs(outdir, exist_ok=True)

B, BMAX, CMAX = 256, 65536, 66560
files = make_corpus(B * BMAX + BMAX)
data = b"".join(d for _, d in files)

if engine == "flat":
    from snappy_tpu.kernels.decode_flat import (
        PAT_ROWS,
        TRIP_CAP,
        VEC,
        decode_blocks_flat,
        rows_b_for,
    )

    rb = rows_b_for(CMAX)
    b_u8 = np.zeros((B, rb * VEC), np.uint8)
    meta = np.zeros((B, 8 * TRIP_CAP, VEC), np.int32)
    fst = np.zeros((B, 8, VEC), np.int32)
    ntr = np.zeros(B, np.int32)
    pat = np.empty(PAT_ROWS * VEC, np.uint8)
    for i in range(B):
        block = data[i * BMAX : (i + 1) * BMAX]
        c = native.compress(block)
        _, h = read_uvarint(c, 0)
        cb = np.frombuffer(c, np.uint8)
        g = native.stage_flat_dec(cb, h, len(block), rb, meta[i], fst[i],
                                   b_u8[i])
        assert g is not None
        ntr[i] = g
    args = tuple(map(jax.device_put, (
        b_u8.astype(np.int32).reshape(B, -1, VEC), meta, fst, ntr)))

    def run():
        out = decode_blocks_flat(*args, dst_max=BMAX)
        np.asarray(out[:, :1])
else:
    from snappy_tpu.kernels.pallas_decode import decode_blocks_pallas

    comp = np.zeros((B, CMAX), np.uint8)
    starts = np.zeros(B, np.int32)
    clens = np.zeros(B, np.int32)
    dlens = np.full(B, BMAX, np.int32)
    for i in range(B):
        c = native.compress(data[i * BMAX : (i + 1) * BMAX])
        _, h = read_uvarint(c, 0)
        comp[i, : len(c)] = np.frombuffer(c, np.uint8)
        starts[i], clens[i] = h, len(c)
    pargs = tuple(map(jax.device_put, (comp, starts, clens, dlens)))

    def run():
        out, err = decode_blocks_pallas(*pargs, out_max=BMAX)
        np.asarray(err)

run()  # warm (compile outside the trace)
print(f"warmed ({engine}); tracing one batch...", flush=True)

t0 = time.perf_counter()
try:
    with jax.profiler.trace(outdir):
        run()
    note = "trace written"
except Exception as e:  # the relay may not support profiling RPCs
    run()
    note = f"profiler unavailable through the relay: {e!r}"[:200]
dt = time.perf_counter() - t0
print(f"traced region: {dt*1e3:.1f} ms for {B} blocks "
      f"({B*BMAX/1e9/dt:.4f} GB/s); {note}", flush=True)
for root, _, fs in os.walk(outdir):
    for f in fs:
        print("  trace file:", os.path.join(root, f), flush=True)
