"""Capture a jax.profiler trace of one decode batch on the TPU
(SURVEY.md §5: the build equivalent of the reference's progress/debug
stream).  Writes a TensorBoard-format trace under traces/ and prints
the wall time of the traced region.

Usage: python tools/tpu_profile.py [outdir]
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
from snappy_tpu.kernels.pallas_decode import decode_blocks_pallas
from snappy_tpu.spec.format import read_uvarint

outdir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/traces"
os.makedirs(outdir, exist_ok=True)

B, BMAX, CMAX = 64, 65536, 66560
files = make_corpus(B * BMAX + BMAX)
data = b"".join(d for _, d in files)

comp = np.zeros((B, CMAX), np.uint8)
starts = np.zeros(B, np.int32)
clens = np.zeros(B, np.int32)
dlens = np.full(B, BMAX, np.int32)
for i in range(B):
    c = native.compress(data[i * BMAX : (i + 1) * BMAX])
    _, h = read_uvarint(c, 0)
    comp[i, : len(c)] = np.frombuffer(c, np.uint8)
    starts[i], clens[i] = h, len(c)

args = tuple(map(jax.device_put, (comp, starts, clens, dlens)))

# warm (compile outside the trace)
out, err = decode_blocks_pallas(*args, out_max=BMAX)
np.asarray(err)
print("warmed; tracing one batch...", flush=True)

t0 = time.perf_counter()
try:
    with jax.profiler.trace(outdir):
        out, err = decode_blocks_pallas(*args, out_max=BMAX)
        np.asarray(err)
    note = "trace written"
except Exception as e:  # the relay may not support profiling RPCs
    out, err = decode_blocks_pallas(*args, out_max=BMAX)
    np.asarray(err)
    note = f"profiler unavailable through the relay: {e!r}"[:200]
dt = time.perf_counter() - t0
print(f"traced region: {dt*1e3:.1f} ms for {B} blocks "
      f"({B*BMAX/1e9/dt:.4f} GB/s); {note}", flush=True)
for root, _, fs in os.walk(outdir):
    for f in fs:
        print("  trace file:", os.path.join(root, f), flush=True)
