"""Measure the pallas decoder on the real TPU: compile, verify
bit-exactness on a realistic batch, time fetch-forced repeats.

Usage: python tools/tpu_decode_bench.py [n_batches] [B]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from snappy_tpu.utils.jaxcache import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp

from snappy_tpu import native
from snappy_tpu.bench.corpus import make_corpus
from snappy_tpu.kernels.pallas_decode import decode_blocks_pallas
from snappy_tpu.spec.format import read_uvarint

n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 4
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
BMAX, CMAX = 65536, 66560

print("devices:", jax.devices(), flush=True)
files = make_corpus(n_batches * B * BMAX + BMAX)
data = b"".join(d for _, d in files)
total = n_batches * B * BMAX

batches = []
expect = []
tag_counts = []
tmp = np.empty((34000, 4), np.int32)
for k in range(n_batches):
    comp = np.zeros((B, CMAX), np.uint8)
    starts = np.zeros(B, np.int32)
    clens = np.zeros(B, np.int32)
    dlens = np.full(B, BMAX, np.int32)
    exp = []
    for i in range(B):
        off = (k * B + i) * BMAX
        block = data[off : off + BMAX]
        c = native.compress(block)
        d0, h = read_uvarint(c, 0)
        comp[i, : len(c)] = np.frombuffer(c, np.uint8)
        starts[i], clens[i] = h, len(c)
        exp.append(block)
        tag_counts.append(native.parse_tags(c, h, BMAX, tmp))
    batches.append(tuple(map(jax.device_put, (comp, starts, clens, dlens))))
    expect.append(exp)

print(f"staged {n_batches}x{B} blocks, {total/1e6:.1f} MB, "
      f"avg tags/block {np.mean(tag_counts):.0f}", flush=True)

combine = jax.jit(lambda *xs: sum(jnp.sum(x) for x in xs))


def run():
    errs = []
    for a in batches:
        out, err = decode_blocks_pallas(*a, out_max=BMAX)
        errs.append(err)
    return errs


t0 = time.time()
errs = run()
esum = int(np.asarray(combine(*errs)))
print(f"compile+first run {time.time()-t0:.1f}s err_sum={esum}", flush=True)

# verify bytes on batch 0
out0, err0 = decode_blocks_pallas(*batches[0], out_max=BMAX)
out0 = np.asarray(out0)
bad = sum(
    1 for i in range(B) if out0[i, :BMAX].tobytes() != expect[0][i]
)
print(f"verify batch0: {B - bad}/{B} blocks bit-exact", flush=True)

times = []
for _ in range(5):
    t0 = time.perf_counter()
    errs = run()
    int(np.asarray(combine(*errs)))
    times.append(time.perf_counter() - t0)
best = min(times)
print(
    f"times={['%.3f' % t for t in times]} best={best:.3f}s "
    f"=> {total/1e9/best:.4f} GB/s/chip "
    f"({best/ (n_batches*B) * 1e6:.0f} us/block)",
    flush=True,
)
