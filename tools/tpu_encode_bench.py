"""Measure the pallas encoder on the real TPU: compile, verify
reference-exact emission on a realistic batch, time fetch-forced
repeats.

Usage: python tools/tpu_encode_bench.py [n_batches] [B]
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
from snappy_tpu.kernels.pallas_encode import encode_blocks_pallas
from snappy_tpu.spec.format import read_uvarint

n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 2
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
BMAX = 65536

print("devices:", jax.devices(), flush=True)
files = make_corpus(n_batches * B * BMAX + BMAX)
data = b"".join(d for _, d in files)
total = n_batches * B * BMAX

batches = []
expect = []
for k in range(n_batches):
    blocks = np.zeros((B, BMAX), np.uint8)
    lens = np.full(B, BMAX, np.int32)
    exp = []
    for i in range(B):
        off = (k * B + i) * BMAX
        block = data[off : off + BMAX]
        blocks[i] = np.frombuffer(block, np.uint8)
        c = native.compress(block)
        _, h = read_uvarint(c, 0)
        exp.append(c[h:])  # element stream sans preamble
    batches.append((jax.device_put(blocks), jax.device_put(lens)))
    expect.append(exp)

print(f"staged {n_batches}x{B} blocks, {total/1e6:.1f} MB", flush=True)

combine = jax.jit(lambda *xs: sum(jnp.sum(x) for x in xs))


def run():
    hs = []
    for blocks, lens in batches:
        comp, clens, err = encode_blocks_pallas(blocks, lens, bmax=BMAX)
        hs.append(clens)
    return hs


t0 = time.time()
hs = run()
np.asarray(combine(*hs))
print(f"compile+first run {time.time()-t0:.1f}s", flush=True)

comp, clens, err = encode_blocks_pallas(*batches[0], bmax=BMAX)
comp = np.asarray(comp)
clens = np.asarray(clens)
bad = 0
for i in range(B):
    got = comp[i, : clens[i]].tobytes()
    if got != expect[0][i]:
        bad += 1
        if bad < 3:
            w = expect[0][i]
            k = next((j for j in range(min(len(got), len(w))) if got[j] != w[j]),
                     min(len(got), len(w)))
            print(f"  row {i}: {len(got)} vs {len(w)} bytes, first diff @{k}")
print(f"verify batch0: {B - bad}/{B} blocks reference-exact", flush=True)

times = []
for _ in range(5):
    t0 = time.perf_counter()
    hs = run()
    np.asarray(combine(*hs))
    times.append(time.perf_counter() - t0)
best = min(times)
print(
    f"times={['%.3f' % t for t in times]} best={best:.3f}s "
    f"=> {total/1e9/best:.4f} GB/s/chip ({best/(n_batches*B)*1e6:.0f} us/block)",
    flush=True,
)
