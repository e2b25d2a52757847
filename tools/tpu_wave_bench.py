"""Measure the wave-group decoder on the real TPU: plan on host,
verify bit-exactness, time fetch-forced repeats.

Usage: python tools/tpu_wave_bench.py [n_batches] [B]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from snappy_tpu.utils.jaxcache import setup_compilation_cache

setup_compilation_cache()

import jax

from snappy_tpu import native
from snappy_tpu.bench.corpus import make_corpus
from snappy_tpu.kernels.decode_wavegroup import (
    decode_blocks_wavegroup, pack_plan, plan_waves,
)
from snappy_tpu.spec.format import read_uvarint

n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 4
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
BMAX, CMAX, G_CAP = 65536, 66560, 8192

print("devices:", jax.devices(), flush=True)
files = make_corpus(n_batches * B * BMAX + BMAX)
data = b"".join(d for _, d in files)
total = n_batches * B * BMAX

tmp = np.empty((34000, 4), np.int32)
batches = []
expect = []
t_plan = 0.0
group_counts = []
for k in range(n_batches):
    comp = np.zeros((B, CMAX), np.uint8)
    ng = np.zeros(B, np.int32)
    wp = np.zeros((B, G_CAP // 8, 128), np.int32)
    exp = []
    for i in range(B):
        off = (k * B + i) * BMAX
        block = data[off : off + BMAX]
        c = native.compress(block)
        _, h = read_uvarint(c, 0)
        comp[i, : len(c)] = np.frombuffer(c, np.uint8)
        t0 = time.perf_counter()
        nt = native.parse_tags(c, h, BMAX, tmp)
        plan = plan_waves(tmp, nt, cap_groups=G_CAP)
        t_plan += time.perf_counter() - t0
        assert plan is not None, "plan overflow"
        words, g = plan
        wp[i] = pack_plan(words, g, G_CAP)
        ng[i] = g
        group_counts.append(g)
        exp.append(block)
    batches.append(tuple(map(jax.device_put, (comp, wp, ng))))
    expect.append(exp)

print(f"staged {n_batches}x{B} blocks, {total/1e6:.1f} MB, "
      f"avg groups/block {np.mean(group_counts):.0f}, host plan "
      f"{t_plan:.2f}s total", flush=True)

import jax.numpy as jnp

combine = jax.jit(lambda *xs: sum(jnp.sum(x[:, :1].astype(jnp.int32)) for x in xs))


def run():
    outs = []
    for comp, wp, ng in batches:
        outs.append(decode_blocks_wavegroup(comp, wp, ng, out_max=BMAX))
    return outs


t0 = time.time()
outs = run()
np.asarray(combine(*outs))
print(f"compile+first run {time.time()-t0:.1f}s", flush=True)

out0 = np.asarray(outs[0])
bad = sum(1 for i in range(B) if out0[i].tobytes() != expect[0][i])
print(f"verify batch0: {B - bad}/{B} blocks bit-exact", flush=True)

times = []
for _ in range(5):
    t0 = time.perf_counter()
    outs = run()
    np.asarray(combine(*outs))
    times.append(time.perf_counter() - t0)
best = min(times)
print(
    f"times={['%.3f' % t for t in times]} best={best:.3f}s "
    f"=> {total/1e9/best:.4f} GB/s/chip ({best/(n_batches*B)*1e6:.0f} us/block)",
    flush=True,
)
