"""Measure the flat-plan decoder on the real TPU: plan on host, verify
bit-exactness, time fetch-forced repeats.

Usage: python tools/tpu_flat_bench.py [n_batches] [B] [use_take]
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
from snappy_tpu.kernels.decode_flat import (
    NSUB,
    TRIP_CAP,
    VEC,
    build_b_bytes,
    decode_blocks_flat,
    pack_trips,
    plan_flat,
    rows_b_for,
)
from snappy_tpu.spec.format import read_uvarint

n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 4
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
use_take = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False
BMAX, CMAX = 65536, 66560
RB = rows_b_for(CMAX)

print("devices:", jax.devices(), flush=True)
files = make_corpus(n_batches * B * BMAX + BMAX)
data = b"".join(d for _, d in files)
total = n_batches * B * BMAX

tmp = np.empty((34000, 4), np.int32)
batches = []
expect = []
t_plan = t_pack = 0.0
trip_counts = []
for k in range(n_batches):
    b_u8 = np.zeros((B, RB * VEC), np.uint8)
    meta = np.zeros((B, 2 * NSUB * TRIP_CAP, VEC), np.int32)
    starts = np.zeros((B, 8, VEC), np.int32)
    ntr = np.zeros(B, np.int32)
    exp = []
    for i in range(B):
        off = (k * B + i) * BMAX
        block = data[off : off + BMAX]
        c = native.compress(block)
        _, h = read_uvarint(c, 0)
        cb = np.frombuffer(c, np.uint8)
        t0 = time.perf_counter()
        nt = native.parse_tags(c, h, BMAX, tmp)
        plan = plan_flat(tmp, nt, cb)
        t_plan += time.perf_counter() - t0
        assert plan is not None, "plan overflow"
        pieces, pat = plan
        t0 = time.perf_counter()
        pk = pack_trips(pieces, TRIP_CAP, RB)
        t_pack += time.perf_counter() - t0
        assert pk is not None, f"pack overflow ({len(pieces)} pieces)"
        meta[i], starts[i], ntr[i] = pk
        b_u8[i] = build_b_bytes(cb, pat, RB)
        trip_counts.append(int(ntr[i]))
        exp.append(block)
    batches.append(tuple(map(jax.device_put, (b_u8, meta, starts, ntr))))
    expect.append(exp)

print(f"staged {n_batches}x{B} blocks, {total/1e6:.1f} MB, "
      f"avg trips/block {np.mean(trip_counts):.1f} (max {max(trip_counts)}), "
      f"host plan {t_plan:.2f}s pack {t_pack:.2f}s", flush=True)

import jax.numpy as jnp

combine = jax.jit(lambda *xs: sum(jnp.sum(x[:, :1].astype(jnp.int32)) for x in xs))


def run():
    outs = []
    for b_u8, meta, starts, ntr in batches:
        outs.append(decode_blocks_flat(b_u8, meta, starts, ntr, BMAX,
                                       use_take=use_take))
    return outs


t0 = time.time()
outs = run()
np.asarray(combine(*outs))
print(f"compile+first run {time.time()-t0:.1f}s (use_take={use_take})",
      flush=True)

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
tripsum = sum(trip_counts)
print(
    f"times={['%.3f' % t for t in times]} best={best:.3f}s "
    f"=> {total/1e9/best:.4f} GB/s/chip ({best/(n_batches*B)*1e6:.0f} us/block, "
    f"{best/tripsum*1e9:.0f} ns/trip)",
    flush=True,
)
