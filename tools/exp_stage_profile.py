"""Round-4 host-stage breakdown: where do the fused decode stage's
cycles go, per corpus block?  Compares walk-only (sn_decode_block),
parse-only (sn_parse_tags), fused stage (sn_stage_flat_dec), and the
batched stager at 1/2/4 threads, plus pyarrow's real C++ snappy as the
per-core context.  Run: python tools/exp_stage_profile.py [MB]
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np

from snappy_tpu import native
from snappy_tpu.bench.corpus import make_corpus
from snappy_tpu.kernels.decode_flat import TRIP_CAP, rows_b_for
from snappy_tpu.spec.format import read_uvarint
from snappy_tpu.utils.hostmem import tune_allocator, warm_heap

tune_allocator()

MB = float(sys.argv[1]) if len(sys.argv) > 1 else 16.0
BMAX, CMAX = 65536, 66560
rb = rows_b_for(CMAX)

blocks, elems, hdrs = [], [], []
for name, data in make_corpus(int(MB * (1 << 20)), seed=29):
    for off in range(0, len(data) - BMAX + 1, BMAX):
        blk = data[off:off + BMAX]
        c = native.compress(blk)
        _, h = read_uvarint(c, 0)
        blocks.append(blk)
        elems.append(np.frombuffer(c, np.uint8))
        hdrs.append(h)
B = len(blocks)
total = B * BMAX
print(f"{B} blocks, {total/1e6:.0f} MB out, "
      f"{sum(len(e) for e in elems)/1e6:.0f} MB comp")

out = np.empty(BMAX, np.uint8)
meta = np.empty((8 * TRIP_CAP, 128), np.int32)
starts = np.zeros((8, 128), np.int32)
b_row = np.empty(rb * 128, np.uint8)
rec = np.empty((34000, 4), np.int32)
warm_heap(1 << 28)


def bench(label, fn, reps=3):
    best = 1e18
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:<28} {total/1e9/best:.3f} GB/s/core "
          f"({best/B*1e6:.1f} us/block)")
    return best


lib = native._load()
import ctypes
u8p = ctypes.POINTER(ctypes.c_uint8)


def walk_only():
    for i in range(B):
        e = elems[i]
        rc = lib.sn_decode_block(native._as_u8p(e), len(e), hdrs[i],
                                 native._as_u8p(out), BMAX)
        assert rc == 0


def parse_only():
    for i in range(B):
        e = elems[i]
        rc = lib.sn_parse_tags(native._as_u8p(e), len(e), hdrs[i], BMAX,
                               native._i32p(rec), rec.shape[0])
        assert rc > 0


def stage_full():
    for i in range(B):
        g = native.stage_flat_dec(elems[i], hdrs[i], BMAX, rb, meta,
                                  starts, b_row)
        assert g is not None


bench("host decode (walk+replay)", walk_only)
bench("parse_tags (records out)", parse_only)
bench("fused stage (1 core)", stage_full)

# batched stager thread scaling
ecat = np.concatenate(elems)
eoffs = np.zeros(B, np.int64)
elens = np.zeros(B, np.int64)
off = 0
for i in range(B):
    eoffs[i] = off
    elens[i] = len(elems[i])
    off += len(elems[i])
hdrs64 = np.array(hdrs, np.int64)
dstl64 = np.full(B, BMAX, np.int64)
rc64 = np.zeros(B, np.int64)
meta_b = np.empty((B, 8 * TRIP_CAP, 128), np.int32)
starts_b = np.zeros((B, 8, 128), np.int32)
b_rows = np.empty((B, rb * 128), np.uint8)
warm_heap(1 << 28)

for nt in (1, 2, 4):
    bench(f"batched stager x{nt}",
          lambda nt=nt: native.stage_flat_dec_batch(
              ecat, eoffs, elens, hdrs64, dstl64, rb, meta_b, starts_b,
              b_rows, rc64, n_threads=nt))

# pyarrow real C++ snappy, single core, per block
import pyarrow as pa
raws = [pa.compress(b, codec="snappy", asbytes=True) for b in blocks]
bench("pyarrow C++ snappy decode",
      lambda: [pa.decompress(r, BMAX, codec="snappy") for r in raws])

# host framed codec at 4 threads (the host_native baseline context)
framed = native.compress_framed(b"".join(blocks), threads=4)
bench("sn_decompress_framed x4",
      lambda: native.decompress_framed(framed, threads=4))
