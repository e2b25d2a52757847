"""On-TPU measurement of the sort-based device matcher
(kernels/pallas_match.py): Mosaic compile + bit-exactness vs the np
contract + sustained GB/s/chip.

Env: MATCH_BLOCKS (default 32), MATCH_REPEATS (default 4),
MATCH_GROUP (default 1).  The relay pipelines dispatches — the clock
closes with a forced fetch of one output element (CLAUDE.md
measurement gotcha), so use enough blocks that the sync floor is
amortized.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from snappy_tpu.utils.jaxcache import setup_compilation_cache
from snappy_tpu.utils import hostmem
from snappy_tpu.bench.corpus import make_corpus
from snappy_tpu.kernels import match_np, pallas_match

setup_compilation_cache()
hostmem.tune_allocator()

NB = int(os.environ.get("MATCH_BLOCKS", "32"))
REPS = int(os.environ.get("MATCH_REPEATS", "4"))
GROUP = int(os.environ.get("MATCH_GROUP", "1"))
HOME = os.environ.get("MATCH_HOME", "1") != "0"

data = b"".join(d for _, d in make_corpus(max(NB, 4) << 16, seed=13))
blocks = [data[i << 16:(i + 1) << 16] for i in range(NB)]

print(f"platform={jax.default_backend()} devices={jax.devices()}", flush=True)
w_i32, npos = pallas_match.stage_words(blocks)
w_dev = jax.device_put(jnp.asarray(w_i32))
np_dev = jax.device_put(jnp.asarray(npos))

t0 = time.perf_counter()
out = pallas_match._match_jit(w_dev, np_dev, interpret=False, group=GROUP,
                              home=HOME)
first = np.asarray(out[0, 0, :1])  # force completion through the relay
print(f"compile+first run: {time.perf_counter()-t0:.1f}s (home={HOME})",
      flush=True)

# bit-exactness vs the np contract on 4 blocks
host_raw = np.asarray(out)
host = (host_raw.reshape(NB, match_np.BMAX) if HOME
        else pallas_match.scatter_home(host_raw))
bad = 0
for i in range(min(4, NB)):
    ref = match_np.find_candidates(blocks[i]).astype(np.int32)
    neq = int((host[i] != ref).sum())
    bad += neq
    print(f"block {i}: mismatches {neq}", flush=True)
print("exactness:", "OK" if bad == 0 else "FAIL", flush=True)

best = 1e18
for rep in range(REPS):
    t0 = time.perf_counter()
    out = pallas_match._match_jit(w_dev, np_dev, interpret=False,
                                  group=GROUP, home=HOME)
    _ = np.asarray(out[0, 0, :1])  # forced sync
    dt = time.perf_counter() - t0
    best = min(best, dt)
    print(f"rep {rep}: {dt*1e3:.1f} ms  {NB*65536/dt/1e9:.3f} GB/s", flush=True)
print(f"device_match: {NB*65536/best/1e9:.3f} GB/s/chip "
      f"({best*1e6/NB:.0f} us/block, {NB} blocks)", flush=True)
