"""Decompose the device matcher's time: v-form only / +sort1 /
+scan / +sort2 (full).  Run on the real TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snappy_tpu.utils.jaxcache import setup_compilation_cache
from snappy_tpu.kernels import pallas_match as PM

setup_compilation_cache()

NB = int(os.environ.get("MATCH_BLOCKS", "32"))
rng = np.random.default_rng(0)
w_np = rng.integers(0, 1 << 31, (NB, 128, 128), dtype=np.int32)
npos_np = np.full(NB, 65533, np.int32)


def make(stage):
    def kern(scal_ref, w_ref, out_ref):
        npos = scal_ref[pl.program_id(0)]
        w = w_ref[0]
        nl = pltpu.roll(w, shift=127, axis=1)
        nxt = jnp.where(PM._ile(w.shape, 1) == 127,
                        pltpu.roll(nl, shift=127, axis=0), nl)
        phases = [w]
        for k in (1, 2, 3):
            phases.append(jax.lax.shift_right_logical(w, jnp.int32(8 * k))
                          | (nxt << jnp.int32(32 - 8 * k)))
        v = jnp.concatenate(phases, axis=0)
        S = PM._ile(v.shape, 0)
        L = PM._ile(v.shape, 1)
        pos = ((S & 127) * 512) + 4 * L + (S >> 7)
        khi = v ^ jnp.int32(-0x80000000)
        klo = jnp.where(pos < npos, pos, pos + (1 << 20))
        if stage >= 1:
            hoisted = PM._hoist_bits(v.shape, 16)
            khi, klo, _ = PM._bitonic(khi, klo, [], hoisted)
        if stage >= 2:
            prev_khi = PM._flat_shift(khi, 1, jnp.int32(0))
            prev_klo = PM._flat_shift(klo, 1, jnp.int32(1 << 20))
            fidx = S * 128 + L
            same_prev = jnp.where((prev_khi == khi) & (fidx > 0),
                                  jnp.int32(1), jnp.int32(0))
            val = jnp.where(same_prev == 0, klo, jnp.int32((1 << 20) + 65536))
            flag = 1 - same_prev
            for step in range(16):
                d = 1 << step
                pv = PM._flat_shift(val, d, jnp.int32((1 << 20) + 65536))
                pf = PM._flat_shift(flag, d, jnp.int32(1))
                val = jnp.where(flag != 0, val, pv)
                flag = jnp.maximum(flag, pf)
            klo = klo ^ val ^ prev_klo  # keep everything live
        if stage >= 3:
            key2 = klo & jnp.int32((1 << 20) - 1)
            zero = jnp.zeros_like(key2)
            _, _, pls = PM._bitonic(key2, zero, [khi],
                                    PM._hoist_bits(v.shape, 16))
            khi = pls[0]
        out_ref[0] = khi + klo

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NB,),
        in_specs=[pl.BlockSpec((1, 128, 128), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 512, 128), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return jax.jit(pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NB, 512, 128), jnp.int32)))


w_dev = jax.device_put(jnp.asarray(w_np))
np_dev = jax.device_put(jnp.asarray(npos_np))
for stage, name in [(0, "v-form"), (1, "+sort1"), (2, "+scan"),
                    (3, "+sort2")]:
    f = make(stage)
    t0 = time.perf_counter()
    out = f(np_dev, w_dev)
    _ = np.asarray(out[0, 0, :1])
    print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e18
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(np_dev, w_dev)
        _ = np.asarray(out[0, 0, :1])
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms ({best*1e6/NB:.0f} us/block)",
          flush=True)
