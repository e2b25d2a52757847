"""Probe 15: per-grid-step fixed overhead decomposition for the flat
engines.  A no-op kernel with the flat engines' exact BlockSpec shapes
measures pure DMA+step cost per block; variants isolate each input's
contribution (B rows, meta rows, out panel rows, f32 vs bf16 out).

Usage: python tools/mosaic_probe15.py [B]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from snappy_tpu.utils.jaxcache import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
VEC = 128
print("devices:", jax.devices(), flush=True)


def make_case(rb, nmr, out_rows, out_dtype, touch_b=True, trips=0):
    def kernel(ntrips_ref, b_ref, starts_ref, meta_ref, out_ref):
        # touch every input so the DMA cannot be elided; do ~zero compute
        acc = jnp.zeros((8, VEC), jnp.float32)
        if touch_b:
            acc += b_ref[0, :8, :].astype(jnp.float32)
        acc += meta_ref[0, :8, :].astype(jnp.float32)
        acc += starts_ref[0, :8, :].astype(jnp.float32)
        out_ref[0, :, :] = jnp.zeros((out_rows, VEC), out_dtype)
        out_ref[0, :8, :] = acc.astype(out_dtype)
        if trips:
            lane = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 1)

            def body(i, c):
                # one gather-matmul-ish op per trip to model compute scale
                rs = (lane == (c & 127)).astype(jnp.bfloat16)
                u = jax.lax.dot_general(
                    rs, b_ref[0, :VEC, :].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out_ref[0, 8:16, :] += u[:8].astype(out_dtype)
                return c + 1

            jax.lax.fori_loop(0, trips, body, jnp.int32(0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rb, VEC), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, VEC), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nmr, VEC), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_rows, VEC), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, out_rows, VEC), out_dtype),
    )

    @jax.jit
    def run(ntr, b_i32, starts, meta):
        return f(ntr, b_i32, starts, meta)

    ntr = jnp.zeros(B, jnp.int32)
    b_i32 = jnp.zeros((B, rb, VEC), jnp.int32)
    starts = jnp.zeros((B, 8, VEC), jnp.int32)
    meta = jnp.zeros((B, nmr, VEC), jnp.int32)
    return run, (ntr, b_i32, starts, meta)


def time_case(name, rb, nmr, out_rows, out_dtype=jnp.float32, trips=0,
              calls=8):
    run, args = make_case(rb, nmr, out_rows, out_dtype, trips=trips)
    combine = jax.jit(
        lambda *xs: sum(jnp.sum(x[:, :1].astype(jnp.float32)) for x in xs))
    t0 = time.time()
    out = run(*args)
    np.asarray(combine(out))
    comp = time.time() - t0
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        outs = [run(*args) for _ in range(calls)]
        np.asarray(combine(*outs))
        times.append((time.perf_counter() - t0) / calls)
    best = min(times)
    dma_kb = (rb + nmr + 8) * VEC * 4 / 1024
    out_kb = out_rows * VEC * out.dtype.itemsize / 1024
    print(f"{name:42s} rb={rb:5d} nmr={nmr:4d} out={out_rows}x{out_dtype.__name__}"
          f" in={dma_kb:7.0f}KB out={out_kb:6.0f}KB"
          f" -> {best/B*1e6:7.2f} us/block (compile {comp:.1f}s)", flush=True)
    return best / B


base = time_case("decode shape today", 784, 768, 520)
time_case("decode, meta 768->64 rows", 784, 64, 520)
time_case("decode, B 784->256 rows", 256, 768, 520)
time_case("decode, out 520->128 rows", 784, 768, 128)
time_case("minimal (all trimmed)", 256, 64, 128)
time_case("encode shape today", 776, 192, 640)
time_case("encode trimmed (B 576, meta 24)", 576, 24, 640)
time_case("decode trimmed + 8 model trips", 256, 64, 520, trips=8)
time_case("decode trimmed + 24 model trips", 256, 64, 520, trips=24)
