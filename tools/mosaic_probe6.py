"""Mosaic probe round 6: wave-group decoder feasibility.

a) scalar-prefetch SMEM capacity (how many i32 words can ride along?)
b) independent scalar extracts from one loaded row — do they pipeline?
c) the full wave-group inner body: span load, 8 slots (pair load,
   select, roll, mask-compose), span store — ns per group.
"""

from __future__ import annotations

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

R = 528
N = 1 << 17  # groups per call for the heavy probes

PROBES = {}


def probe(fn):
    PROBES[fn.__name__] = fn
    return fn


def run_probe(name, fn):
    try:
        t0 = time.time()
        f, args, n_ops = fn()
        jf = jax.jit(f)
        np.asarray(jf(*args))
        t_compile = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            np.asarray(jf(*args))
            best = min(best, time.time() - t0)
        print(f"PROBE {name} PASS compile={t_compile:.1f}s run={best*1e3:.0f}ms "
              f"({best*1e9/n_ops:.1f} ns/op)", flush=True)
    except Exception as e:  # noqa
        head = " | ".join(str(e).splitlines()[:2])[:200]
        print(f"PROBE {name} FAIL {type(e).__name__}: {head}", flush=True)


def _smem_probe(nwords):
    def kernel(s_ref, x_ref, o_ref):
        def body(i, c):
            return c + s_ref[(i * 997) % nwords]

        v = jax.lax.fori_loop(0, 4096, body, jnp.int32(0))
        o_ref[:] = jnp.full((8, 128), v, jnp.int32)

    def f(s, x):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        )(s, x)

    x = jnp.ones((8, 128), jnp.int32)
    s = jnp.ones(nwords, jnp.int32)
    return f, (s, x), 4096


@probe
def smem_prefetch_64k_words():
    return _smem_probe(65536)       # 256 KiB


@probe
def smem_prefetch_256k_words():
    return _smem_probe(262144)      # 1 MiB


@probe
def smem_prefetch_1m_words():
    return _smem_probe(1 << 20)     # 4 MiB


@probe
def extract16_indep():
    # one dyn row load + 16 independent static extracts per op
    def kernel(s_ref, x_ref, o_ref):
        def body(i, c):
            q = s_ref[i & 65535] & 255
            w = x_ref[pl.ds(q, 1), :]
            t = c
            for k in range(16):
                t = t + w[0, k * 8]
            return t

        v = jax.lax.fori_loop(0, 65536, body, jnp.int32(0))
        o_ref[:] = jnp.full((8, 128), v, jnp.int32)

    def f(s, x):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        )(s, x)

    x = jnp.ones((R, 128), jnp.int32)
    s = jnp.arange(65536, dtype=jnp.int32)
    return f, (s, x), 65536


@probe
def wavegroup_body():
    # realistic group: span load [10,128], 8 slots (2 pair loads, selects,
    # 1 roll, 3 mask ops, compose select), span store; slot scalars from
    # prefetch SMEM (16 words/group).  8192 groups/call = 65536 ops.
    G = 8192
    SR = 10

    def kernel(s_ref, x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        lane_sr = jax.lax.broadcasted_iota(jnp.int32, (SR, 128), 1)
        row_sr = jax.lax.broadcasted_iota(jnp.int32, (SR, 128), 0)

        def body(g, c):
            base = (g & 4095) * 16
            d0 = s_ref[base] & 32767
            row0 = d0 >> 7
            span = o_ref[pl.ds(row0, SR), :]
            flat = (row0 + row_sr) * 128 + lane_sr

            for k in range(8):
                w1 = s_ref[base + k * 2]
                w2 = s_ref[base + k * 2 + 1]
                srck = w1 & 131071
                isout = (w1 >> 17) & 1
                dk = (w2 & 131071) & 32767
                lk = (w2 >> 17) & 255
                sq = (srck >> 7) & 255
                pair_o = o_ref[pl.ds(sq, 2), :]
                pair_c = x_ref[pl.ds(sq, 2), :]
                pair = jnp.where(isout == 1, pair_o, pair_c)
                sr = srck & 127
                u = jnp.where(lane >= sr, pair[0:1, :], pair[1:2, :])
                v = pltpu.roll(u, shift=(dk - srck) & 127, axis=1)
                mask = (flat >= dk) & (flat < dk + lk)
                span = jnp.where(mask, jnp.broadcast_to(v, (SR, 128)), span)
            o_ref[pl.ds(row0, SR), :] = span
            return c

        jax.lax.fori_loop(0, G, body, jnp.int32(0))

    def f(s, x):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        )(s, x)

    x = jnp.ones((R, 128), jnp.int32)
    s = (jnp.arange(4096 * 16, dtype=jnp.int32) * 131) % (1 << 18)
    return f, (s, x), G * 8


def main():
    names = sys.argv[1:] or list(PROBES)
    print(f"devices: {jax.devices()}", flush=True)
    for name in names:
        if name not in PROBES:
            print(f"PROBE {name} UNKNOWN", flush=True)
            continue
        run_probe(name, PROBES[name])
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
