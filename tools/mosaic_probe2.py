"""Mosaic probe round 2: cost models for the two round-2 decode designs.

Design A (sequential windowed): per-tag scalar loop with 2-row dynamic
sublane loads + dynamic rolls + masked merge.  Probe 'seq_tag_loop'
measures the per-iteration overhead at 4096 iterations/call.

Design B (vectorized pretagged): arbitrary gathers synthesized as
lane-axis take_along_axis over an 8-row broadcast of the flat block.
Probe 'axis1_wide' measures a [8, 66560]-wide lane gather.

Run: python tools/mosaic_probe2.py [probe ...]
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

PROBES = {}


def probe(fn):
    PROBES[fn.__name__] = fn
    return fn


def fetch(x):
    return np.asarray(x)


def run_probe(name, fn):
    try:
        t0 = time.time()
        f, args, check = fn()
        jf = jax.jit(f)
        out = fetch(jf(*args))
        t_compile = time.time() - t0
        if check is not None and not check(out):
            print(f"PROBE {name} WRONG compile={t_compile:.1f}s out={out.ravel()[:8]}", flush=True)
            return
        best = 1e9
        for _ in range(6):
            t0 = time.time()
            fetch(jf(*args))
            best = min(best, time.time() - t0)
        print(f"PROBE {name} PASS compile={t_compile:.1f}s run={best*1e3:.1f}ms", flush=True)
    except Exception as e:  # noqa
        head = " | ".join(str(e).splitlines()[:2])[:220]
        print(f"PROBE {name} FAIL {type(e).__name__}: {head}", flush=True)


@probe
def roll_semantics():
    # pltpu.roll(x, shift=s, axis=1): establish direction with dynamic s.
    # numpy.roll semantics would give out[i] = x[(i - s) % n].
    def kernel(s_ref, x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], shift=s_ref[0], axis=1)

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

    x = jnp.broadcast_to(jnp.arange(128, dtype=jnp.int32)[None, :], (8, 128))
    s = jnp.array([5], jnp.int32)
    # numpy semantics: out[0,5] == 0, out[0,0] == 123
    return f, (s, x), lambda o: o[0, 5] == 0 and o[0, 0] == 123


@probe
def axis1_wide():
    # [8, 66560]-wide lane gather, 16 chained rounds
    W = 66560

    def kernel(x_ref, i_ref, o_ref):
        idx = i_ref[:]
        x = x_ref[:]
        for _ in range(16):
            idx = jnp.take_along_axis(x, idx, axis=1)
        o_ref[:] = idx

    def f(x, i):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, W), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, i)

    x = (jnp.arange(W, dtype=jnp.int32)[None, :] // 2).repeat(8, axis=0)
    i = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (8, W))
    return f, (x, i), lambda o: o[0, 8] == 0


@probe
def axis1_narrow_out():
    # gather only [8,128] outputs from a [8, 66560] source, 64 chained
    W = 66560

    def kernel(x_ref, i_ref, o_ref):
        idx = i_ref[:]
        x = x_ref[:]
        for _ in range(64):
            idx = jnp.take_along_axis(x, idx, axis=1)
        o_ref[:] = idx

    def f(x, i):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, i)

    x = (jnp.arange(W, dtype=jnp.int32)[None, :] % 97).repeat(8, axis=0)
    i = jnp.broadcast_to(jnp.arange(128, dtype=jnp.int32)[None, :], (8, 128))
    return f, (x, i), None


@probe
def seq_tag_loop():
    # Per-tag machinery microbench: 4096 iterations of
    # (2-row dyn sublane load, 2 dynamic rolls, select, 2 scalar reads,
    #  dyn sublane RMW store) — the Design-A inner loop shape.
    R = 528

    def kernel(x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(t, s):
            q = s >> 7
            r = s & 127
            two = x_ref[pl.ds(q, 2), :]
            sh = (128 - r) & 127
            lo = pltpu.roll(two[0:1, :], shift=sh, axis=1)
            hi = pltpu.roll(two[1:2, :], shift=sh, axis=1)
            w = jnp.where(lane < 128 - r, lo, hi)
            b0 = w[0, 0]
            b1 = w[0, 1]
            # merge-write back at a moving dst
            dq = (s + 64) >> 7
            dr = (s + 64) & 127
            rot = pltpu.roll(w, shift=dr, axis=1)
            cur = o_ref[pl.ds(dq, 2), :]
            m0 = jnp.where(lane >= dr, rot, cur[0:1, :])
            o_ref[pl.ds(dq, 1), :] = m0
            o_ref[pl.ds(dq + 1, 1), :] = rot
            return (s + 3 + (b0 & 1) + (b1 & 1)) & 16383

        jax.lax.fori_loop(0, 4096, body, jnp.int32(0))

    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.ones((R, 128), jnp.int32)
    return f, (x,), None


@probe
def seq_tag_loop_16x():
    # same loop at 16x the iterations to separate fixed dispatch cost
    R = 528

    def kernel(x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(t, s):
            q = s >> 7
            r = s & 127
            two = x_ref[pl.ds(q, 2), :]
            sh = (128 - r) & 127
            lo = pltpu.roll(two[0:1, :], shift=sh, axis=1)
            hi = pltpu.roll(two[1:2, :], shift=sh, axis=1)
            w = jnp.where(lane < 128 - r, lo, hi)
            b0 = w[0, 0]
            b1 = w[0, 1]
            dq = (s + 64) >> 7
            dr = (s + 64) & 127
            rot = pltpu.roll(w, shift=dr, axis=1)
            cur = o_ref[pl.ds(dq, 2), :]
            m0 = jnp.where(lane >= dr, rot, cur[0:1, :])
            o_ref[pl.ds(dq, 1), :] = m0
            o_ref[pl.ds(dq + 1, 1), :] = rot
            return (s + 3 + (b0 & 1) + (b1 & 1)) & 16383

        jax.lax.fori_loop(0, 65536, body, jnp.int32(0))

    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.ones((R, 128), jnp.int32)
    return f, (x,), None


@probe
def scalar_only_loop():
    # pure scalar loop: 65536 iterations of scalar arithmetic — floor
    # cost of one loop trip without any vector work
    def kernel(x_ref, o_ref):
        def body(t, s):
            return (s * 5 + 1) & 65535

        v = jax.lax.fori_loop(0, 65536, body, jnp.int32(1))
        o_ref[:] = jnp.full((8, 128), v, jnp.int32)

    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.ones((8, 128), jnp.int32)
    return f, (x,), None


@probe
def grid64_seq_tag():
    # Design-A production shape: grid of 64 blocks, 4096-tag loop each
    R = 528
    B = 64

    def kernel(x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(t, s):
            q = s >> 7
            r = s & 127
            two = x_ref[0, pl.ds(q, 2), :]
            sh = (128 - r) & 127
            lo = pltpu.roll(two[0:1, :], shift=sh, axis=1)
            hi = pltpu.roll(two[1:2, :], shift=sh, axis=1)
            w = jnp.where(lane < 128 - r, lo, hi)
            b0 = w[0, 0]
            dq = (s + 64) >> 7
            dr = (s + 64) & 127
            rot = pltpu.roll(w, shift=dr, axis=1)
            cur = o_ref[0, pl.ds(dq, 2), :]
            m0 = jnp.where(lane >= dr, rot, cur[0:1, :])
            o_ref[0, pl.ds(dq, 1), :] = m0
            o_ref[0, pl.ds(dq + 1, 1), :] = rot
            return (s + 3 + (b0 & 1)) & 16383

        jax.lax.fori_loop(0, 4096, body, jnp.int32(0))

    def f(x):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            out_shape=jax.ShapeDtypeStruct((B, R, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec((1, R, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((1, R, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        )(x)

    x = jnp.ones((B, R, 128), jnp.int32)
    return f, (x,), None


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
