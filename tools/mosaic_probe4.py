"""Mosaic probe round 4: value-carried decoder feasibility.

probe3 showed dynamic-start ref slices cost ~450 ns each while value ops
(rolls/selects) are ~free.  These probes price the building blocks of a
decoder that carries its comp/out windows as loop values and touches
refs rarely.
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
N = 65536

PROBES = {}


def probe(fn):
    PROBES[fn.__name__] = fn
    return fn


def run_probe(name, fn):
    try:
        t0 = time.time()
        f, args, check = fn()
        jf = jax.jit(f)
        out = np.asarray(jf(*args))
        t_compile = time.time() - t0
        if check is not None and not check(out):
            print(f"PROBE {name} WRONG compile={t_compile:.1f}s out={np.ravel(out)[:8]}", flush=True)
            return
        best = 1e9
        for _ in range(6):
            t0 = time.time()
            np.asarray(jf(*args))
            best = min(best, time.time() - t0)
        print(f"PROBE {name} PASS compile={t_compile:.1f}s run={best*1e3:.1f}ms "
              f"({best*1e9/N:.0f} ns/op)", flush=True)
    except Exception as e:  # noqa
        head = " | ".join(str(e).splitlines()[:2])[:200]
        print(f"PROBE {name} FAIL {type(e).__name__}: {head}", flush=True)


def _mk(kernel, out_rows=R):
    def f(s, x):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((out_rows, 128), jnp.int32),
        )(s, x)

    x = jnp.ones((R, 128), jnp.int32)
    s = jnp.arange(N, dtype=jnp.int32) % ((R - 18) * 128)
    return f, (s, x), None


@probe
def carry32_laneroll():
    # [32,128] loop carry, one dynamic lane roll + select per op
    def kernel(s_ref, x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1)

        def body(i, t):
            sh = s_ref[i] & 127
            t = jnp.where(lane < sh, pltpu.roll(t, shift=sh, axis=1), t)
            return t

        t = jax.lax.fori_loop(0, N, body, jnp.zeros((32, 128), jnp.int32))
        o_ref[0:32, :] = t

    return _mk(kernel)


@probe
def carry32_subroll_dyn():
    # dynamic SUBLANE roll (axis=0) on a carried value — compiles? cost?
    def kernel(s_ref, x_ref, o_ref):
        def body(i, t):
            sh = s_ref[i] & 31
            t = pltpu.roll(t, shift=sh, axis=0)
            return t

        t = jax.lax.fori_loop(0, N, body, jnp.ones((32, 128), jnp.int32))
        o_ref[0:32, :] = t

    return _mk(kernel)


@probe
def carry32_both_rolls():
    # the full "extract window from carried tail": sublane roll + lane
    # roll + select + static slice use
    def kernel(s_ref, x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1)

        def body(i, t):
            s = s_ref[i]
            t2 = pltpu.roll(t, shift=(32 - ((s >> 7) & 31)), axis=0)
            w = pltpu.roll(t2, shift=(128 - (s & 127)) & 127, axis=1)
            t = jnp.where(lane < (s & 127), w, t)
            return t

        t = jax.lax.fori_loop(0, N, body, jnp.zeros((32, 128), jnp.int32))
        o_ref[0:32, :] = t

    return _mk(kernel)


@probe
def dynload2():
    def kernel(s_ref, x_ref, o_ref):
        def body(i, c):
            q = s_ref[i] >> 7
            two = x_ref[pl.ds(q, 2), :]
            return c + two[0, 0]

        c = jax.lax.fori_loop(0, N, body, jnp.int32(0))
        o_ref[:] = jnp.full((8, 128), c, jnp.int32)

    return _mk(kernel, out_rows=8)


@probe
def dynload16():
    # same access count, 8x the bytes: does size matter or only count?
    def kernel(s_ref, x_ref, o_ref):
        def body(i, c):
            q = s_ref[i] >> 7
            blk = x_ref[pl.ds(q, 16), :]
            return c + blk[0, 0]

        c = jax.lax.fori_loop(0, N, body, jnp.int32(0))
        o_ref[:] = jnp.full((8, 128), c, jnp.int32)

    return _mk(kernel, out_rows=8)


@probe
def dynstore_only():
    def kernel(s_ref, x_ref, o_ref):
        row = x_ref[0:1, :]

        def body(i, c):
            q = s_ref[i] >> 7
            o_ref[pl.ds(q, 1), :] = row
            return c

        jax.lax.fori_loop(0, N, body, jnp.int32(0))

    return _mk(kernel)


@probe
def dynload2_indep():
    # independent addresses precomputed in SMEM, no carry dependency:
    # can the compiler overlap the access latency?
    def kernel(s_ref, x_ref, o_ref):
        def body(i, c):
            q1 = s_ref[i] >> 7
            q2 = s_ref[i] & 255
            a = x_ref[pl.ds(q1, 2), :]
            b = x_ref[pl.ds(q2, 2), :]
            o_ref[pl.ds((q1 + 3) & 255, 1), :] = a[0:1] + b[0:1]
            return c

        jax.lax.fori_loop(0, N // 2, body, jnp.int32(0))

    return _mk(kernel)


@probe
def smem_records_block():
    T = 8192

    def kernel(rec_ref, x_ref, o_ref):
        def body(i, c):
            return c + rec_ref[0, i & (T - 1), 0] + rec_ref[0, i & (T - 1), 1]

        v = jax.lax.fori_loop(0, N, body, jnp.int32(0))
        o_ref[:] = jnp.full((8, 128), v, jnp.int32)

    def f(rec, x):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec((1, T, 4), lambda b: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(rec, x)

    rec = jnp.ones((1, T, 4), jnp.int32)
    x = jnp.ones((R, 128), jnp.int32)
    return f, (rec, x), lambda o: o[0, 0] == 2 * N


@probe
def vmem_scratch_carry():
    # carry kept in VMEM scratch with STATIC slicing (ring of 4 rows
    # addressed by unrolled modulo): price of scratch-based state
    def kernel(s_ref, x_ref, o_ref, t_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(i, c):
            sh = s_ref[i] & 127
            w = pltpu.roll(t_ref[0:1, :], shift=sh, axis=1)
            t_ref[0:1, :] = jnp.where(lane < sh, w, t_ref[1:2, :])
            return c

        jax.lax.fori_loop(0, N, body, jnp.int32(0))
        o_ref[0:8, :] = t_ref[0:8, :]

    def f(s, x):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
            ),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        )(s, x)

    x = jnp.ones((R, 128), jnp.int32)
    s = jnp.arange(N, dtype=jnp.int32)
    return f, (s, x), None


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
