"""Mosaic probe round 5: trustworthy per-op costs (1M+ ops per call so
the 30-60 ms relay sync floor is <5% of the measurement), and the
unrolling lever.
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
N = 1 << 20  # ops per call

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
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            np.asarray(jf(*args))
            best = min(best, time.time() - t0)
        print(f"PROBE {name} PASS compile={t_compile:.1f}s run={best*1e3:.0f}ms "
              f"({best*1e9/N:.1f} ns/op)", flush=True)
    except Exception as e:  # noqa
        head = " | ".join(str(e).splitlines()[:2])[:200]
        print(f"PROBE {name} FAIL {type(e).__name__}: {head}", flush=True)


def _mk(kernel, n_smem=N):
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
    s = (jnp.arange(n_smem, dtype=jnp.int32) * 7) % ((R - 18) * 128)
    return f, (s, x), None


@probe
def pure_loop():
    def kernel(s_ref, x_ref, o_ref):
        def body(i, c):
            return (c * 5 + 1) & 65535

        v = jax.lax.fori_loop(0, N, body, jnp.int32(1))
        o_ref[0:8, :] = jnp.full((8, 128), v, jnp.int32)

    return _mk(kernel, n_smem=8)


@probe
def loop_smemread():
    def kernel(s_ref, x_ref, o_ref):
        def body(i, c):
            return c + s_ref[i & 65535]

        v = jax.lax.fori_loop(0, N, body, jnp.int32(0))
        o_ref[0:8, :] = jnp.full((8, 128), v, jnp.int32)

    return _mk(kernel, n_smem=65536)


@probe
def loop_dynload():
    def kernel(s_ref, x_ref, o_ref):
        def body(i, c):
            q = s_ref[i & 65535] >> 7
            two = x_ref[pl.ds(q, 2), :]
            return c + two[0, 0]

        v = jax.lax.fori_loop(0, N, body, jnp.int32(0))
        o_ref[0:8, :] = jnp.full((8, 128), v, jnp.int32)

    return _mk(kernel, n_smem=65536)


@probe
def loop_dynload_nodep():
    # load result NOT fed into carry: pure access throughput
    def kernel(s_ref, x_ref, o_ref):
        def body(i, c):
            q = s_ref[i & 65535] >> 7
            two = x_ref[pl.ds(q, 2), :]
            o_ref[pl.ds((q + 16) & 255, 2), :] = two
            return c

        jax.lax.fori_loop(0, N, body, jnp.int32(0))

    return _mk(kernel, n_smem=65536)


@probe
def unroll8_dynload():
    # 8 independent load+stores per trip, N/8 trips
    def kernel(s_ref, x_ref, o_ref):
        def body(i, c):
            for j in range(8):
                q = s_ref[(i * 8 + j) & 65535] >> 7
                two = x_ref[pl.ds(q, 2), :]
                o_ref[pl.ds((q + 16) & 255, 2), :] = two
            return c

        jax.lax.fori_loop(0, N // 8, body, jnp.int32(0))

    return _mk(kernel, n_smem=65536)


@probe
def roll1_128():
    # dynamic lane roll on [1,128] + loop
    def kernel(s_ref, x_ref, o_ref):
        def body(i, w):
            sh = s_ref[i & 65535] & 127
            return pltpu.roll(w, shift=sh, axis=1) + 1

        w = jax.lax.fori_loop(0, N, body, jnp.ones((1, 128), jnp.int32))
        o_ref[0:1, :] = w

    return _mk(kernel, n_smem=65536)


@probe
def roll8_128():
    def kernel(s_ref, x_ref, o_ref):
        def body(i, w):
            sh = s_ref[i & 65535] & 127
            return pltpu.roll(w, shift=sh, axis=1) + 1

        w = jax.lax.fori_loop(0, N, body, jnp.ones((8, 128), jnp.int32))
        o_ref[0:8, :] = w

    return _mk(kernel, n_smem=65536)


@probe
def static_roll1():
    def kernel(s_ref, x_ref, o_ref):
        def body(i, w):
            return pltpu.roll(w, shift=1, axis=1) + 1

        w = jax.lax.fori_loop(0, N, body, jnp.ones((1, 128), jnp.int32))
        o_ref[0:1, :] = w

    return _mk(kernel, n_smem=8)


@probe
def select1_128():
    def kernel(s_ref, x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(i, w):
            sh = s_ref[i & 65535] & 127
            return jnp.where(lane < sh, w + 1, w)

        w = jax.lax.fori_loop(0, N, body, jnp.ones((1, 128), jnp.int32))
        o_ref[0:1, :] = w

    return _mk(kernel, n_smem=65536)


@probe
def scalar_extract():
    # vector -> scalar move cost
    def kernel(s_ref, x_ref, o_ref):
        def body(i, c):
            w = x_ref[0:1, :] + c
            return w[0, 0]

        v = jax.lax.fori_loop(0, N, body, jnp.int32(0))
        o_ref[0:8, :] = jnp.full((8, 128), v, jnp.int32)

    return _mk(kernel, n_smem=8)


@probe
def full_tag_body():
    # realistic current-kernel tag body, 1M tags, for calibration
    def kernel(s_ref, x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(i, st):
            s, d = st
            q = s >> 7
            r = s & 127
            two = x_ref[pl.ds(q, 2), :]
            sh = (128 - r) & 127
            lo = pltpu.roll(two[0:1, :], shift=sh, axis=1)
            hi = pltpu.roll(two[1:2, :], shift=sh, axis=1)
            w = jnp.where(lane < 128 - r, lo, hi)
            b0 = w[0, 0]
            dq = d >> 7
            dr = d & 127
            rot = pltpu.roll(w, shift=dr, axis=1)
            cur = o_ref[pl.ds(dq, 1), :]
            o_ref[pl.ds(dq, 1), :] = jnp.where(lane >= dr, rot, cur)
            o_ref[pl.ds(dq + 1, 1), :] = rot
            s2 = (s + 3 + (b0 & 7)) & 32767
            d2 = (d + 17) & 32767
            return s2, d2

        jax.lax.fori_loop(0, N, body, (jnp.int32(0), jnp.int32(0)))

    return _mk(kernel, n_smem=8)


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
