"""Mosaic probe round 3: decompose the per-tag cost of the sequential
decoder and measure the batched-wave alternative.

All loops run 65536 "ops" total so times are directly comparable; the
relay sync floor (~30-50 ms) is shared.  Compare deltas, not absolutes.
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
            print(f"PROBE {name} WRONG compile={t_compile:.1f}s out={np.ravel(out)[:8]}", flush=True)
            return
        best = 1e9
        for _ in range(6):
            t0 = time.time()
            fetch(jf(*args))
            best = min(best, time.time() - t0)
        print(f"PROBE {name} PASS compile={t_compile:.1f}s run={best*1e3:.1f}ms "
              f"({best*1e9/N:.0f} ns/op)", flush=True)
    except Exception as e:  # noqa
        head = " | ".join(str(e).splitlines()[:2])[:200]
        print(f"PROBE {name} FAIL {type(e).__name__}: {head}", flush=True)


def _mk(kernel, n_prefetch=1):
    def f(s, x):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=n_prefetch,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        )(s, x)

    x = jnp.ones((R, 128), jnp.int32)
    s = jnp.arange(N, dtype=jnp.int32) % ((R - 2) * 128)
    return f, (s, x), None


@probe
def base_dynload_store():
    # 1 dyn [2,128] load + 1 dyn [1,128] store per op, base from SMEM
    def kernel(s_ref, x_ref, o_ref):
        def body(i, c):
            s = s_ref[i]
            q = s >> 7
            two = x_ref[pl.ds(q, 2), :]
            o_ref[pl.ds((q + 7) & 255, 1), :] = two[0:1, :]
            return c

        jax.lax.fori_loop(0, N, body, jnp.int32(0))

    return _mk(kernel)


@probe
def plus_dynrolls():
    def kernel(s_ref, x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(i, c):
            s = s_ref[i]
            q = s >> 7
            r = s & 127
            two = x_ref[pl.ds(q, 2), :]
            sh = (128 - r) & 127
            lo = pltpu.roll(two[0:1, :], shift=sh, axis=1)
            hi = pltpu.roll(two[1:2, :], shift=sh, axis=1)
            w = jnp.where(lane < 128 - r, lo, hi)
            o_ref[pl.ds((q + 7) & 255, 1), :] = w
            return c

        jax.lax.fori_loop(0, N, body, jnp.int32(0))

    return _mk(kernel)


@probe
def plus_scalar_extract():
    # adds 2 vector->scalar extracts feeding the NEXT index (dependency)
    def kernel(s_ref, x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(i, carry):
            s = (s_ref[i] + carry) % ((R - 2) * 128)
            q = s >> 7
            r = s & 127
            two = x_ref[pl.ds(q, 2), :]
            sh = (128 - r) & 127
            lo = pltpu.roll(two[0:1, :], shift=sh, axis=1)
            hi = pltpu.roll(two[1:2, :], shift=sh, axis=1)
            w = jnp.where(lane < 128 - r, lo, hi)
            b0 = w[0, 0]
            b1 = w[0, 1]
            o_ref[pl.ds((q + 7) & 255, 1), :] = w
            return (b0 & 1) + (b1 & 1)

        jax.lax.fori_loop(0, N, body, jnp.int32(0))

    return _mk(kernel)


@probe
def dyn_scalar_vmem_read():
    # scalar VMEM read at DYNAMIC [q, r] — does it even compile?
    def kernel(s_ref, x_ref, o_ref):
        def body(i, c):
            s = s_ref[i]
            v = x_ref[s >> 7, s & 127]
            return c + v

        v = jax.lax.fori_loop(0, N, body, jnp.int32(0))
        o_ref[:] = jnp.full((R, 128), v, jnp.int32)

    return _mk(kernel)


@probe
def while_vs_fori():
    # same body as plus_dynrolls but under while_loop
    def kernel(s_ref, x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def cond(st):
            i, c = st
            return i < N

        def body(st):
            i, c = st
            s = s_ref[i]
            q = s >> 7
            r = s & 127
            two = x_ref[pl.ds(q, 2), :]
            sh = (128 - r) & 127
            lo = pltpu.roll(two[0:1, :], shift=sh, axis=1)
            hi = pltpu.roll(two[1:2, :], shift=sh, axis=1)
            w = jnp.where(lane < 128 - r, lo, hi)
            o_ref[pl.ds((q + 7) & 255, 1), :] = w
            return i + 1, c

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))

    return _mk(kernel)


@probe
def log_rotate8():
    # [8,128] per-sublane variable rotation via 7 static roll+select
    # steps; 8 ops per iteration, N/8 iterations
    def kernel(s_ref, x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        def body(i, c):
            sh = (s_ref[pl.ds(i * 8, 8)] & 127)[:, None]  # [8,1]
            w = x_ref[0:8, :]
            for k in range(7):
                bit = 1 << k
                w = jnp.where((sh & bit) != 0, pltpu.roll(w, shift=bit, axis=1), w)
            o_ref[8:16, :] = w
            return c

        jax.lax.fori_loop(0, N // 8, body, jnp.int32(0))

    return _mk(kernel)


@probe
def wave8_full():
    # full batched wave: 8 dyn [2,128] loads -> [8,128] lo/hi, log-rotate
    # both, select, log-rotate to dst phase, merge, 16 dyn stores.
    # 8 ops/iter, N/8 iters.
    def kernel(s_ref, x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        def logrot(w, sh):
            for k in range(7):
                bit = 1 << k
                w = jnp.where((sh & bit) != 0, pltpu.roll(w, shift=bit, axis=1), w)
            return w

        def body(i, c):
            svec = s_ref[pl.ds(i * 8, 8)]  # [8]
            sh = (svec & 127)[:, None]
            rows = []
            for j in range(8):
                q = s_ref[i * 8 + j] >> 7
                rows.append(x_ref[pl.ds(q, 2), :])
            lo = jnp.concatenate([t[0:1] for t in rows], axis=0)  # [8,128]
            hi = jnp.concatenate([t[1:2] for t in rows], axis=0)
            lo = logrot(lo, (128 - sh) & 127)
            hi = logrot(hi, (128 - sh) & 127)
            w = jnp.where(lane < 128 - sh, lo, hi)
            # rotate to destination phase and merge-store
            dvec = (svec * 7)[:, None] & 127
            rot = logrot(w, dvec)
            for j in range(8):
                dq = ((s_ref[i * 8 + j] * 7) >> 7) % (R - 2)
                cur = o_ref[pl.ds(dq, 1), :]
                m0 = jnp.where(lane[j : j + 1] >= dvec[j, 0], rot[j : j + 1], cur)
                o_ref[pl.ds(dq, 1), :] = m0
                o_ref[pl.ds(dq + 1, 1), :] = rot[j : j + 1]
            return c

        jax.lax.fori_loop(0, N // 8, body, jnp.int32(0))

    return _mk(kernel)


@probe
def smem_records_block():
    # can a [1, 8192, 4] int32 SMEM *input block* be indexed scalar-ly?
    T = 8192

    def kernel(rec_ref, x_ref, o_ref):
        def body(i, c):
            return c + rec_ref[0, i % T, 0] + rec_ref[0, i % T, 1]

        v = jax.lax.fori_loop(0, N, body, jnp.int32(0))
        o_ref[:] = jnp.full((R, 128), v, jnp.int32)

    def f(rec, x):
        return pl.pallas_call(
            kernel,
            grid=(1,),
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
