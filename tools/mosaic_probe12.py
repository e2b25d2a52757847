"""Probe 12: bisect the probe-11 v2 compile failure.

v1 (shipped) differs from v2 by: (a) concat 4x(128,128) -> (512,128),
(b) rolls/selects on the tall (512,128) panel, (c) bf16 rolls (v1 rolls
f32), (d) wide compose (128,512)@(512,128) with a (128,512) iota
one-hot, (e) bf16-scalar jnp.where.  Each probe isolates one.

Run: python tools/mosaic_probe12.py [names...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from snappy_tpu.utils.jaxcache import setup_compilation_cache

setup_compilation_cache()

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VEC = 128
INTERP = os.environ.get("PROBE_INTERPRET") == "1"
GB = 8

PROBES = {}


def fetch(x):
    return np.asarray(x)


def simple(name, trips=(64, 192)):
    """Register a probe whose kernel body is fn(x (512,128) f32) -> (*, VEC)."""
    def deco(fn):
        def build():
            def make(nt):
                def kernel(x_ref, o_ref):
                    x = x_ref[0, :, :]

                    def body(i, acc):
                        return acc + fn(x, i)

                    o_ref[0, :, :] = jax.lax.fori_loop(
                        0, nt, body, jnp.zeros((VEC, VEC), jnp.float32))

                def f(x):
                    return pl.pallas_call(
                        kernel,
                        grid=(GB,),
                        in_specs=[pl.BlockSpec((1, 4 * VEC, VEC),
                                               lambda g: (g, 0, 0),
                                               memory_space=pltpu.VMEM)],
                        out_specs=pl.BlockSpec((1, VEC, VEC),
                                               lambda g: (g, 0, 0),
                                               memory_space=pltpu.VMEM),
                        out_shape=jax.ShapeDtypeStruct((GB, VEC, VEC),
                                                       jnp.float32),
                        interpret=INTERP,
                    )(x).sum()

                x = jnp.ones((GB, 4 * VEC, VEC), jnp.float32)
                return f, (x,)

            return {"trips": trips, "make": make}

        PROBES[name] = lambda: build()
        return fn
    return deco


@simple("tall_roll_f32")
def _p1(x, i):
    """One static roll on the tall (512,128) f32 panel."""
    r = pltpu.roll(x, shift=1, axis=1)
    return r[:VEC, :] + r[VEC:2 * VEC, :]


@simple("tall_roll_bf16")
def _p2(x, i):
    xb = x.astype(jnp.bfloat16)
    r = pltpu.roll(xb, shift=1, axis=1)
    return (r[:VEC, :] + r[VEC:2 * VEC, :]).astype(jnp.float32)


@simple("tall_barrel_f32")
def _p3(x, i):
    """Full 7-step masked barrel shifter on (512,128) f32."""
    rot = jax.lax.broadcasted_iota(jnp.int32, (4 * VEC, 1), 0) + i
    v = x
    for k in range(7):
        bit = (jax.lax.shift_right_logical(rot, k) & 1) == 1
        v = jnp.where(bit, pltpu.roll(v, shift=1 << k, axis=1), v)
    return v[:VEC, :] + v[3 * VEC:, :]


@simple("concat4")
def _p4(x, i):
    parts = [x[k * VEC:(k + 1) * VEC, :] * (k + 1) for k in range(4)]
    c = jnp.concatenate(parts, axis=0)
    return c[:VEC, :] + c[3 * VEC:, :]


@simple("wide_onehot_compose")
def _p5(x, i):
    """(128,512) iota one-hot @ (512,128) bf16 matmul."""
    drel = jax.lax.broadcasted_iota(jnp.int32, (1, 4 * VEC), 1) & 127
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (VEC, 4 * VEC), 0)
    ds_t = (row_iota == drel + i - i).astype(jnp.bfloat16)
    return jax.lax.dot_general(ds_t, x.astype(jnp.bfloat16),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


@simple("where_bf16_scalar")
def _p6(x, i):
    xb = x.astype(jnp.bfloat16)
    m = jax.lax.broadcasted_iota(jnp.int32, (4 * VEC, VEC), 1) > (i & 63)
    v = jnp.where(m, xb, jnp.bfloat16(0))
    return (v[:VEC, :] + v[VEC:2 * VEC, :]).astype(jnp.float32)


def main():
    names = sys.argv[1:] or list(PROBES)
    print(f"devices: {jax.devices()}", flush=True)
    for n in names:
        fn = PROBES[n]
        try:
            t0 = time.time()
            build = fn()
            results = []
            for nt in build["trips"]:
                f, args = build["make"](nt)
                jf = jax.jit(f)
                fetch(jf(*args))
                t_compile = time.time() - t0
                best = 1e9
                for _ in range(5):
                    t1 = time.time()
                    fetch(jf(*args))
                    best = min(best, time.time() - t1)
                results.append((nt, best))
            (n1, t1), (n2, t2) = results[0], results[-1]
            per = (t2 - t1) / ((n2 - n1) * GB) * 1e9
            print(f"PROBE {n} PASS compile={t_compile:.1f}s "
                  f"t[{n1}]={t1*1e3:.1f}ms t[{n2}]={t2*1e3:.1f}ms "
                  f"per_trip={per:.0f}ns", flush=True)
        except Exception as e:  # noqa
            head = " | ".join(str(e).splitlines()[:3])[:200]
            print(f"PROBE {n} FAIL {type(e).__name__}: {head}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
