"""Probe 10: per-trip cost of flat-decode panel bodies at scale.

Probe 9 proved the PANEL=128 body compiles (g_full_i32) but its timing
was relay/D2H-dominated (grid=1, 266 KB fetch).  Here every variant runs
grid=GB blocks x NT trips with the output reduced on device (fetch is 8
floats), at two trip counts so the per-trip cost can be differenced
free of call overhead:

  lane_take128   take_along_axis(axis=1) with computed idx, (128,128)
  v128_barrel    probe-9 body (barrel shifter), PANEL=128
  v128_take      barrel replaced by 2x take_along_axis(axis=1) + select
  v512_take      4 subpanels x 128 (per-subpanel W=128 windows, indep
                 chains) + one shared (520,512)x(512,128) compose
  v512_barrel    same with barrel shifters
  v512_nocompose v512_take without the shared compose (cost split)
  v512_nogather  v512_take with gather matmuls knocked out

Run: python tools/mosaic_probe10.py [probe ...]
"""

from __future__ import annotations

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
W = 128          # per-subpanel source window rows
RB = 728         # B rows (pad + 64KiB comp + 192 pattern rows + guard)
ROWS = 520       # output rows
GB = 32          # grid blocks

PROBES = {}


def fetch(x):
    return np.asarray(x)


def run_probe(name, fn):
    try:
        t0 = time.time()
        build = fn()
        results = []
        for nt in build["trips"]:
            f, args = build["make"](nt)
            jf = jax.jit(f)
            out = fetch(jf(*args))
            t_compile = time.time() - t0
            if build.get("check") and not build["check"](out, nt):
                print(f"PROBE {name} WRONG nt={nt} got={out.ravel()[:2]}",
                      flush=True)
                return
            best = 1e9
            for _ in range(5):
                t1 = time.time()
                fetch(jf(*args))
                best = min(best, time.time() - t1)
            results.append((nt, best))
        (n1, t1), (n2, t2) = results[0], results[-1]
        per = (t2 - t1) / ((n2 - n1) * GB) * 1e9
        print(
            f"PROBE {name} PASS compile={t_compile:.1f}s "
            f"t[{n1}]={t1*1e3:.1f}ms t[{n2}]={t2*1e3:.1f}ms per_trip={per:.0f}ns",
            flush=True,
        )
    except Exception as e:  # noqa
        head = " | ".join(str(e).splitlines()[:3])[:200]
        print(f"PROBE {name} FAIL {type(e).__name__}: {head}", flush=True)


def probe(fn):
    PROBES[fn.__name__] = fn
    return fn


def lane_take128():
    """Micro: take_along_axis(axis=1) with a computed dynamic index."""
    def build():
        def make(nt):
            def kernel(x_ref, o_ref):
                x = x_ref[0, :, :]

                def body(i, acc):
                    idx = (jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 1)
                           + i) & (VEC - 1)
                    t = jnp.take_along_axis(x, idx, axis=1)
                    return acc + t

                o_ref[0, :, :] = jax.lax.fori_loop(
                    0, nt, body, jnp.zeros((VEC, VEC), jnp.float32))

            def f(x):
                return pl.pallas_call(
                    kernel,
                    grid=(GB,),
                    in_specs=[pl.BlockSpec((1, VEC, VEC), lambda g: (g, 0, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((1, VEC, VEC), lambda g: (g, 0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((GB, VEC, VEC),
                                                   jnp.float32),
                    interpret=INTERP,
                )(x).sum()

            x = jnp.ones((GB, VEC, VEC), jnp.float32)
            return f, (x,)

        return {"trips": (256, 768), "make": make,
                "check": lambda o, nt: abs(float(o) - GB * VEC * VEC * nt) < 1e7}

    return build()


PROBES["lane_take128"] = lane_take128


def _subpanel(mrow_a, mrow_b, bwin_bf, lane_p, use_take):
    """One 128-piece subpanel body; returns (masked(128,128)f32, drow(1,128))."""
    a_col = jnp.transpose(mrow_a, (1, 0))            # (128,1)
    b_col = jnp.transpose(mrow_b, (1, 0))
    qrel = a_col & 127
    rot = jax.lax.shift_right_logical(a_col, 7) & 127
    dphi = b_col & 127
    lenm1 = jax.lax.shift_right_logical(b_col, 7) & 127
    drow = jax.lax.shift_right_logical(mrow_b, 14) & 1023   # (1,128)
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (VEC, W), 1)
    rs0 = (lane_w == qrel).astype(jnp.bfloat16)
    rs1 = (lane_w == qrel + 1).astype(jnp.bfloat16)
    u0 = jax.lax.dot_general(rs0, bwin_bf, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    u1 = jax.lax.dot_general(rs1, bwin_bf, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    phi = (VEC - rot) & (VEC - 1)
    if use_take:
        idx = (phi + lane_p) & (VEC - 1)
        t0 = jnp.take_along_axis(u0, idx, axis=1)
        t1 = jnp.take_along_axis(u1, idx, axis=1)
        v = jnp.where(phi + lane_p < VEC, t0, t1)
    else:
        m = jnp.where(lane_p >= phi, u0, u1)
        v = m
        for k in range(7):
            bit = (jax.lax.shift_right_logical(rot, k) & 1) == 1
            v = jnp.where(bit, pltpu.roll(v, shift=1 << k, axis=1), v)
    mask = (lane_p >= dphi) & (lane_p - dphi <= lenm1)
    return jnp.where(mask, v, 0.0), drow


def _mk_v(nsub, use_take, knock=None):
    """nsub subpanels per trip, shared compose."""
    def build():
        def make(nt):
            def kernel(b_ref, meta_ref, st_ref, out_ref):
                lane_p = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 1)
                row_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (ROWS, nsub * VEC), 0)
                out_ref[0, :, :] = jnp.zeros((ROWS, VEC), jnp.float32)

                def body(i, c):
                    srow = st_ref[0, pl.ds((i >> 5) & 7, 1), :]
                    sr = pltpu.roll(srow, shift=(VEC - ((i & 31) * 4)) & (VEC - 1),
                                    axis=1)
                    mrow = meta_ref[0, pl.ds((2 * nsub) * (i & 63), 2 * nsub), :]
                    maskeds = []
                    drows = []
                    for s in range(nsub):
                        st = sr[0, s] if nsub > 1 else sr[0, 0]
                        if knock == "nogather":
                            bwin = jnp.zeros((W, VEC), jnp.bfloat16)
                        else:
                            bwin = b_ref[0, pl.ds(st, W), :].astype(jnp.bfloat16)
                        mk, dr = _subpanel(mrow[s:s + 1, :],
                                           mrow[nsub + s:nsub + s + 1, :],
                                           bwin, lane_p, use_take)
                        maskeds.append(mk)
                        drows.append(dr)
                    if knock == "nocompose":
                        out_ref[0, :VEC, :] += sum(maskeds)
                    else:
                        mcat = jnp.concatenate(maskeds, axis=0).astype(
                            jnp.bfloat16)
                        dcat = jnp.concatenate(drows, axis=1)
                        ds_t = (row_iota == dcat).astype(jnp.bfloat16)
                        contrib = jax.lax.dot_general(
                            ds_t, mcat, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        out_ref[0, :, :] += contrib
                    return c

                jax.lax.fori_loop(0, nt, body, jnp.int32(0))

            def f(b, meta, st):
                return pl.pallas_call(
                    kernel,
                    grid=(GB,),
                    in_specs=[
                        pl.BlockSpec((1, RB, VEC), lambda g: (g, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 2 * nsub * 64, VEC),
                                     lambda g: (g, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 8, VEC), lambda g: (g, 0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((1, ROWS, VEC), lambda g: (g, 0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((GB, ROWS, VEC),
                                                   jnp.float32),
                    interpret=INTERP,
                )(b, meta, st).sum()

            b = jnp.full((GB, RB, VEC), 7, jnp.int32)
            meta = np.zeros((GB, 2 * nsub * 64, VEC), np.int32)
            # every piece: full row (dphi=0, lenm1=127), drow=s (disjoint-ish)
            for s in range(nsub):
                meta[:, nsub + s::2 * nsub, :] = (127 << 7) | (s << 14)
            st = np.zeros((GB, 8, VEC), np.int32)
            return f, (b, jnp.asarray(meta), jnp.asarray(st))

        return {"trips": (64, 192), "make": make, "check": None}

    return build()


for _n, _ns, _t, _k in (
    ("v128_barrel", 1, False, None),
    ("v128_take", 1, True, None),
    ("v512_take", 4, True, None),
    ("v512_barrel", 4, False, None),
    ("v512_nocompose", 4, True, "nocompose"),
    ("v512_nogather", 4, True, "nogather"),
):
    PROBES[_n] = (lambda ns=_ns, t=_t, k=_k: _mk_v(ns, t, k))


def main():
    names = sys.argv[1:] or list(PROBES)
    print(f"devices: {jax.devices()}", flush=True)
    for n in names:
        run_probe(n, PROBES[n])
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
