"""Probe 9: second bisection of the panel pipeline (probe 8 all failed).

Hypothesis ranking:
  (1) dynamic sublane slice on a bf16 ref with a non-provably-aligned
      start (bf16 tile = 16 sublanes; the passing probe-7 start was
      syntactically a multiple of 8) -> g1 keeps B in i32 (8-sublane
      tile, arbitrary dyn starts proven by the wave kernel) and casts
      the window to bf16.  Also drops the second (s+1) window: one
      window, two one-hots (qrel and qrel+1).
  (2..5) stage-knockout variants of g1 to localize if g1 still fails.

Run: python tools/mosaic_probe9.py [probe ...]
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

VEC = 128
PANEL, W, RB, ROWS = 128, 32, 592, 520
NP = 128

PROBES = {}


def probe(fn):
    PROBES[fn.__name__] = fn
    return fn


def fetch(x):
    return np.asarray(x)


def run_probe(name, fn):
    try:
        t0 = time.time()
        f, args, check, work = fn()
        jf = jax.jit(f)
        out = fetch(jf(*args))
        t_compile = time.time() - t0
        if check is not None and not check(out):
            print(f"PROBE {name} WRONG compile={t_compile:.1f}s got={out.ravel()[0]}",
                  flush=True)
            return
        best = 1e9
        for _ in range(5):
            t0 = time.time()
            fetch(jf(*args))
            best = min(best, time.time() - t0)
        per = f" per_unit={best / work * 1e9:.1f}ns" if work else ""
        print(f"PROBE {name} PASS compile={t_compile:.1f}s run={best*1e3:.1f}ms{per}",
              flush=True)
    except Exception as e:  # noqa
        head = " | ".join(str(e).splitlines()[:3])[:160]
        print(f"PROBE {name} FAIL {type(e).__name__}: {head}", flush=True)


def _mk(nv=7):
    b = jnp.full((1, RB, VEC), nv, jnp.int32)
    meta = np.zeros((1, 2 * NP, VEC), np.int32)
    meta[0, 1::2, :] = 127 << 7
    st = np.zeros((1, 8, VEC), np.int32)
    return b, jnp.asarray(meta), jnp.asarray(st)


def _mk_probe(variant):
    def build():
        def kernel(b_ref, meta_ref, st_ref, out_ref):
            lane_w = jax.lax.broadcasted_iota(jnp.int32, (PANEL, W), 1)
            lane_p = jax.lax.broadcasted_iota(jnp.int32, (PANEL, VEC), 1)
            row_iota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, PANEL), 0)
            out_ref[0, :, :] = jnp.zeros((ROWS, VEC), jnp.float32)

            def body(i, c):
                srow = st_ref[0, pl.ds(i >> 7, 1), :]
                sr = pltpu.roll(srow, shift=(VEC - (i & 127)) & (VEC - 1), axis=1)
                s = sr[0, 0]
                mrow = meta_ref[0, pl.ds(2 * i, 2), :]
                if variant == "no_transpose":
                    a_col = jnp.zeros((PANEL, 1), jnp.int32)
                    b_col = jnp.full((PANEL, 1), 127 << 7, jnp.int32)
                else:
                    mcol = jnp.transpose(mrow, (1, 0))
                    a_col = mcol[:, 0:1]
                    b_col = mcol[:, 1:2]
                qrel = a_col & 63
                rot = jax.lax.shift_right_logical(a_col, 6) & 127
                dphi = b_col & 127
                lenm1 = jax.lax.shift_right_logical(b_col, 7) & 127
                drow = jax.lax.shift_right_logical(mrow[1:2, :], 14) & 1023
                bwin = b_ref[0, pl.ds(s, W), :].astype(jnp.bfloat16)
                if variant == "no_gather":
                    u0 = jnp.broadcast_to(bwin[0:1, :], (PANEL, VEC)).astype(
                        jnp.float32
                    )
                    u1 = u0
                else:
                    rs = (lane_w == qrel).astype(jnp.bfloat16)
                    rs1 = (lane_w == qrel + 1).astype(jnp.bfloat16)
                    u0 = jax.lax.dot_general(
                        rs, bwin, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    u1 = jax.lax.dot_general(
                        rs1, bwin, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                phi = (VEC - rot) & (VEC - 1)
                m = jnp.where(lane_p >= phi, u0, u1)
                if variant == "no_barrel":
                    v = m
                else:
                    v = m
                    for k in range(7):
                        bit = (jax.lax.shift_right_logical(rot, k) & 1) == 1
                        v = jnp.where(bit, pltpu.roll(v, shift=1 << k, axis=1), v)
                mask = (lane_p >= dphi) & (lane_p - dphi <= lenm1)
                masked = jnp.where(mask, v, 0.0)
                if variant == "no_compose":
                    out_ref[0, :PANEL, :] += masked
                else:
                    ds_t = (row_iota == drow).astype(jnp.bfloat16)
                    contrib = jax.lax.dot_general(
                        ds_t, masked.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    out_ref[0, :, :] += contrib
                return c

            jax.lax.fori_loop(0, NP, body, jnp.int32(0))

        def f(b, meta, st):
            return pl.pallas_call(
                kernel,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec((1, RB, VEC), lambda g: (g, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 2 * NP, VEC), lambda g: (g, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8, VEC), lambda g: (g, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, ROWS, VEC), lambda g: (g, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, ROWS, VEC), jnp.float32),
            )(b, meta, st)

        b, meta, st = _mk()
        if variant == "no_compose":
            check = None
        else:
            check = lambda o: abs(o[0, 0, 0] - NP * PANEL * 7) < 1  # noqa
        return f, (b, meta, st), check, NP

    return build


for _v in ("full_i32", "no_transpose", "no_gather", "no_barrel", "no_compose"):
    PROBES[f"g_{_v}"] = _mk_probe(_v)


def main():
    names = sys.argv[1:] or list(PROBES)
    print(f"devices: {jax.devices()}", flush=True)
    for n in names:
        run_probe(n, PROBES[n])
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
