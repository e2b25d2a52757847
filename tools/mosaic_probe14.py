"""Probe 14: why is the production flat kernel ~12.6 us/trip when the
identical body in probe13 measures 5.5 (v1) / 3.0 (interleaved)?

Hypothesis: the probes use a STATIC Python-int fori_loop bound, the
production kernel a DYNAMIC per-block bound from scalar prefetch
(ntrips_ref[blk]) — a dynamic bound may block Mosaic's loop pipelining.

  v1i_static   interleaved body, static bound (probe13 v15_interleave)
  v1i_dyn      same body, PrefetchScalarGridSpec + fori_loop(0, n)
  v1i_dyn_pad  dynamic bound rounded up to a multiple of 8 with zeroed
               meta tail (tests whether ragged bounds alone hurt)

Run: python tools/mosaic_probe14.py [names...]
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
W = 128
INTERP = os.environ.get("PROBE_INTERPRET") == "1"
RB = 728
ROWS = 520
GB = 32
NSUB = 4
_VALID = 1 << 21
NMR = 8 * 96

PROBES = {}


def fetch(x):
    return np.asarray(x)


def _body_factory(lane_p, row_iota, b_ref, meta_ref, st_ref, out_ref):
    def body(i, c):
        srow = st_ref[0, pl.ds(i >> 5, 1), :]
        sr = pltpu.roll(srow, shift=(VEC - ((i & 31) * NSUB)) & (VEC - 1),
                        axis=1)
        mrow = meta_ref[0, pl.ds(2 * NSUB * i, 2 * NSUB), :]
        vs, rots, masks, drels, Ds = [], [], [], [], []
        for s in range(NSUB):
            w = sr[0, s]
            S = w & 1023
            Ds.append(jax.lax.shift_right_logical(w, 10) * VEC)
            bwin = b_ref[0, pl.ds(S, W), :].astype(jnp.bfloat16)
            a_col = jnp.transpose(mrow[s:s + 1, :], (1, 0))
            b_col = jnp.transpose(mrow[NSUB + s:NSUB + s + 1, :], (1, 0))
            qrel = a_col & 127
            rot = jax.lax.shift_right_logical(a_col, 7) & 127
            dphi = b_col & 127
            lenm1 = jax.lax.shift_right_logical(b_col, 7) & 127
            valid = (b_col & _VALID) != 0
            drels.append(jax.lax.shift_right_logical(
                mrow[NSUB + s:NSUB + s + 1, :], 14) & 127)
            lane_w = jax.lax.broadcasted_iota(jnp.int32, (VEC, W), 1)
            rs0 = (lane_w == qrel).astype(jnp.bfloat16)
            rs1 = (lane_w == qrel + 1).astype(jnp.bfloat16)
            u0 = jax.lax.dot_general(rs0, bwin, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            u1 = jax.lax.dot_general(rs1, bwin, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            phi = (VEC - rot) & (VEC - 1)
            vs.append(jnp.where(lane_p >= phi, u0, u1))
            rots.append(rot)
            masks.append(valid & (lane_p >= dphi) & (lane_p - dphi <= lenm1))
        for k in range(7):
            for s in range(NSUB):
                bit = (jax.lax.shift_right_logical(rots[s], k) & 1) == 1
                vs[s] = jnp.where(bit, pltpu.roll(vs[s], shift=1 << k, axis=1),
                                  vs[s])
        for s in range(NSUB):
            mk = jnp.where(masks[s], vs[s], 0.0)
            ds_t = (row_iota == drels[s]).astype(jnp.bfloat16)
            contrib = jax.lax.dot_general(
                ds_t, mk.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[0, pl.ds(Ds[s], VEC), :] += contrib
        return c

    return body


def _mk(variant):
    def build():
        def make(nt):
            if variant == "static":
                def kernel(b_ref, meta_ref, st_ref, out_ref):
                    lane_p = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 1)
                    row_iota = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 0)
                    out_ref[0, :, :] = jnp.zeros((ROWS, VEC), jnp.float32)
                    body = _body_factory(lane_p, row_iota, b_ref, meta_ref,
                                         st_ref, out_ref)
                    jax.lax.fori_loop(0, nt, body, jnp.int32(0))

                def f(b, meta, st):
                    return pl.pallas_call(
                        kernel,
                        grid=(GB,),
                        in_specs=[
                            pl.BlockSpec((1, RB, VEC), lambda g: (g, 0, 0),
                                         memory_space=pltpu.VMEM),
                            pl.BlockSpec((1, NMR, VEC), lambda g: (g, 0, 0),
                                         memory_space=pltpu.VMEM),
                            pl.BlockSpec((1, 8, VEC), lambda g: (g, 0, 0),
                                         memory_space=pltpu.VMEM),
                        ],
                        out_specs=pl.BlockSpec((1, ROWS, VEC),
                                               lambda g: (g, 0, 0),
                                               memory_space=pltpu.VMEM),
                        out_shape=jax.ShapeDtypeStruct((GB, ROWS, VEC),
                                                       jnp.float32),
                        interpret=INTERP,
                    )(b, meta, st).sum()
            else:
                def kernel(ntr_ref, b_ref, st_ref, meta_ref, out_ref):
                    blk = pl.program_id(0)
                    n = ntr_ref[blk]
                    lane_p = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 1)
                    row_iota = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 0)
                    out_ref[0, :, :] = jnp.zeros((ROWS, VEC), jnp.float32)
                    body = _body_factory(lane_p, row_iota, b_ref, meta_ref,
                                         st_ref, out_ref)
                    jax.lax.fori_loop(0, n, body, jnp.int32(0))

                def f(b, meta, st):
                    ntr = jnp.full((GB,), nt, jnp.int32)
                    if variant == "dyn_pad":
                        ntr = (ntr + 7) & ~7
                    grid_spec = pltpu.PrefetchScalarGridSpec(
                        num_scalar_prefetch=1,
                        grid=(GB,),
                        in_specs=[
                            pl.BlockSpec((1, RB, VEC), lambda g, *_: (g, 0, 0),
                                         memory_space=pltpu.VMEM),
                            pl.BlockSpec((1, 8, VEC), lambda g, *_: (g, 0, 0),
                                         memory_space=pltpu.VMEM),
                            pl.BlockSpec((1, NMR, VEC), lambda g, *_: (g, 0, 0),
                                         memory_space=pltpu.VMEM),
                        ],
                        out_specs=pl.BlockSpec((1, ROWS, VEC),
                                               lambda g, *_: (g, 0, 0),
                                               memory_space=pltpu.VMEM),
                    )
                    return pl.pallas_call(
                        kernel,
                        grid_spec=grid_spec,
                        out_shape=jax.ShapeDtypeStruct((GB, ROWS, VEC),
                                                       jnp.float32),
                        interpret=INTERP,
                    )(ntr, b, st, meta).sum()

            b = jnp.full((GB, RB, VEC), 7, jnp.int32)
            meta = np.zeros((GB, NMR, VEC), np.int32)
            for s in range(NSUB):
                meta[:, NSUB + s:8 * 64:8, :] = (127 << 7) | (s << 14) | _VALID
            st = np.zeros((GB, 8, VEC), np.int32)
            return f, (b, jnp.asarray(meta), jnp.asarray(st))

        return {"trips": (16, 48), "make": make}

    return build()


PROBES["v1i_static"] = lambda: _mk("static")
PROBES["v1i_dyn"] = lambda: _mk("dyn")
PROBES["v1i_dyn_pad"] = lambda: _mk("dyn_pad")


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
