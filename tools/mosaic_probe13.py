"""Probe 13: bridge from the proven v1 flat kernel body toward v2.

probe11's full v2 body fails to compile even with f32 rolls, while
probe12 shows every v2 construct passing in isolation.  Here each
variant starts from the EXACT v1 body (decode_flat._flat_kernel, known
to compile and run in production) and changes ONE thing:

  v15_interleave   per-subpanel (128,128) ops as v1, but the 7 barrel
                   steps are round-robined across the 4 subpanels so
                   the roll chains overlap (same instruction count,
                   shorter critical path; no new constructs).
  v15_wideroll     4 gathers -> concat (512,128) f32 -> one 7-step
                   barrel -> split back -> v1's per-subpanel composes.
  v15_widecompose  v1 per-subpanel rolls -> concat masked panels ->
                   single (128,512)@(512,128) compose + one RMW.

Run: python tools/mosaic_probe13.py [names...]
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
W = int(os.environ.get("PROBE_W", "128"))
INTERP = os.environ.get("PROBE_INTERPRET") == "1"
RB = 728
ROWS = 520
GB = 32
NSUB = 4
_VALID = 1 << 21

PROBES = {}


def fetch(x):
    return np.asarray(x)


def _unpack(mrow_a, mrow_b, lane_p):
    a_col = jnp.transpose(mrow_a, (1, 0))
    b_col = jnp.transpose(mrow_b, (1, 0))
    qrel = a_col & 127
    rot = jax.lax.shift_right_logical(a_col, 7) & 127
    dphi = b_col & 127
    lenm1 = jax.lax.shift_right_logical(b_col, 7) & 127
    valid = (b_col & _VALID) != 0
    drel = jax.lax.shift_right_logical(mrow_b, 14) & 127
    mask = valid & (lane_p >= dphi) & (lane_p - dphi <= lenm1)
    return qrel, rot, mask, drel


def _gather(qrel, rot, bwin_bf, lane_p):
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (VEC, W), 1)
    rs0 = (lane_w == qrel).astype(jnp.bfloat16)
    rs1 = (lane_w == qrel + 1).astype(jnp.bfloat16)
    u0 = jax.lax.dot_general(rs0, bwin_bf, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    u1 = jax.lax.dot_general(rs1, bwin_bf, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    phi = (VEC - rot) & (VEC - 1)
    return jnp.where(lane_p >= phi, u0, u1)


def _mk(variant):
    def build():
        def make(nt):
            def kernel(b_ref, meta_ref, st_ref, out_ref):
                lane_p = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 1)
                row_iota = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 0)
                row_iota_w = jax.lax.broadcasted_iota(
                    jnp.int32, (VEC, NSUB * VEC), 0)
                out_ref[0, :, :] = jnp.zeros((ROWS, VEC), jnp.float32)

                def body(i, c):
                    srow = st_ref[0, pl.ds((i >> 5) & 7, 1), :]
                    sr = pltpu.roll(
                        srow, shift=(VEC - ((i & 31) * NSUB)) & (VEC - 1),
                        axis=1)
                    mrow = meta_ref[0, pl.ds(8 * (i & 63), 8), :]
                    vs, rots, masks, drels, Ds = [], [], [], [], []
                    for s in range(NSUB):
                        w = sr[0, s]
                        S = w & 1023
                        Ds.append(jax.lax.shift_right_logical(w, 10) * VEC)
                        bwin = b_ref[0, pl.ds(S, W), :].astype(jnp.bfloat16)
                        qrel, rot, mask, drel = _unpack(
                            mrow[s:s + 1, :], mrow[NSUB + s:NSUB + s + 1, :],
                            lane_p)
                        vs.append(_gather(qrel, rot, bwin, lane_p))
                        rots.append(rot)
                        masks.append(mask)
                        drels.append(drel)

                    if variant == "interleave":
                        for k in range(7):
                            for s in range(NSUB):
                                bit = (jax.lax.shift_right_logical(
                                    rots[s], k) & 1) == 1
                                vs[s] = jnp.where(
                                    bit, pltpu.roll(vs[s], shift=1 << k,
                                                    axis=1), vs[s])
                        for s in range(NSUB):
                            mk = jnp.where(masks[s], vs[s], 0.0)
                            ds_t = (row_iota == drels[s]).astype(jnp.bfloat16)
                            contrib = jax.lax.dot_general(
                                ds_t, mk.astype(jnp.bfloat16),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                            out_ref[0, pl.ds(Ds[s], VEC), :] += contrib
                    elif variant == "wideroll":
                        vcat = jnp.concatenate(vs, axis=0)
                        rcat = jnp.concatenate(rots, axis=0)
                        for k in range(7):
                            bit = (jax.lax.shift_right_logical(rcat, k) & 1) == 1
                            vcat = jnp.where(
                                bit, pltpu.roll(vcat, shift=1 << k, axis=1),
                                vcat)
                        for s in range(NSUB):
                            v = vcat[s * VEC:(s + 1) * VEC, :]
                            mk = jnp.where(masks[s], v, 0.0)
                            ds_t = (row_iota == drels[s]).astype(jnp.bfloat16)
                            contrib = jax.lax.dot_general(
                                ds_t, mk.astype(jnp.bfloat16),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                            out_ref[0, pl.ds(Ds[s], VEC), :] += contrib
                    else:  # widecompose
                        mks = []
                        for s in range(NSUB):
                            v = vs[s]
                            for k in range(7):
                                bit = (jax.lax.shift_right_logical(
                                    rots[s], k) & 1) == 1
                                v = jnp.where(
                                    bit, pltpu.roll(v, shift=1 << k, axis=1),
                                    v)
                            mks.append(jnp.where(masks[s], v, 0.0)
                                       .astype(jnp.bfloat16))
                        mcat = jnp.concatenate(mks, axis=0)
                        dcat = jnp.concatenate(drels, axis=1)
                        ds_t = (row_iota_w == dcat).astype(jnp.bfloat16)
                        contrib = jax.lax.dot_general(
                            ds_t, mcat, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        out_ref[0, pl.ds(Ds[0], VEC), :] += contrib
                    return c

                jax.lax.fori_loop(0, nt, body, jnp.int32(0))

            def f(b, meta, st):
                return pl.pallas_call(
                    kernel,
                    grid=(GB,),
                    in_specs=[
                        pl.BlockSpec((1, RB, VEC), lambda g: (g, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 8 * 64, VEC), lambda g: (g, 0, 0),
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
            meta = np.zeros((GB, 8 * 64, VEC), np.int32)
            for s in range(NSUB):
                meta[:, NSUB + s::8, :] = (127 << 7) | (s << 14) | _VALID
            st = np.zeros((GB, 8, VEC), np.int32)
            return f, (b, jnp.asarray(meta), jnp.asarray(st))

        return {"trips": (64, 192), "make": make}

    return build()


PROBES["v15_interleave"] = lambda: _mk("interleave")
PROBES["v15_wideroll"] = lambda: _mk("wideroll")
PROBES["v15_widecompose"] = lambda: _mk("widecompose")
PROBES["v1_base"] = lambda: _mk("v1ish_interleave_none")  # = widecompose? no


def _mk_v1():
    """Exact v1 ordering: per-subpanel gather -> barrel -> compose."""
    def build():
        def make(nt):
            def kernel(b_ref, meta_ref, st_ref, out_ref):
                lane_p = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 1)
                row_iota = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 0)
                out_ref[0, :, :] = jnp.zeros((ROWS, VEC), jnp.float32)

                def body(i, c):
                    srow = st_ref[0, pl.ds((i >> 5) & 7, 1), :]
                    sr = pltpu.roll(
                        srow, shift=(VEC - ((i & 31) * NSUB)) & (VEC - 1),
                        axis=1)
                    mrow = meta_ref[0, pl.ds(8 * (i & 63), 8), :]
                    for s in range(NSUB):
                        w = sr[0, s]
                        S = w & 1023
                        D = jax.lax.shift_right_logical(w, 10) * VEC
                        bwin = b_ref[0, pl.ds(S, W), :].astype(jnp.bfloat16)
                        qrel, rot, mask, drel = _unpack(
                            mrow[s:s + 1, :], mrow[NSUB + s:NSUB + s + 1, :],
                            lane_p)
                        v = _gather(qrel, rot, bwin, lane_p)
                        for k in range(7):
                            bit = (jax.lax.shift_right_logical(rot, k) & 1) == 1
                            v = jnp.where(
                                bit, pltpu.roll(v, shift=1 << k, axis=1), v)
                        mk = jnp.where(mask, v, 0.0)
                        ds_t = (row_iota == drel).astype(jnp.bfloat16)
                        contrib = jax.lax.dot_general(
                            ds_t, mk.astype(jnp.bfloat16),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        out_ref[0, pl.ds(D, VEC), :] += contrib
                    return c

                jax.lax.fori_loop(0, nt, body, jnp.int32(0))

            def f(b, meta, st):
                return pl.pallas_call(
                    kernel,
                    grid=(GB,),
                    in_specs=[
                        pl.BlockSpec((1, RB, VEC), lambda g: (g, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 8 * 64, VEC), lambda g: (g, 0, 0),
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
            meta = np.zeros((GB, 8 * 64, VEC), np.int32)
            for s in range(NSUB):
                meta[:, NSUB + s::8, :] = (127 << 7) | (s << 14) | _VALID
            st = np.zeros((GB, 8, VEC), np.int32)
            return f, (b, jnp.asarray(meta), jnp.asarray(st))

        return {"trips": (64, 192), "make": make}

    return build()


PROBES["v1_base"] = _mk_v1


def main():
    names = sys.argv[1:] or ["v1_base", "v15_interleave", "v15_wideroll",
                             "v15_widecompose"]
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
