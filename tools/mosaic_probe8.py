"""Probe 8: bisect the full_panel_body compile failure from probe 7.

Components all compile standalone; the combined body 500s.  Candidates:
  (a) dynamic-index SMEM scalar read  s_ref[i]  (i = fori_loop var)
  (b) BlockSpec(memory_space=...) without shapes under
      PrefetchScalarGridSpec
  (c) some op interaction

fp1: full pipeline, wave-kernel-style specs, NO scalar prefetch —
     panel starts live in a VMEM row, fetched by dyn-roll + lane-0
     extract (the wave kernel's proven pattern).
fp2: fp1 + scalar prefetch present but indexed only by program_id.
fp3: fp1 with starts via s_ref[i] (dynamic SMEM index) — isolates (a).

Run: python tools/mosaic_probe8.py [probe ...]
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


def _panel_pipeline(i, s, b_ref, meta_ref, out_ref, consts):
    lane_w, lane_p, row_iota = consts
    mrow = meta_ref[0, pl.ds(2 * i, 2), :]
    mcol = jnp.transpose(mrow, (1, 0))
    a_col = mcol[:, 0:1]
    b_col = mcol[:, 1:2]
    qrel = a_col & 63
    rot = jax.lax.shift_right_logical(a_col, 6) & 127
    dphi = b_col & 127
    lenm1 = jax.lax.shift_right_logical(b_col, 7) & 127
    drow = jax.lax.shift_right_logical(mrow[1:2, :], 14) & 1023
    rs = (lane_w == qrel).astype(jnp.bfloat16)
    bwin = b_ref[0, pl.ds(s, W), :]
    bwin2 = b_ref[0, pl.ds(s + 1, W), :]
    u0 = jax.lax.dot_general(rs, bwin, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    u1 = jax.lax.dot_general(rs, bwin2, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    phi = (VEC - rot) & (VEC - 1)
    m = jnp.where(lane_p >= phi, u0, u1)
    v = m
    for k in range(7):
        bit = (jax.lax.shift_right_logical(rot, k) & 1) == 1
        v = jnp.where(bit, pltpu.roll(v, shift=1 << k, axis=1), v)
    mask = (lane_p >= dphi) & (lane_p - dphi <= lenm1)
    masked = jnp.where(mask, v, 0.0).astype(jnp.bfloat16)
    ds_t = (row_iota == drow).astype(jnp.bfloat16)
    contrib = jax.lax.dot_general(ds_t, masked, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    out_ref[0, :, :] += contrib


def _consts():
    return (
        jax.lax.broadcasted_iota(jnp.int32, (PANEL, W), 1),
        jax.lax.broadcasted_iota(jnp.int32, (PANEL, VEC), 1),
        jax.lax.broadcasted_iota(jnp.int32, (ROWS, PANEL), 0),
    )


def _mk_inputs():
    b = jnp.ones((1, RB, VEC), jnp.bfloat16) * 7
    meta = np.zeros((1, 2 * NP, VEC), np.int32)
    meta[0, 1::2, :] = 127 << 7
    starts = np.zeros((1, 8, VEC), np.int32)  # VMEM row form, all zeros
    return b, jnp.asarray(meta), jnp.asarray(starts)


@probe
def fp1_vmem_starts():
    def kernel(b_ref, meta_ref, st_ref, out_ref):
        consts = _consts()
        out_ref[0, :, :] = jnp.zeros((ROWS, VEC), jnp.float32)

        def body(i, c):
            srow = st_ref[0, pl.ds(i >> 7, 1), :]
            sr = pltpu.roll(srow, shift=(VEC - (i & 127)) & (VEC - 1), axis=1)
            s = sr[0, 0]
            _panel_pipeline(i, s, b_ref, meta_ref, out_ref, consts)
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

    b, meta, st = _mk_inputs()
    return f, (b, meta, st), lambda o: abs(o[0, 0, 0] - NP * PANEL * 7) < 1, NP


@probe
def fp2_prefetch_pid():
    def kernel(n_ref, b_ref, meta_ref, st_ref, out_ref):
        g = pl.program_id(0)
        n = n_ref[g]
        consts = _consts()
        out_ref[0, :, :] = jnp.zeros((ROWS, VEC), jnp.float32)

        def body(i, c):
            srow = st_ref[0, pl.ds(i >> 7, 1), :]
            sr = pltpu.roll(srow, shift=(VEC - (i & 127)) & (VEC - 1), axis=1)
            s = sr[0, 0]
            _panel_pipeline(i, s, b_ref, meta_ref, out_ref, consts)
            return c

        jax.lax.fori_loop(0, n, body, jnp.int32(0))

    def f(n, b, meta, st):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1, RB, VEC), lambda g, *_: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2 * NP, VEC), lambda g, *_: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, VEC), lambda g, *_: (g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, ROWS, VEC), lambda g, *_: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, ROWS, VEC), jnp.float32),
        )(n, b, meta, st)

    b, meta, st = _mk_inputs()
    n = jnp.full((1,), NP, jnp.int32)
    return f, (n, b, meta, st), lambda o: abs(o[0, 0, 0] - NP * PANEL * 7) < 1, NP


@probe
def fp3_dyn_smem_index():
    def kernel(s_ref, b_ref, meta_ref, out_ref):
        consts = _consts()
        out_ref[0, :, :] = jnp.zeros((ROWS, VEC), jnp.float32)

        def body(i, c):
            s = s_ref[i]  # dynamic SMEM scalar index — suspected blocker
            _panel_pipeline(i, s, b_ref, meta_ref, out_ref, consts)
            return c

        jax.lax.fori_loop(0, NP, body, jnp.int32(0))

    def f(s, b, meta):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1, RB, VEC), lambda g, *_: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2 * NP, VEC), lambda g, *_: (g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, ROWS, VEC), lambda g, *_: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, ROWS, VEC), jnp.float32),
        )(s, b, meta)

    b, meta, _ = _mk_inputs()
    s = jnp.zeros((NP,), jnp.int32)
    return f, (s, b, meta), lambda o: abs(o[0, 0, 0] - NP * PANEL * 7) < 1, NP


def main():
    names = sys.argv[1:] or list(PROBES)
    print(f"devices: {jax.devices()}", flush=True)
    for n in names:
        run_probe(n, PROBES[n])
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
