"""Probe 7: the flat-plan panel-gather decode pipeline.

Validates that every construct of the planned `decode_flat` kernel
compiles on the remote Mosaic service and measures the per-panel cost
at realistic shapes.  The kernel design (docs/performance.md round-2
notes): host resolves every output byte to a comp/pattern source (zero
inter-piece dependencies), device executes PANEL pieces per loop trip:

    meta slice [2,128] -> transpose -> unpack columns
    RS one-hot [PANEL, W] (iota == rowq_rel col), bf16
    Bwin  = B[ds(S, W)], Bwin2 = B[ds(S+1, W)]   (dyn sublane slices)
    U0 = RS @ Bwin, U1 = RS @ Bwin2              (MXU, bf16 -> f32)
    M  = where(j >= phi, U0, U1)                 (pair merge, no roll)
    v  = barrel_roll(M, rot)                     (7 static rolls, masked)
    masked = where(dst lane mask, v, 0) . bf16
    DS_T one-hot [ROWS, PANEL] (iota == dstrow row), bf16
    C  = DS_T @ masked                           (MXU)
    out += C                                     (full-block accumulate)

Run:  python tools/mosaic_probe7.py [probe ...]
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


def fetch(x):
    return np.asarray(x)


PROBES = {}


def probe(fn):
    PROBES[fn.__name__] = fn
    return fn


def run_probe(name, fn):
    try:
        t0 = time.time()
        f, args, check, work = fn()
        jf = jax.jit(f)
        out = fetch(jf(*args))
        t_compile = time.time() - t0
        if check is not None and not check(out):
            print(f"PROBE {name} WRONG compile={t_compile:.1f}s", flush=True)
            return
        best = 1e9
        for _ in range(5):
            t0 = time.time()
            fetch(jf(*args))
            best = min(best, time.time() - t0)
        per = f" per_unit={best / work * 1e9:.1f}ns" if work else ""
        print(
            f"PROBE {name} PASS compile={t_compile:.1f}s run={best * 1e3:.1f}ms{per}",
            flush=True,
        )
    except Exception as e:  # noqa
        head = " | ".join(str(e).splitlines()[:3])[:300]
        print(f"PROBE {name} FAIL {type(e).__name__}: {head}", flush=True)


# ------------------------------------------------------------ pieces


@probe
def transpose_2x128():
    # meta slice transpose: (2,128) -> (128,2), then column slices
    N = 4096

    def kernel(m_ref, o_ref):
        def body(i, acc):
            row = m_ref[pl.ds(2 * (i & 7), 2), :]
            col = jnp.transpose(row, (1, 0))  # (128, 2)
            a = col[:, 0:1]
            b = col[:, 1:2]
            return acc + jnp.sum(a) + jnp.sum(b)

        acc = jax.lax.fori_loop(0, N, body, jnp.int32(0))
        o_ref[0, 0] = acc

    def f(m):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(m)

    m = jnp.ones((16, VEC), jnp.int32)
    return f, (m,), lambda o: o[0, 0] == N * 256, N


@probe
def onehot_build_matmul():
    # RS [PANEL, W] one-hot from a column + matmul against a dyn window
    PANEL, W, RB = 128, 32, 592
    N = 2048

    def kernel(b_ref, q_ref, o_ref):
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (PANEL, W), 1)
        qcol = q_ref[:, 0:1]

        def body(i, acc):
            rs = (lane_w == qcol).astype(jnp.bfloat16)
            bwin = b_ref[pl.ds((i & 15) * 8, W), :]
            u0 = jax.lax.dot_general(
                rs, bwin, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc + u0[0, 0].astype(jnp.int32)

        acc = jax.lax.fori_loop(0, N, body, jnp.int32(0))
        o_ref[0, 0] = acc

    def f(b, q):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(b, q)

    b = jnp.ones((RB, VEC), jnp.bfloat16) * 3
    q = jnp.zeros((PANEL, VEC), jnp.int32)  # every piece selects window row 0
    return f, (b, q), lambda o: o[0, 0] == N * 3, N


@probe
def barrel_roll_vec():
    # per-row variable rotate: 7 static rolls gated by rot bits (columns)
    PANEL = 128
    N = 2048

    def kernel(x_ref, r_ref, o_ref):
        rot = r_ref[:, 0:1]

        def body(i, acc):
            v = x_ref[:, :] + acc  # new value each trip; keeps chain honest
            for k in range(7):
                bit = (jax.lax.shift_right_logical(rot, k) & 1) == 1
                v = jnp.where(bit, pltpu.roll(v, shift=1 << k, axis=1), v)
            return acc + (v[0, 1] & 7)

        acc = jax.lax.fori_loop(0, N, body, jnp.int32(0))
        o_ref[0, 0] = acc

    def f(x, r):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(x, r)

    x = jnp.broadcast_to(jnp.arange(VEC, dtype=jnp.int32)[None, :], (PANEL, VEC))
    r = jnp.full((PANEL, VEC), 1, jnp.int32)  # rotate by 1: lane1 reads lane0
    return f, (x, r), None, N


@probe
def compose_full_rows():
    # DS_T [ROWS, PANEL] one-hot from a lane-major row + compose matmul
    PANEL, ROWS = 128, 520
    N = 1024

    def kernel(m_ref, d_ref, acc_ref):
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, PANEL), 0)
        drow = d_ref[0:1, :]  # (1, PANEL) lane-major dstrow

        def body(i, c):
            ds_t = (row_iota == drow).astype(jnp.bfloat16)
            contrib = jax.lax.dot_general(
                ds_t, m_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[:, :] += contrib
            return c

        jax.lax.fori_loop(0, N, body, jnp.int32(0))

    def f(m, d):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, VEC), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(m, d)

    m = jnp.ones((PANEL, VEC), jnp.bfloat16)
    d = jnp.zeros((1, PANEL), jnp.int32)
    return f, (m, d), lambda o: abs(o[0, 0] - N * PANEL) < 1, N


@probe
def full_panel_body():
    # The whole per-panel pipeline, end to end, dummy-but-realistic meta.
    PANEL, W, RB, ROWS = 128, 32, 592, 520
    NP = 128  # panels per call

    def kernel(s_ref, b_ref, meta_ref, out_ref):
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (PANEL, W), 1)
        lane_p = jax.lax.broadcasted_iota(jnp.int32, (PANEL, VEC), 1)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, PANEL), 0)

        def body(i, c):
            s = s_ref[i]
            mrow = meta_ref[pl.ds(2 * i, 2), :]  # (2,128) A;B packed
            mcol = jnp.transpose(mrow, (1, 0))  # (128,2)
            a_col = mcol[:, 0:1]
            b_col = mcol[:, 1:2]
            qrel = a_col & 63
            rot = jax.lax.shift_right_logical(a_col, 6) & 127
            thresh = jnp.where(rot == 0, 128, rot)
            dphi = b_col & 127
            lenm1 = jax.lax.shift_right_logical(b_col, 7) & 127
            drow_r = meta_ref[pl.ds(2 * i + 1, 1), :]  # lane-major B word
            drow = jax.lax.shift_right_logical(drow_r, 14) & 1023

            rs = (lane_w == qrel).astype(jnp.bfloat16)
            bwin = b_ref[pl.ds(s, W), :]
            bwin2 = b_ref[pl.ds(s + 1, W), :]
            u0 = jax.lax.dot_general(
                rs, bwin, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            u1 = jax.lax.dot_general(
                rs, bwin2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            phi = (128 - thresh) & 127
            m = jnp.where(lane_p >= phi, u0, u1)
            v = m
            for k in range(7):
                bit = (jax.lax.shift_right_logical(rot, k) & 1) == 1
                v = jnp.where(bit, pltpu.roll(v, shift=1 << k, axis=1), v)
            mask = (lane_p >= dphi) & (lane_p - dphi <= lenm1)
            masked = jnp.where(mask, v, 0.0).astype(jnp.bfloat16)
            ds_t = (row_iota == drow).astype(jnp.bfloat16)
            contrib = jax.lax.dot_general(
                ds_t, masked, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[:, :] += contrib
            return c

        jax.lax.fori_loop(0, NP, body, jnp.int32(0))

    def f(s, b, meta):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ROWS, VEC), jnp.float32),
        )(s, b, meta)

    s = jnp.zeros((NP,), jnp.int32)
    b = jnp.ones((RB, VEC), jnp.bfloat16) * 7
    # meta: qrel=0, rot=0, dphi=0, lenm1=127, drow=0 -> every piece writes
    # row 0 with value 7; out[0,:] == NP*PANEL*7
    a_word = 0
    b_word = 127 << 7
    meta = np.zeros((2 * NP, VEC), np.int32)
    meta[0::2, :] = a_word
    meta[1::2, :] = b_word
    meta = jnp.asarray(meta)
    return f, (s, b, meta), lambda o: abs(o[0, 0] - NP * PANEL * 7) < 1, NP


@probe
def full_panel_body_x2():
    # two independent blocks interleaved per trip (latency hiding probe)
    PANEL, W, RB, ROWS = 128, 32, 592, 520
    NP = 128

    def one(i, j, s_ref, b_ref, meta_ref, out_ref, consts):
        lane_w, lane_p, row_iota = consts
        s = s_ref[i]
        mrow = meta_ref[j, pl.ds(2 * i, 2), :]
        mcol = jnp.transpose(mrow, (1, 0))
        a_col = mcol[:, 0:1]
        b_col = mcol[:, 1:2]
        qrel = a_col & 63
        rot = jax.lax.shift_right_logical(a_col, 6) & 127
        thresh = jnp.where(rot == 0, 128, rot)
        dphi = b_col & 127
        lenm1 = jax.lax.shift_right_logical(b_col, 7) & 127
        drow_r = meta_ref[j, pl.ds(2 * i + 1, 1), :]
        drow = jax.lax.shift_right_logical(drow_r, 14) & 1023
        rs = (lane_w == qrel).astype(jnp.bfloat16)
        bwin = b_ref[j, pl.ds(s, W), :]
        bwin2 = b_ref[j, pl.ds(s + 1, W), :]
        u0 = jax.lax.dot_general(rs, bwin, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        u1 = jax.lax.dot_general(rs, bwin2, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        phi = (128 - thresh) & 127
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
        out_ref[j, :, :] += contrib

    def kernel(s_ref, b_ref, meta_ref, out_ref):
        consts = (
            jax.lax.broadcasted_iota(jnp.int32, (PANEL, W), 1),
            jax.lax.broadcasted_iota(jnp.int32, (PANEL, VEC), 1),
            jax.lax.broadcasted_iota(jnp.int32, (ROWS, PANEL), 0),
        )

        def body(i, c):
            one(i, 0, s_ref, b_ref, meta_ref, out_ref, consts)
            one(i, 1, s_ref, b_ref, meta_ref, out_ref, consts)
            return c

        jax.lax.fori_loop(0, NP, body, jnp.int32(0))

    def f(s, b, meta):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((2, ROWS, VEC), jnp.float32),
        )(s, b, meta)

    s = jnp.zeros((NP,), jnp.int32)
    b = jnp.ones((2, RB, VEC), jnp.bfloat16) * 7
    meta = np.zeros((2, 2 * NP, VEC), np.int32)
    meta[:, 1::2, :] = 127 << 7
    meta = jnp.asarray(meta)
    return f, (s, b, meta), lambda o: abs(o[0, 0, 0] - NP * PANEL * 7) < 1, 2 * NP


@probe
def full_panel_body_p256():
    # PANEL=256 variant: does doubling pieces/panel approach 2x?
    PANEL, W, RB, ROWS = 256, 32, 592, 520
    NP = 64

    def kernel(s_ref, b_ref, meta_ref, out_ref):
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (PANEL, W), 1)
        lane_p = jax.lax.broadcasted_iota(jnp.int32, (PANEL, VEC), 1)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, PANEL), 0)

        def body(i, c):
            s = s_ref[i]
            mrow = meta_ref[pl.ds(4 * i, 2), :]
            mrow_hi = meta_ref[pl.ds(4 * i + 2, 2), :]
            mcol = jnp.concatenate(
                [jnp.transpose(mrow, (1, 0)), jnp.transpose(mrow_hi, (1, 0))],
                axis=0,
            )  # (256, 2)
            a_col = mcol[:, 0:1]
            b_col = mcol[:, 1:2]
            qrel = a_col & 63
            rot = jax.lax.shift_right_logical(a_col, 6) & 127
            thresh = jnp.where(rot == 0, 128, rot)
            dphi = b_col & 127
            lenm1 = jax.lax.shift_right_logical(b_col, 7) & 127
            drow_r = jnp.concatenate(
                [meta_ref[pl.ds(4 * i + 1, 1), :], meta_ref[pl.ds(4 * i + 3, 1), :]],
                axis=1,
            )  # (1, 256)
            drow = jax.lax.shift_right_logical(drow_r, 14) & 1023
            rs = (lane_w == qrel).astype(jnp.bfloat16)
            bwin = b_ref[pl.ds(s, W), :]
            bwin2 = b_ref[pl.ds(s + 1, W), :]
            u0 = jax.lax.dot_general(rs, bwin, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            u1 = jax.lax.dot_general(rs, bwin2, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            phi = (128 - thresh) & 127
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
            out_ref[:, :] += contrib
            return c

        jax.lax.fori_loop(0, NP, body, jnp.int32(0))

    def f(s, b, meta):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ROWS, VEC), jnp.float32),
        )(s, b, meta)

    s = jnp.zeros((NP,), jnp.int32)
    b = jnp.ones((RB, VEC), jnp.bfloat16) * 7
    meta = np.zeros((4 * NP, VEC), np.int32)
    meta[1::2, :] = 127 << 7
    meta = jnp.asarray(meta)
    return f, (s, b, meta), lambda o: abs(o[0, 0] - NP * PANEL * 7) < 1, NP


def main():
    names = sys.argv[1:] or list(PROBES)
    print(f"devices: {jax.devices()}", flush=True)
    for n in names:
        run_probe(n, PROBES[n])
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
