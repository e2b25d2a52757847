"""Round-4 probe: flat-kernel v3 candidate bodies as MINIMAL EDITS of
the production kernel, on REAL staged plans, verified bit-exact.

Variants (aligned-trip body only; the rot body keeps the windowed
uniform-roll formulation, reading through the same B ref):
  base       : production kernel as-is (i32 B, windowed gathers)
  fullb_bf16 : aligned body gathers with ONE full-B one-hot bf16 matmul
               (q_full = S + qrel from the prefetched word; no window
               slice) — tests the in-situ wide one-hot that r2 rejected
  fullb_i8   : same but B is int8 (bitcast of the staged u8), one-hot
               int8, i32 accumulation, compose in bf16 after cast

Run: python tools/mosaic_probe25.py        (env NB=256 for timing runs)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snappy_tpu.utils.jaxcache import setup_compilation_cache

setup_compilation_cache()

from snappy_tpu import native
from snappy_tpu.bench.corpus import make_corpus
from snappy_tpu.kernels.decode_flat import (
    NSUB, TRIP_CAP, VEC, W_ROWS, _VALID, _subpanel_gather, rows_b_for,
)
from snappy_tpu.runtime.device_codec import _flat_trim
from snappy_tpu.spec.format import read_uvarint

OUT_ROWS = 520
GROUP = 4


def _kernel(scal_ref, b_ref, meta_ref, out_ref, *, out_rows, group,
            trip_cap, variant):
    blk = pl.program_id(0)
    stride = 1 + NSUB * trip_cap
    lane_p = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 0)
    rb = b_ref.shape[1]
    i8 = variant == "fullb_i8"

    for g in range(group):
        sbase = (blk * group + g) * stride
        word = scal_ref[sbase]
        n = word & 0xFFFF
        n_rot = n - (jax.lax.shift_right_logical(word, 16) & 0xFFFF)
        out_ref[g, :, :] = jnp.zeros((out_rows, VEC), jnp.float32)
        if variant != "base":
            if i8:
                bfull = b_ref[g]                      # (rb,128) i8
            else:
                bfull = b_ref[g].astype(jnp.bfloat16)

        def rot_body(i, c, g=g, sbase=sbase):
            mrow = meta_ref[g, pl.ds(2 * NSUB * i, 2 * NSUB), :]
            vs, masks, drels, Ds = [], [], [], []
            for s in range(NSUB):
                w = scal_ref[sbase + 1 + i * NSUB + s]
                S = w & 1023
                Dq = jax.lax.shift_right_logical(w, 10) & 1023
                Dc = jnp.minimum(Dq, out_rows - VEC)
                Ds.append((Dc, Dq - Dc))
                rot_u = jax.lax.shift_right_logical(w, 20) & 127
                bwin = b_ref[g, pl.ds(S, W_ROWS), :]
                if i8:
                    bwin = bwin.astype(jnp.int32)
                v, mask, drel = _subpanel_gather(
                    mrow[s:s + 1, :], mrow[NSUB + s:NSUB + s + 1, :],
                    bwin, lane_p, rot_u=rot_u)
                vs.append(v); masks.append(mask); drels.append(drel)
            for s in range(NSUB):
                mk = jnp.where(masks[s], vs[s], 0.0)
                Dc, dadj = Ds[s]
                ds_t = (row_iota == drels[s] + dadj).astype(jnp.bfloat16)
                contrib = jax.lax.dot_general(
                    ds_t, mk.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out_ref[g, pl.ds(Dc, VEC), :] += contrib
            return c

        def ali_body_base(i, c, g=g, sbase=sbase):
            return rot_body_aligned_windowed(i, c, g, sbase)

        def rot_body_aligned_windowed(i, c, g, sbase):
            mrow = meta_ref[g, pl.ds(2 * NSUB * i, 2 * NSUB), :]
            vs, masks, drels, Ds = [], [], [], []
            for s in range(NSUB):
                w = scal_ref[sbase + 1 + i * NSUB + s]
                S = w & 1023
                Dq = jax.lax.shift_right_logical(w, 10) & 1023
                Dc = jnp.minimum(Dq, out_rows - VEC)
                Ds.append((Dc, Dq - Dc))
                bwin = b_ref[g, pl.ds(S, W_ROWS), :]
                if i8:
                    bwin = bwin.astype(jnp.int32)
                v, mask, drel = _subpanel_gather(
                    mrow[s:s + 1, :], mrow[NSUB + s:NSUB + s + 1, :],
                    bwin, lane_p, aligned=True)
                vs.append(v); masks.append(mask); drels.append(drel)
            for s in range(NSUB):
                mk = jnp.where(masks[s], vs[s], 0.0)
                Dc, dadj = Ds[s]
                ds_t = (row_iota == drels[s] + dadj).astype(jnp.bfloat16)
                contrib = jax.lax.dot_general(
                    ds_t, mk.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out_ref[g, pl.ds(Dc, VEC), :] += contrib
            return c

        def ali_body_fullb(i, c, g=g, sbase=sbase):
            mrow = meta_ref[g, pl.ds(2 * NSUB * i, 2 * NSUB), :]
            vs, masks, drels, Ds = [], [], [], []
            for s in range(NSUB):
                w = scal_ref[sbase + 1 + i * NSUB + s]
                S = w & 1023
                Dq = jax.lax.shift_right_logical(w, 10) & 1023
                Dc = jnp.minimum(Dq, out_rows - VEC)
                Ds.append((Dc, Dq - Dc))
                a_col = jnp.transpose(mrow[s:s + 1, :], (1, 0))
                b_col = jnp.transpose(mrow[NSUB + s:NSUB + s + 1, :], (1, 0))
                qfull = (a_col & 127) + S                 # (128,1)
                dphi = b_col & 127
                lenm1 = jax.lax.shift_right_logical(b_col, 7) & 127
                valid = (b_col & _VALID) != 0
                drel = jax.lax.shift_right_logical(
                    mrow[NSUB + s:NSUB + s + 1, :], 14) & 127
                mask = valid & (lane_p >= dphi) & (lane_p - dphi <= lenm1)
                lane_w = jax.lax.broadcasted_iota(jnp.int32, (VEC, rb), 1)
                if i8:
                    sel = (lane_w == qfull).astype(jnp.int8)
                    v = jax.lax.dot_general(
                        sel, bfull, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                else:
                    sel = (lane_w == qfull).astype(jnp.bfloat16)
                    v = jax.lax.dot_general(
                        sel, bfull, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                vs.append(v); masks.append(mask); drels.append(drel)
            for s in range(NSUB):
                zero = jnp.int32(0) if i8 else jnp.float32(0)
                mk = jnp.where(masks[s], vs[s], zero)
                Dc, dadj = Ds[s]
                ds_t = (row_iota == drels[s] + dadj).astype(jnp.bfloat16)
                contrib = jax.lax.dot_general(
                    ds_t, mk.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out_ref[g, pl.ds(Dc, VEC), :] += contrib
            return c

        ali = ali_body_base if variant == "base" else ali_body_fullb
        jax.lax.fori_loop(0, n_rot, rot_body, jnp.int32(0))
        jax.lax.fori_loop(n_rot, n, ali, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("trip_cap", "variant", "rb"))
def run_kernel(scal, b, meta, *, trip_cap, variant, rb):
    B = b.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // GROUP,),
        in_specs=[
            pl.BlockSpec((GROUP, rb, VEC), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, meta.shape[1], VEC),
                         lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GROUP, OUT_ROWS, VEC),
                               lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, out_rows=OUT_ROWS, group=GROUP,
                          trip_cap=trip_cap, variant=variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, OUT_ROWS, VEC), jnp.float32),
    )(scal, b, meta)


def main():
    NB = int(os.environ.get("NB", "64"))
    BMAX, CMAX = 65536, 66560
    rb = rows_b_for(CMAX)
    data = b"".join(d for _, d in make_corpus(NB * BMAX + BMAX, seed=29))
    blocks = [data[i * BMAX:(i + 1) * BMAX] for i in range(NB)]
    elems = [native.compress(b) for b in blocks]
    hdrs = [read_uvarint(e, 0)[1] for e in elems]

    ecat = np.frombuffer(b"".join(elems), np.uint8)
    eoffs = np.cumsum([0] + [len(e) for e in elems][:-1]).astype(np.int64)
    elens = np.array([len(e) for e in elems], np.int64)
    hdrs64 = np.array(hdrs, np.int64)
    dstl64 = np.full(NB, BMAX, np.int64)
    rc64 = np.zeros(NB, np.int64)
    fmeta = np.empty((NB, 8 * TRIP_CAP, VEC), np.int32)
    fst = np.zeros((NB, 8, VEC), np.int32)
    b_u8 = np.empty((NB, rb * VEC), np.uint8)
    bad = native.stage_flat_dec_batch(ecat, eoffs, elens, hdrs64, dstl64,
                                      rb, fmeta, fst, b_u8, rc64)
    assert bad == 0
    ntr = rc64.astype(np.int32)
    t_cap, rb_u = _flat_trim(ntr, fst, rb, TRIP_CAP)
    rb_u = (rb_u + 127) & ~127
    print(f"{NB} blocks staged: trips<= {t_cap}, rb_u {rb_u}", flush=True)

    scal = np.concatenate(
        [ntr.reshape(NB, 1),
         fst.reshape(NB, 8 * VEC)[:, : NSUB * t_cap]], axis=1).reshape(-1)
    meta = np.ascontiguousarray(fmeta[:, : 8 * t_cap])
    b_trim = np.ascontiguousarray(
        b_u8[:, : rb_u * VEC]).reshape(NB, rb_u, VEC)

    scal_d = jax.device_put(jnp.asarray(scal.astype(np.int32)))
    meta_d = jax.device_put(jnp.asarray(meta))
    b32_d = jax.device_put(jnp.asarray(b_trim.astype(np.int32)))
    bi8_d = jax.device_put(jnp.asarray(b_trim.view(np.int8)))

    expect = np.stack([np.frombuffer(b, np.uint8).reshape(512, VEC)
                       for b in blocks])
    for variant, bd in (("base", b32_d), ("fullb_bf16", b32_d),
                        ("fullb_i8", bi8_d)):
        try:
            t0 = time.perf_counter()
            out = run_kernel(scal_d, bd, meta_d, trip_cap=t_cap,
                             variant=variant, rb=rb_u)
            o0 = np.asarray(out[:, :512].astype(jnp.uint8))
            dt0 = time.perf_counter() - t0
        except Exception as e:
            print(f"{variant}: FAILS {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        ok = (o0 == expect).all()
        best = 1e18
        for _ in range(4):
            t0 = time.perf_counter()
            out = run_kernel(scal_d, bd, meta_d, trip_cap=t_cap,
                             variant=variant, rb=rb_u)
            _ = np.asarray(out[0, 0, :1])
            best = min(best, time.perf_counter() - t0)
        print(f"{variant}: exact={ok} compile+first {dt0:.1f}s, best "
              f"{best*1e3:.2f} ms = {best/NB*1e6:.1f} us/block = "
              f"{NB*BMAX/1e9/best:.2f} GB/s", flush=True)


if __name__ == "__main__":
    main()
