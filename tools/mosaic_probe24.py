"""Round-4 probe: IN-SITU flat-kernel v3 candidate bodies, timed.

probe23 found i8 MXU one-hots (exact i32 accum) and 512-row one-hot
matmuls compile in isolation.  This probe times realistic trip bodies
inside the real kernel structure (grid over blocks, fori over trips,
scalar-prefetched plan words, RMW compose) to pick the v3 formulation:

  A current-aligned   : windowed i32->bf16 gather + bf16 compose (r3 body)
  B fullB-bf16        : full-B one-hot bf16 gather (no window slice)
  C fullB-i8          : full-B i8 one-hot gather -> i32, i8 compose -> i32
  D i8-cast-checks    : i32->i8, i8->bf16, i8 dyn sublane slice, i8 roll

Run: python tools/mosaic_probe24.py
"""
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

NB = int(os.environ.get("NB", "64"))     # blocks
RB = 768                                  # B rows (multiple of 32 for i8)
OUT_ROWS = 512
NSUB = 4
TRIPS = 2
VEC = 128
rng = np.random.default_rng(0)

# fake but realistic plan: every piece p of subpanel s reads full row
# q[p] and writes full row drel[p] of a 128-row dst window
q_np = rng.integers(0, RB, (NB, TRIPS * NSUB, VEC), dtype=np.int32)
dq_np = rng.integers(0, OUT_ROWS - VEC, (NB, TRIPS * NSUB), dtype=np.int32)
b_u8 = rng.integers(0, 256, (NB, RB, VEC), dtype=np.uint8)


def bench(name, build, *args):
    try:
        f = build()
        t0 = time.perf_counter()
        out = f(*args)
        v = np.asarray(out)[0]
        print(f"{name}: compiled+ran in {time.perf_counter()-t0:.1f}s "
              f"(smoke {v.ravel()[0]})", flush=True)
    except Exception as e:
        print(f"{name}: FAILS {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    best = 1e18
    for _ in range(4):
        t0 = time.perf_counter()
        out = f(*args)
        _ = np.asarray(out)[0, 0, :1]
        best = min(best, time.perf_counter() - t0)
    per_block = best / NB * 1e6
    gbs = NB * 65536 / 1e9 / best
    print(f"{name}: {best*1e3:.2f} ms total, {per_block:.1f} us/block, "
          f"{gbs:.2f} GB/s-equiv", flush=True)
    return best


# ---------------------------------------------------------------- A/B/C
def make_body(kind):
    def kern(q_ref, dq_ref, b_ref, out_ref):
        out_ref[...] = jnp.zeros((OUT_ROWS, VEC),
                                 jnp.float32 if kind != "i8" else jnp.int32)
        if kind == "i8":
            bi8 = b_ref[...]
        elif kind == "fullb":
            bw = b_ref[...].astype(jnp.bfloat16)

        def body(i, c):
            for s in range(NSUB):
                qrow = q_ref[pl.ds(i * NSUB + s, 1), :]     # (1,128)
                q_col = jnp.transpose(qrow, (1, 0))          # (128,1)
                Dq = dq_ref[i * NSUB + s]
                if kind == "win":
                    S = jnp.minimum(q_col[0, 0], RB - 128)  # fake window
                    bwin = b_ref[pl.ds(0, 128), :].astype(jnp.bfloat16)
                    lane_w = jax.lax.broadcasted_iota(
                        jnp.int32, (VEC, 128), 1)
                    sel = (lane_w == (q_col & 127)).astype(jnp.bfloat16)
                    v = jax.lax.dot_general(
                        sel, bwin, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                elif kind == "fullb":
                    lane_w = jax.lax.broadcasted_iota(
                        jnp.int32, (VEC, RB), 1)
                    sel = (lane_w == q_col).astype(jnp.bfloat16)
                    v = jax.lax.dot_general(
                        sel, bw, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:  # i8
                    lane_w = jax.lax.broadcasted_iota(
                        jnp.int32, (VEC, RB), 1)
                    sel = (lane_w == q_col).astype(jnp.int8)
                    v = jax.lax.dot_general(
                        sel, bi8, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                # compose into dst window at Dq: one-hot [128,128]
                row_io = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 0)
                drel = jax.lax.broadcasted_iota(jnp.int32, (1, VEC), 1)
                if kind == "i8":
                    ds_t = (row_io == drel).astype(jnp.int8)
                    contrib = jax.lax.dot_general(
                        ds_t, v.astype(jnp.int8),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                else:
                    ds_t = (row_io == drel).astype(jnp.bfloat16)
                    contrib = jax.lax.dot_general(
                        ds_t, v.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                out_ref[pl.ds(Dq, VEC), :] += contrib
            return c

        jax.lax.fori_loop(0, TRIPS, body, jnp.int32(0))

    dtype = jnp.int8 if kind == "i8" else jnp.int32
    odtype = jnp.int32 if kind == "i8" else jnp.float32

    def build():
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, TRIPS * NSUB, VEC), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, RB, VEC), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, OUT_ROWS, VEC), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        )

        def kern3(q_ref, dq_ref, b_ref, out_ref):
            kern(q_ref.at[0], dq_ref.at[pl.program_id(0)], b_ref.at[0],
                 out_ref.at[0])

        return jax.jit(pl.pallas_call(
            kern3, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NB, OUT_ROWS, VEC), odtype)))

    return build, dtype


qd = jax.device_put(jnp.asarray(q_np))
dqd = jax.device_put(jnp.asarray(dq_np.reshape(NB, TRIPS * NSUB)))
b32 = jax.device_put(jnp.asarray(b_u8.astype(np.int32)))
bi8 = jax.device_put(jnp.asarray(b_u8.view(np.int8)))

for kind in ("win", "fullb", "i8"):
    build, dtype = make_body(kind)
    bench(f"body-{kind}", build, qd, dqd, bi8 if kind == "i8" else b32)


# ---------------------------------------------------------------- D casts
def cast_probe(name, kern, ins, oshape, odtype):
    try:
        f = jax.jit(pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct(oshape, odtype)))
        out = np.asarray(f(*ins))
        print(f"{name}: COMPILES (smoke {out.ravel()[0]})", flush=True)
    except Exception as e:
        print(f"{name}: FAILS {type(e).__name__}: {str(e)[:140]}", flush=True)


x32 = jnp.arange(32 * 128, dtype=jnp.int32).reshape(32, 128) % 256
cast_probe("i32->i8 cast",
           lambda x_ref, o_ref: o_ref.__setitem__(
               ..., x_ref[...].astype(jnp.int8)),
           (x32,), (32, 128), jnp.int8)
xi8 = (jnp.arange(32 * 128, dtype=jnp.int32) % 100).astype(jnp.int8
                                                           ).reshape(32, 128)
cast_probe("i8->bf16 cast",
           lambda x_ref, o_ref: o_ref.__setitem__(
               ..., x_ref[...].astype(jnp.bfloat16)),
           (xi8,), (32, 128), jnp.bfloat16)
cast_probe("i8 dyn sublane slice",
           lambda x_ref, o_ref: o_ref.__setitem__(
               ..., x_ref[pl.ds(jnp.int32(7) + x_ref[0, 0].astype(jnp.int32) * 0, 8), :]),
           (xi8,), (8, 128), jnp.int8)
cast_probe("i8 static roll",
           lambda x_ref, o_ref: o_ref.__setitem__(
               ..., pltpu.roll(x_ref[...], shift=5, axis=1)),
           (xi8,), (32, 128), jnp.int8)
xi32 = jnp.arange(128 * 128, dtype=jnp.int32).reshape(128, 128)
idx = (jnp.arange(128 * 128, dtype=jnp.int32).reshape(128, 128) * 7) % 128
cast_probe("taa1 128x128",
           lambda x_ref, i_ref, o_ref: o_ref.__setitem__(
               ..., jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)),
           (xi32, idx), (128, 128), jnp.int32)
print("done", flush=True)
