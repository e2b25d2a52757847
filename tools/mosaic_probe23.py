"""Round-4 Mosaic constraint re-probe (the compile service changes
every round — r2 inverted r1).  Re-tests the blockers that gate flat-
kernel levers: u8/i8 VMEM, int8 MXU matmuls with i32 accumulation,
take_along_axis on both axes, dynamic lane slicing, wide (>128-lane)
gathers, jnp.cumsum, and a bf16 roll retry.  Each case compiles in
isolation (try/except) and runs once for a smoke value.

Run on the real TPU: python tools/mosaic_probe23.py
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

results = {}


def probe(name, builder, check=None):
    t0 = time.perf_counter()
    try:
        f = builder()
        out = jax.block_until_ready(f())
        out_h = np.asarray(out)
        dt = time.perf_counter() - t0
        ok = True if check is None else bool(check(out_h))
        results[name] = f"COMPILES ({dt:.1f}s) value_ok={ok}"
    except Exception as e:
        results[name] = f"FAILS: {type(e).__name__}: {str(e)[:140]}"
    print(f"{name}: {results[name]}", flush=True)


# --- 1. u8 VMEM in/out ------------------------------------------------
def b_u8_vmem():
    x = jnp.arange(8 * 128, dtype=jnp.uint8).reshape(8, 128)

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] + jnp.uint8(1)

    return lambda: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint8))(x)


probe("u8_vmem_elementwise", b_u8_vmem,
      lambda o: o[0, 3] == 4)


# --- 2. i8 VMEM load -> i32 widen ------------------------------------
def b_i8_widen():
    x = (jnp.arange(32 * 128, dtype=jnp.int32) % 100).astype(jnp.int8)
    x = x.reshape(32, 128)

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...].astype(jnp.int32) * 2

    return lambda: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32))(x)


probe("i8_vmem_widen_i32", b_i8_widen, lambda o: o[0, 7] == 14)


# --- 3. int8 MXU matmul (one-hot gather shape), i32 accum ------------
def b_i8_mxu():
    data = (jnp.arange(128 * 128, dtype=jnp.int32) % 251 - 125).astype(
        jnp.int8).reshape(128, 128)
    sel = jnp.eye(128, dtype=jnp.int8)

    def kern(s_ref, d_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            s_ref[...], d_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    return lambda: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32))(
        sel, data)


probe("i8_mxu_onehot_i32", b_i8_mxu,
      lambda o: (o == np.asarray((np.arange(128 * 128) % 251 - 125)
                                 .reshape(128, 128))).all())


# --- 4. u8 data through bf16 one-hot gather (current formulation but
#        with the DATA ref kept u8 in VMEM, cast after slice) ---------
def b_u8_window_cast():
    data = (jnp.arange(64 * 128, dtype=jnp.int32) % 256).astype(
        jnp.uint8).reshape(64, 128)

    def kern(d_ref, o_ref):
        w = d_ref[pl.ds(8, 16), :].astype(jnp.bfloat16)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1) ==
               jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0)
               ).astype(jnp.bfloat16)
        o_ref[...] = jax.lax.dot_general(
            sel, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return lambda: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32))(data)


probe("u8_dynslice_cast_bf16_mxu", b_u8_window_cast,
      lambda o: o[0, 0] == (8 * 128) % 256)


# --- 5. take_along_axis(axis=1) per-row lane gather (8,128) ----------
def b_taa1():
    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    idx = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 7) % 128

    def kern(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    return lambda: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(x, idx)


probe("take_along_axis1_8x128", b_taa1,
      lambda o: o[0, 1] == 7)


# --- 6. take_along_axis(axis=0) sublane gather ------------------------
def b_taa0():
    x = jnp.arange(128 * 128, dtype=jnp.int32).reshape(128, 128)
    idx = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 5) % 128

    def kern(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)

    return lambda: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(x, idx)


probe("take_along_axis0_128src", b_taa0,
      lambda o: o[0, 1] == 5 * 128 + 1)


# --- 7. dynamic-start LANE slice --------------------------------------
def b_dyn_lane():
    x = jnp.arange(8 * 256, dtype=jnp.int32).reshape(8, 256)
    s = jnp.array([[37]], dtype=jnp.int32)

    def kern(s_ref, x_ref, o_ref):
        o_ref[...] = x_ref[:, pl.ds(s_ref[0, 0], 128)]

    return lambda: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(s, x)


probe("dyn_lane_slice", b_dyn_lane, lambda o: o[0, 0] == 37)


# --- 8. wide gather: 512-row one-hot in ONE matmul ---------------------
def b_wide_onehot():
    data = (jnp.arange(512 * 128, dtype=jnp.int32) % 256).astype(
        jnp.bfloat16).reshape(512, 128)
    rows = (jnp.arange(128, dtype=jnp.int32) * 3) % 512

    def kern(d_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (128, 512), 1)
        sel = (lane == ((jax.lax.broadcasted_iota(jnp.int32, (128, 512), 0)
                         * 3) % 512)).astype(jnp.bfloat16)
        o_ref[...] = jax.lax.dot_general(
            sel, d_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    del rows
    return lambda: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32))(data)


probe("onehot_512row_single_matmul", b_wide_onehot,
      lambda o: o[1, 0] == (3 * 128) % 256)


# --- 9. jnp.cumsum retry ----------------------------------------------
def b_cumsum():
    x = jnp.ones((8, 128), jnp.int32)

    def kern(x_ref, o_ref):
        o_ref[...] = jnp.cumsum(x_ref[...], axis=1)

    return lambda: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(x)


probe("cumsum_axis1", b_cumsum, lambda o: o[0, 127] == 128)


# --- 10. bf16 pltpu.roll retry ----------------------------------------
def b_bf16_roll():
    x = jnp.arange(8 * 128, dtype=jnp.float32).astype(jnp.bfloat16
                                                      ).reshape(8, 128)

    def kern(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], shift=5, axis=1)

    return lambda: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.bfloat16))(x)


probe("bf16_roll", b_bf16_roll, None)


# --- 11. i8 one-hot against u8 data widened in-reg (gather w/o bf16) --
def b_i32_mxu():
    data = (jnp.arange(128 * 128, dtype=jnp.int32) % 256).reshape(128, 128)
    sel = jnp.eye(128, dtype=jnp.int32)

    def kern(s_ref, d_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            s_ref[...], d_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    return lambda: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32))(
        sel, data)


probe("i32_mxu_onehot", b_i32_mxu,
      lambda o: o[2, 5] == (2 * 128 + 5) % 256)


print("\n=== probe23 summary ===")
for k, v in results.items():
    print(f"{k:<32} {v}")
