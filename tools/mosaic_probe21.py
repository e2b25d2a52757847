"""Round-3 probes for the device-matcher kernel (pallas_match.py):
  P1 reshape [4,128] i32 -> [512,1]  (position-major flatten)
  P2 dot_general TN: contract sublanes of BOTH operands [512,128]x[512,128]
  P3 take_along_axis(axis=1) on [512,128] with computed indices
  P4 bitcast f32->i32 exponent extraction (floor(log2) without log)
  P5 wide one-hot [512,512] bf16 @ [512,128] row gather
Run on the real TPU; each probe compiles + executes + checks numerics.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from snappy_tpu.utils.jaxcache import setup_compilation_cache
setup_compilation_cache()

def run(name, kernel, args, out_shape, check):
    try:
        f = pl.pallas_call(kernel, out_shape=out_shape)
        outs = jax.jit(f)(*args)
        outs = jax.tree.map(np.asarray, outs)
        ok = check(outs)
        print(f"{name}: {'OK' if ok else 'WRONG-NUMERICS'}")
        return ok
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")
        return False

# P1 reshape
def k1(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :].reshape(512, 1)
x = np.arange(512, dtype=np.int32).reshape(4, 128)
run("P1 reshape[4,128]->[512,1]", k1, (x,),
    jax.ShapeDtypeStruct((512, 1), jnp.int32),
    lambda o: (o.ravel() == np.arange(512)).all())

# P2 TN dot_general
def k2(a_ref, b_ref, o_ref):
    a = a_ref[:, :].astype(jnp.bfloat16)
    b = b_ref[:, :].astype(jnp.bfloat16)
    o_ref[:, :] = jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
rng = np.random.default_rng(0)
a = rng.integers(0, 2, (512, 128)).astype(np.float32)
b = rng.integers(0, 3, (512, 128)).astype(np.float32)
run("P2 TN dot [512,128]T@[512,128]", k2, (a, b),
    jax.ShapeDtypeStruct((128, 128), jnp.float32),
    lambda o: np.allclose(o, a.T @ b, atol=0.5))

# P3 take_along_axis(axis=1), computed indices
def k3(x_ref, i_ref, o_ref):
    o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], (i_ref[:, :] * 7) % 128, axis=1)
x3 = rng.integers(0, 1000, (512, 128)).astype(np.int32)
i3 = rng.integers(0, 128, (512, 128)).astype(np.int32)
run("P3 TAA axis=1 [512,128]", k3, (x3, i3),
    jax.ShapeDtypeStruct((512, 128), jnp.int32),
    lambda o: (o == np.take_along_axis(x3, (i3 * 7) % 128, axis=1)).all())

# P4 exponent extract via bitcast
def k4(z_ref, o_ref):
    zi = jax.lax.bitcast_convert_type(z_ref[:, :], jnp.int32)
    o_ref[:, :] = jax.lax.shift_right_logical(zi, 23) - 127
z = np.ldexp(np.ones((8, 128), np.float32) * 1.25, rng.integers(-100, 100, (8, 128)))
run("P4 f32 exponent bitcast", k4, (z.astype(np.float32),),
    jax.ShapeDtypeStruct((8, 128), jnp.int32),
    lambda o: (o == np.floor(np.log2(z)).astype(np.int32)).all())

# P5 wide one-hot gather: rows[p] = V[c_p] with one-hot [512, 512]
def k5(c_ref, v_ref, o_ref):
    c = c_ref[:, :]  # [512,1] row ids
    iota = jax.lax.broadcasted_iota(jnp.int32, (512, 512), 1)
    oh = (iota == c).astype(jnp.bfloat16)
    o_ref[:, :] = jax.lax.dot_general(
        oh, v_ref[:, :].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
c5 = rng.integers(0, 512, (512, 1)).astype(np.int32)
v5 = rng.integers(0, 200, (512, 128)).astype(np.float32)
run("P5 one-hot [512,512]@[512,128]", k5, (c5, v5),
    jax.ShapeDtypeStruct((512, 128), jnp.float32),
    lambda o: (o == v5[c5.ravel()]).all())
