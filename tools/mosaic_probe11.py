"""Probe 11: flat-decode kernel v2 candidates vs the shipped v1 body.

v1 (decode_flat._flat_kernel, measured 11.9 us/trip on the 4x64 bench):
per subpanel, two one-hot gather matmuls -> f32 7-step masked barrel
shifter -> per-subpanel (128,128) compose + dynamic RMW.  Hypotheses:

  v2_batched  gathers stay per-subpanel, but the pre-shift merge casts
              to bf16 and the 7-roll barrel shifter runs ONCE on the
              concatenated (512,128) bf16 panel (rolls go from 28
              latency-bound ops to 7 throughput ops at half the bytes);
              single (128,512)@(512,128) compose; ONE dynamic RMW per
              trip (requires bin-aligned packing).
  v2_w64      v2_batched with W=64 source windows (halves gather MACs;
              packer would shrink subpanels whose span exceeds 62).
  v2_pair     v2_batched but the row-pair gather is one matmul against
              concat(bwin, roll(bwin,-1,axis=0)) -> (W, 256), halving
              matmul issue count at equal FLOPs.

Run: python tools/mosaic_probe11.py [names...]
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
INTERP = os.environ.get("PROBE_INTERPRET") == "1"
RB = 728
ROWS = 520
GB = 32

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


def _gather_merge(mrow_a, mrow_b, bwin_bf, lane_p, W, pair,
                  bwin2_bf=None):
    """Per-subpanel: one-hot row-pair gather + pre-shift merge.
    Returns (v f32 (128,128) unrotated, rot col (128,1), mask)."""
    a_col = jnp.transpose(mrow_a, (1, 0))
    b_col = jnp.transpose(mrow_b, (1, 0))
    qrel = a_col & 127
    rot = jax.lax.shift_right_logical(a_col, 7) & 127
    dphi = b_col & 127
    lenm1 = jax.lax.shift_right_logical(b_col, 7) & 127
    valid = (b_col & (1 << 21)) != 0
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (VEC, W), 1)
    phi = (VEC - rot) & (VEC - 1)
    if pair:
        b2 = jnp.concatenate(
            [bwin_bf, bwin2_bf], axis=1
        )  # (W, 256): lane 128+l holds row q+1's lane l
        rs0 = (lane_w == qrel).astype(jnp.bfloat16)
        u = jax.lax.dot_general(rs0, b2, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        v = jnp.where(lane_p >= phi, u[:, :VEC], u[:, VEC:])
    else:
        rs0 = (lane_w == qrel).astype(jnp.bfloat16)
        rs1 = (lane_w == qrel + 1).astype(jnp.bfloat16)
        u0 = jax.lax.dot_general(rs0, bwin_bf, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        u1 = jax.lax.dot_general(rs1, bwin_bf, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        v = jnp.where(lane_p >= phi, u0, u1)
    mask = valid & (lane_p >= dphi) & (lane_p - dphi <= lenm1)
    # NOTE: the panel must stay f32 — bf16 pltpu.roll is the one
    # construct the compile service rejects (tools/mosaic_probe12)
    return v, rot, mask


def _mk_v2(W, pair=False):
    def build():
        def make(nt):
            def kernel(b_ref, meta_ref, st_ref, out_ref):
                lane_p = jax.lax.broadcasted_iota(jnp.int32, (VEC, VEC), 1)
                row_iota = jax.lax.broadcasted_iota(jnp.int32, (VEC, 4 * VEC), 0)
                out_ref[0, :, :] = jnp.zeros((ROWS, VEC), jnp.float32)

                def body(i, c):
                    srow = st_ref[0, pl.ds((i >> 5) & 7, 1), :]
                    sr = pltpu.roll(srow, shift=(VEC - ((i & 31) * 4)) & (VEC - 1),
                                    axis=1)
                    mrow = meta_ref[0, pl.ds(8 * (i & 63), 8), :]
                    vs, rots, masks, drels = [], [], [], []
                    for s in range(4):
                        S = sr[0, s] & 1023
                        bwin = b_ref[0, pl.ds(S, W), :].astype(jnp.bfloat16)
                        bwin2 = (b_ref[0, pl.ds(S + 1, W), :]
                                 .astype(jnp.bfloat16) if pair else None)
                        v, rot, mask = _gather_merge(
                            mrow[s:s + 1, :], mrow[4 + s:4 + s + 1, :],
                            bwin, lane_p, W, pair, bwin2)
                        vs.append(v)
                        rots.append(rot)
                        masks.append(mask)
                        drels.append(jax.lax.shift_right_logical(
                            mrow[4 + s:4 + s + 1, :], 14) & 127)
                    vcat = jnp.concatenate(vs, axis=0)          # (512,128) f32
                    rcat = jnp.concatenate(rots, axis=0)        # (512,1)
                    for k in range(7):
                        bit = (jax.lax.shift_right_logical(rcat, k) & 1) == 1
                        vcat = jnp.where(bit, pltpu.roll(vcat, shift=1 << k,
                                                         axis=1), vcat)
                    mcat = jnp.concatenate(masks, axis=0)
                    mk = jnp.where(mcat, vcat, 0.0).astype(jnp.bfloat16)
                    dcat = jnp.concatenate(drels, axis=1)       # (1,512)
                    ds_t = (row_iota == dcat).astype(jnp.bfloat16)
                    contrib = jax.lax.dot_general(
                        ds_t, mk, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    D = jax.lax.shift_right_logical(sr[0, 0], 10) * VEC
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
            for s in range(4):
                meta[:, 4 + s::8, :] = (127 << 7) | (s << 14) | (1 << 21)
            st = np.zeros((GB, 8, VEC), np.int32)
            return f, (b, jnp.asarray(meta), jnp.asarray(st))

        return {"trips": (64, 192), "make": make}

    return build()


PROBES["v2_batched"] = lambda: _mk_v2(128)
PROBES["v2_w64"] = lambda: _mk_v2(64)
PROBES["v2_pair"] = lambda: _mk_v2(128, pair=True)


def main():
    names = sys.argv[1:] or list(PROBES)
    print(f"devices: {jax.devices()}", flush=True)
    for n in names:
        run_probe(n, PROBES[n])
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
