"""L3 mesh sharding on the virtual 8-device CPU mesh: the multi-chip DP
path must produce byte-identical results to single-device encode, with
zero tolerance for device-order dependence."""

import numpy as np
import pytest

import jax

from snappy_tpu.dist import mesh as dmesh
from snappy_tpu.kernels import encode_np
from snappy_tpu.spec import reference


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return dmesh.make_mesh(8)


def _mk_batch(rng, n_blocks, bmax):
    blocks = np.zeros((n_blocks, bmax), dtype=np.uint8)
    lens = np.zeros(n_blocks, dtype=np.int32)
    for i in range(n_blocks):
        kind = i % 3
        if kind == 0:
            row = (b"mesh sharded block data " * 60)[: bmax - i]
        elif kind == 1:
            row = rng.randbytes(bmax // 2 + i)
        else:
            row = b"R" * (bmax // 3)
        blocks[i, : len(row)] = np.frombuffer(row, dtype=np.uint8)
        lens[i] = len(row)
    return blocks, lens


def test_sharded_encode_matches_reference(rng, mesh8):
    bmax = 2048
    blocks, lens = _mk_batch(rng, 16, bmax)
    comp, clen, ok = dmesh.sharded_encode(mesh8, blocks, lens, bmax)
    assert ok.all()
    for i in range(16):
        blob = comp[i, : clen[i]].tobytes()
        want = encode_np.encode_block_np(blocks[i, : lens[i]].tobytes())
        assert blob == want, f"block {i} diverged under sharding"


def test_roundtrip_step(rng, mesh8):
    bmax = 2048
    blocks, lens = _mk_batch(rng, 16, bmax)
    comp, clen, ok, offsets, out, err, match = dmesh.roundtrip_step(
        mesh8, blocks, lens, bmax
    )
    assert np.asarray(ok).all()
    assert (np.asarray(err) == 0).all()
    assert bool(np.asarray(match))
    cl = np.asarray(clen)
    assert (np.asarray(offsets) == np.cumsum(cl) - cl).all()


def test_decode_sharded(rng, mesh8):
    bmax = 2048
    samples = [rng.randbytes(500), b"Q" * 1500, (b"ab" * 900)[:1800]] * 4
    cmax = 2048
    B = len(samples)
    comp = np.zeros((B, cmax), dtype=np.uint8)
    starts = np.zeros(B, dtype=np.int32)
    clens = np.zeros(B, dtype=np.int32)
    dlens = np.zeros(B, dtype=np.int32)
    from snappy_tpu.spec.format import read_uvarint

    for i, s in enumerate(samples):
        c = reference.compress(s)
        comp[i, : len(c)] = np.frombuffer(c, dtype=np.uint8)
        d, h = read_uvarint(c, 0)
        starts[i], clens[i], dlens[i] = h, len(c), d
    out, err = dmesh.sharded_decode(mesh8, comp, starts, clens, dlens, out_max=bmax)
    assert (err == 0).all()
    for i, s in enumerate(samples):
        assert out[i, : len(s)].tobytes() == s
