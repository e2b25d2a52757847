"""Pallas sequential-per-block encoder: interpret-mode validation on CPU.
Byte-identical emission to spec.reference.encode_block is the contract —
that makes the ratio bound structural (the output IS the reference
encoding).  The real Mosaic compile is exercised on TPU by the bench."""

import numpy as np

from snappy_tpu.kernels.pallas_encode import ELANES, encode_blocks_pallas
from snappy_tpu.spec import reference


def _encode(samples, bmax):
    samples = list(samples)
    while len(samples) % ELANES:
        samples.append(b"")
    B = len(samples)
    blocks = np.zeros((B, bmax), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, d in enumerate(samples):
        blocks[i, : len(d)] = np.frombuffer(d, np.uint8)
        lens[i] = len(d)
    comp, clens, err = encode_blocks_pallas(blocks, lens, bmax=bmax, interpret=True)
    return samples, np.asarray(comp), np.asarray(clens), np.asarray(err)


def _check(samples, comp, clens, err):
    assert (err == 0).all()
    for i, d in enumerate(samples):
        want = reference.encode_block(d) if d else b""
        got = comp[i, : clens[i]].tobytes()
        assert got == want, f"row {i} len={len(d)}: {len(got)} vs {len(want)}"


def test_emission_matrix(rng):
    samples = [
        b"Wikipedia" * 3,
        b"a" * 5000,                      # RLE -> long match, chopping loop
        rng.randbytes(4000),              # incompressible, skip heuristic
        (b"abcdefgh" * 600)[:4500],
        b"",                              # empty
        b"x" * 17,                        # below MIN_NON_LITERAL
        b"x" * 18,                        # at the boundary
        rng.randbytes(100) + b"yz" * 1500,
        bytes(8000),                      # zeros
    ]
    _check(*_encode(samples, 8192))


def test_full_blocks(rng):
    from conftest import make_corpus_samples

    samples = [s[:65536] for s in make_corpus_samples(rng, sizes=(65536, 30000))]
    samples += [bytes(65536), rng.randbytes(65536), (b"ab" * 40000)[:65536]]
    _check(*_encode(samples, 65536))


def test_boundary_sizes(rng):
    samples = []
    for n in (1, 17, 18, 19, 127, 128, 129, 255, 256, 4095, 4096):
        samples.append((b"pattern!" * 600)[: n // 2] + rng.randbytes(n - n // 2))
    _check(*_encode(samples, 4096))


def test_roundtrip_through_decoder(rng):
    """Pallas encode -> pallas decode, both interpret mode."""
    from snappy_tpu.kernels.pallas_decode import decode_blocks_pallas

    samples = [
        (b"roundtrip " * 1000)[:8000],
        rng.randbytes(3000),
        b"z" * 7000,
    ]
    samples, comp, clens, err = _encode(samples, 8192)
    from snappy_tpu.kernels.pallas_decode import LANES

    while len(samples) % LANES:
        samples.append(b"")
        comp = np.pad(comp, ((0, 1), (0, 0)))
        clens = np.append(clens, 0)
    B = len(samples)
    starts = np.zeros(B, np.int32)
    dlens = np.array([len(s) for s in samples], np.int32)
    comp_in = np.zeros((B, comp.shape[1] // 128 * 128), np.uint8)
    comp_in[:, : comp.shape[1]] = comp[:, : comp_in.shape[1]]
    out, derr = decode_blocks_pallas(
        comp_in, starts, clens, dlens, out_max=8192, interpret=True
    )
    out, derr = np.asarray(out), np.asarray(derr)
    assert (derr == 0).all(), derr
    for i, s in enumerate(samples):
        assert out[i, : len(s)].tobytes() == s
