"""Pallas sequential-per-block decoder: interpret-mode validation on CPU
(bit parity with the oracle; error flags on invalid streams).  The real
Mosaic compile is exercised on TPU by the bench/runtime."""

import numpy as np

from snappy_tpu.kernels.pallas_decode import VEC, decode_blocks_pallas
from snappy_tpu.spec import reference
from snappy_tpu.spec.format import read_uvarint


def _stage(streams, cmax):
    from snappy_tpu.kernels.pallas_decode import LANES

    assert cmax % VEC == 0
    streams = list(streams)
    while len(streams) % LANES:
        streams.append(b"\x00")  # empty stream padding row
    B = len(streams)
    comp = np.zeros((B, cmax), np.uint8)
    starts = np.zeros(B, np.int32)
    clens = np.zeros(B, np.int32)
    dlens = np.zeros(B, np.int32)
    for i, c in enumerate(streams):
        d, h = read_uvarint(c, 0)
        comp[i, : len(c)] = np.frombuffer(c, np.uint8)
        starts[i], clens[i], dlens[i] = h, len(c), d
    return comp, starts, clens, dlens


def _decode(streams, cmax, out_max):
    comp, starts, clens, dlens = _stage(streams, cmax)
    out, err = decode_blocks_pallas(
        comp, starts, clens, dlens, out_max=out_max, interpret=True
    )
    return np.asarray(out), np.asarray(err)


def test_roundtrip_matrix(rng):
    samples = [
        b"Wikipedia" * 3,
        b"a" * 5000,                      # offset-1 RLE
        rng.randbytes(4000),              # literal-only
        (b"abcdefgh" * 600)[:4500],       # short period
        (b"0123456789abcdef" * 64 + b"X") * 5,  # >=128 offsets
        b"",                              # empty
        rng.randbytes(3) + b"zz" * 2000,  # mixed
    ]
    out, err = _decode([reference.compress(s) for s in samples], 8192, 8192)
    assert (err == 0).all(), err
    for i, s in enumerate(samples):
        assert out[i, : len(s)].tobytes() == s, f"row {i}"


def test_error_codes():
    bad_streams = [
        b"\x05\x0cabcd",                              # short decode
        b"\x08\x0cabcd" + bytes([(3 << 2) | 1, 0]),   # zero offset
        b"\x08\x0cabcd" + bytes([(3 << 2) | 2, 10, 0]),  # offset before start
        b"\x05\x0cabcd" + bytes([(60 << 2) | 2, 1, 0]),  # overruns output
        b"\x0a\x24abc",                               # truncated literal
    ]
    out, err = _decode(bad_streams, 1024, 1024)
    assert (err[: len(bad_streams)] != 0).all(), err


def test_agreement_with_oracle_fuzz(rng):
    """Valid streams from both host encoders decode identically."""
    from snappy_tpu.kernels import encode_np

    samples = [rng.randbytes(rng.randint(1, 3000)) for _ in range(4)]
    samples += [(b"word " * 1000)[: rng.randint(100, 4000)] for _ in range(4)]
    streams = [reference.compress(s) for s in samples[:4]]
    streams += [encode_np.compress(s) for s in samples[4:]]
    out, err = _decode(streams, 8192, 8192)
    assert (err == 0).all()
    for i, s in enumerate(samples):
        assert out[i, : len(s)].tobytes() == s


def test_corpus_fuzz(rng):
    """Corpus-sampler fuzz: realistic mixed-entropy blocks, full 64 KiB
    geometry (the VERDICT r1 ask: interpret fuzz over the corpus)."""
    from conftest import make_corpus_samples

    samples = [s[:65536] for s in make_corpus_samples(rng, sizes=(65536, 30000))]
    samples += [
        bytes(65536),
        (b"ab" * 40000)[:65536],
        rng.randbytes(65536),
    ]
    out, err = _decode([reference.compress(s) for s in samples], 66560, 65536)
    assert (err == 0).all(), err
    for i, s in enumerate(samples):
        assert out[i, : len(s)].tobytes() == s, f"row {i}"


def test_boundary_alignment(rng):
    """Sizes straddling the 128-byte row geometry the kernel lives on."""
    samples = []
    for n in (1, 127, 128, 129, 255, 256, 257, 4095, 4096, 4097):
        samples.append(rng.randbytes(n // 2) + b"Q" * (n - n // 2))
    out, err = _decode([reference.compress(s) for s in samples], 8192, 8192)
    assert (err == 0).all(), err
    for i, s in enumerate(samples):
        assert out[i, : len(s)].tobytes() == s, f"len={len(s)}"
