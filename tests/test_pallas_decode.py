"""Pallas sequential-per-block decoder: interpret-mode validation on CPU
(bit parity with the oracle; error codes on invalid streams).  The real
Mosaic compile is exercised on TPU by the bench/runtime."""

import numpy as np
import pytest

from snappy_tpu.kernels.pallas_decode import VEC, decode_blocks_pallas
from snappy_tpu.spec import reference
from snappy_tpu.spec.format import read_uvarint


def _stage(streams, cmax, dlens_override=None):
    # pad the batch to the kernel's ROWS granularity with empty streams
    from snappy_tpu.kernels.pallas_decode import ROWS

    streams = list(streams)
    while len(streams) % ROWS:
        streams.append(b"\x00")
    B = len(streams)
    comp = np.zeros((B, cmax + 2 * VEC), np.int32)
    starts = np.zeros(B, np.int32)
    clens = np.zeros(B, np.int32)
    dlens = np.zeros(B, np.int32)
    for i, c in enumerate(streams):
        d, h = read_uvarint(c, 0)
        comp[i, : len(c)] = np.frombuffer(c, np.uint8)
        starts[i], clens[i], dlens[i] = h, len(c), d
    if dlens_override is not None:
        dlens = np.asarray(dlens_override, np.int32)
    return comp, starts, clens, dlens


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
    streams = [reference.compress(s) for s in samples]
    comp, starts, clens, dlens = _stage(streams, 8192)
    out, err = decode_blocks_pallas(
        comp, starts, clens, dlens, out_max=8192, interpret=True
    )
    out, err = np.asarray(out), np.asarray(err)
    assert (err == 0).all(), err
    for i, s in enumerate(samples):
        assert out[i, : len(s)].astype(np.uint8).tobytes() == s, f"row {i}"


def test_error_codes():
    bad_streams = [
        b"\x05\x0cabcd",                              # short decode
        b"\x08\x0cabcd" + bytes([(3 << 2) | 1, 0]),   # zero offset
        b"\x08\x0cabcd" + bytes([(3 << 2) | 2, 10, 0]),  # offset before start
        b"\x05\x0cabcd" + bytes([(60 << 2) | 2, 1, 0]),  # overruns output
        b"\x0a\x24abc",                               # truncated literal
    ]
    n_bad = len(bad_streams)
    comp, starts, clens, dlens = _stage(bad_streams, 1024)
    out, err = decode_blocks_pallas(
        comp, starts, clens, dlens, out_max=1024, interpret=True
    )
    assert (np.asarray(err)[:n_bad] != 0).all(), np.asarray(err)


def test_agreement_with_oracle_fuzz(rng):
    """Valid streams from all three encoders decode identically."""
    from snappy_tpu.kernels import encode_np

    samples = [rng.randbytes(rng.randint(1, 3000)) for _ in range(4)]
    samples += [(b"word " * 1000)[: rng.randint(100, 4000)] for _ in range(4)]
    streams = [reference.compress(s) for s in samples[:4]]
    streams += [encode_np.compress(s) for s in samples[4:]]
    comp, starts, clens, dlens = _stage(streams, 8192)
    out, err = decode_blocks_pallas(
        comp, starts, clens, dlens, out_max=8192, interpret=True
    )
    out, err = np.asarray(out), np.asarray(err)
    assert (err == 0).all()
    for i, s in enumerate(samples):
        assert out[i, : len(s)].astype(np.uint8).tobytes() == s
