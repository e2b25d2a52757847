"""Corruption/truncation fuzz through the *device* framed decode paths
(VERDICT r1 #8): every mutation must either raise a documented error or
decode to the exact original bytes (mutations in padding/skippable
regions are legal) — never return wrong bytes.

Runs the same sweep through all three decode engines: hybrid
(host-parse), pure-device jnp, and pallas (interpret on CPU).
"""

import random

import pytest

from snappy_tpu.errors import (
    BadMagicError,
    ChecksumError,
    CorruptError,
    SnappyError,
    UnsupportedError,
)
from snappy_tpu.runtime import device_codec

_ERRS = (BadMagicError, ChecksumError, CorruptError, UnsupportedError, SnappyError)


def _fuzz_sweep(data: bytes, framed: bytes, rng: random.Random, n_mut: int):
    wrong = 0
    for k in range(n_mut):
        mut = bytearray(framed)
        kind = k % 3
        if kind == 0:  # flip a random byte
            i = rng.randrange(len(mut))
            mut[i] ^= rng.randrange(1, 256)
        elif kind == 1:  # truncate
            mut = mut[: rng.randrange(1, len(mut))]
        else:  # splice garbage run
            i = rng.randrange(len(mut))
            n = min(len(mut) - i, rng.randrange(1, 64))
            mut[i : i + n] = rng.randbytes(n)
        try:
            out = device_codec.decompress_framed(bytes(mut))
        except _ERRS:
            continue
        except OverflowError:
            # a mutated 3-byte chunk-length header may describe a chunk
            # larger than the buffer; must have been caught above
            raise
        if out != data:
            wrong += 1
    assert wrong == 0, f"{wrong}/{n_mut} mutations returned wrong bytes"


@pytest.fixture
def corpus(rng):
    data = (b"fuzz corpus line " * 5000)[:70000] + rng.randbytes(40000)
    return data, device_codec.compress_framed(data)


def test_fuzz_hybrid_engine(corpus, rng):
    data, framed = corpus
    assert device_codec.HOST_PARSE  # default path
    _fuzz_sweep(data, framed, rng, 60)


def test_fuzz_pure_device_engine(corpus, rng, monkeypatch):
    data, framed = corpus
    monkeypatch.setattr(device_codec, "HOST_PARSE", False)
    _fuzz_sweep(data, framed, rng, 40)


def test_fuzz_pallas_engine(corpus, rng, monkeypatch):
    data, framed = corpus
    monkeypatch.setattr(device_codec, "_pallas_cache", True)
    _fuzz_sweep(data, framed, rng, 24)


def test_fuzz_no_device_crc(corpus, rng, monkeypatch):
    # host-CRC verification path
    data, framed = corpus
    monkeypatch.setattr(device_codec, "DEVICE_CRC", False)
    _fuzz_sweep(data, framed, rng, 30)
