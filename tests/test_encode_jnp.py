"""jnp encoder: byte-identical to the numpy reference implementation, and
therefore round-trip correct + ratio-dominant."""

import numpy as np
import pytest

from conftest import make_corpus_samples
from snappy_tpu.kernels import encode_jnp, encode_np
from snappy_tpu.spec import reference

pa = pytest.importorskip("pyarrow")


def test_identical_to_numpy_reference(rng):
    for sample in make_corpus_samples(rng, sizes=(4, 17, 64, 1000, 4096)):
        if not sample:
            continue
        got = encode_jnp.encode_block_jnp(sample, bmax=8192)
        want = encode_np.encode_block_np(sample)
        assert got == want, f"divergence on n={len(sample)} {sample[:32]!r}"


def test_roundtrip_64k(rng):
    samples = [
        rng.randbytes(65536),
        (b"the quick brown fox. " * 4000)[:65536],
        b"A" * 65536,
        bytes(rng.choices(range(8), k=65536)),
    ]
    arr = np.zeros((len(samples), 65536), dtype=np.uint8)
    lens = np.zeros(len(samples), dtype=np.int32)
    for i, s in enumerate(samples):
        arr[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[i] = len(s)
    comp, clen, ok = encode_jnp.encode_blocks(arr, lens)
    assert np.asarray(ok).all()
    for i, s in enumerate(samples):
        blob = bytes(np.asarray(comp[i, : int(clen[i])]).tobytes())
        assert blob == encode_np.encode_block_np(s)
        assert reference.decode_block(blob, len(s)) == s
        full = reference.put_uvarint(len(s)) if False else None
    # also: C++ snappy can decode a full stream built from these blocks
    from snappy_tpu.spec.format import put_uvarint

    s = samples[1]
    stream = put_uvarint(len(s)) + bytes(np.asarray(comp[1, : int(clen[1])]).tobytes())
    assert pa.decompress(stream, len(s), codec="snappy", asbytes=True) == s


def test_tiny_blocks():
    for n in range(1, 24):
        t = (b"abcab" * 6)[:n]
        got = encode_jnp.encode_block_jnp(t, bmax=256)
        assert got == encode_np.encode_block_np(t)
        assert reference.decode_block(got, n) == t


def test_batch_mixed_lengths(rng):
    samples = [rng.randbytes(100), b"x" * 3000, b"", rng.randbytes(4095)]
    arr = np.zeros((len(samples), 4096), dtype=np.uint8)
    lens = np.zeros(len(samples), dtype=np.int32)
    for i, s in enumerate(samples):
        arr[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[i] = len(s)
    comp, clen, ok = encode_jnp.encode_blocks(arr, lens, bmax=4096)
    assert np.asarray(ok).all()
    for i, s in enumerate(samples):
        blob = bytes(np.asarray(comp[i, : int(clen[i])]).tobytes())
        if s:
            assert blob == encode_np.encode_block_np(s)
            assert reference.decode_block(blob, len(s)) == s
        else:
            assert int(clen[i]) == 0
