"""jnp decoder: identical behavior to the numpy reference and the oracle
(bytes and accept/reject), on the CPU backend."""

import numpy as np
import pytest

from conftest import make_corpus_samples
from snappy_tpu.errors import CorruptError
from snappy_tpu.kernels import decode_jnp, encode_np
from snappy_tpu.spec import reference
from snappy_tpu.spec.format import read_uvarint

pa = pytest.importorskip("pyarrow")


def jnp_decompress(comp: bytes) -> bytes:
    dst_len, hdr = read_uvarint(comp, 0)
    return decode_jnp.decode_block_jnp(comp, dst_len, start=hdr)


def test_golden_vectors():
    assert jnp_decompress(b"\x1b\x20Wikipedia\x46\x09\x00") == b"Wikipedia" * 3
    assert jnp_decompress(b"\x00") == b""
    assert jnp_decompress(b"\x01\x00a") == b"a"
    assert jnp_decompress(b"\x09\x00a" + bytes([(4 << 2) | 1, 1])) == b"a" * 9
    assert (
        jnp_decompress(b"\x08\x0cabcd" + bytes([(3 << 2) | 3, 4, 0, 0, 0]))
        == b"abcdabcd"
    )


def test_roundtrip_corpus(rng):
    for sample in make_corpus_samples(rng, sizes=(0, 1, 17, 1000, 65536)):
        for comp in (
            reference.compress(sample),
            encode_np.compress(sample),
            pa.compress(sample, codec="snappy", asbytes=True),
        ):
            assert jnp_decompress(comp) == sample


def test_batched_blocks(rng):
    """Many blocks of different shapes decoded in one device call."""
    samples = [
        rng.randbytes(100),
        b"A" * 5000,
        (b"xyz" * 3000)[:7000],
        rng.randbytes(3),
        b"",
    ]
    comps = [reference.compress(s) for s in samples]
    cmax = max(len(c) for c in comps)
    B = len(comps)
    arr = np.zeros((B, cmax), dtype=np.uint8)
    starts = np.zeros(B, dtype=np.int32)
    lens = np.zeros(B, dtype=np.int32)
    dlens = np.zeros(B, dtype=np.int32)
    for i, c in enumerate(comps):
        arr[i, : len(c)] = np.frombuffer(c, dtype=np.uint8)
        d, h = read_uvarint(c, 0)
        starts[i], lens[i], dlens[i] = h, len(c), d
    out, err = decode_jnp.decode_blocks(arr, starts, lens, dlens, out_max=8192)
    assert (np.asarray(err) == 0).all()
    for i, s in enumerate(samples):
        assert bytes(np.asarray(out[i, : len(s)]).tobytes()) == s


@pytest.mark.parametrize(
    "stream",
    [
        b"\x05\x0cabcd",
        b"\x0a\x24abc",
        b"\x08\x0cabcd" + bytes([(3 << 2) | 1, 0]),
        b"\x08\x0cabcd" + bytes([(3 << 2) | 2, 10, 0]),
        b"\x05\x0cabcd" + bytes([(60 << 2) | 2, 1, 0]),
        b"\x03\x0cabcd",
        b"\x02",
        # poison literal: x=63 with huge 4-byte length
        b"\x05" + bytes([63 << 2, 0, 0, 0, 0x7F]) + b"abcd",
    ],
)
def test_corrupt_streams(stream):
    with pytest.raises(CorruptError):
        jnp_decompress(stream)
    with pytest.raises(CorruptError):
        reference.decompress(stream)


def test_error_parity_fuzz(rng):
    data = rng.randbytes(300) + b"pattern" * 60 + rng.randbytes(60)
    comp = bytearray(reference.compress(data))
    agree = 0
    for _ in range(60):
        mutated = bytearray(comp)
        for _ in range(rng.randint(1, 3)):
            op = rng.randint(0, 2)
            if op == 0 and len(mutated) > 1:
                mutated[rng.randrange(len(mutated))] = rng.randrange(256)
            elif op == 1 and len(mutated) > 2:
                del mutated[rng.randrange(len(mutated))]
            else:
                mutated.insert(rng.randrange(len(mutated) + 1), rng.randrange(256))
        blob = bytes(mutated)
        try:
            want = reference.decompress(blob)
            ok_ref = True
        except CorruptError:
            ok_ref = False
        try:
            got = jnp_decompress(blob)
            ok_jnp = True
        except CorruptError:
            ok_jnp = False
        assert ok_ref == ok_jnp, f"accept/reject divergence on {blob[:24].hex()}"
        if ok_ref:
            assert got == want
            agree += 1
    assert agree >= 1  # at least some mutations must still decode


def test_large_raw_stream_many_elements():
    """>2^17 elements and deep copy chains must still resolve (doubling
    round bounds scale with the stream size)."""
    from snappy_tpu.spec.format import put_uvarint, read_uvarint

    N = 200000
    payload = bytearray()
    expect = bytearray()
    for i in range(N):
        payload += bytes([0x00, i & 0xFF])
        expect.append(i & 0xFF)
    stream = put_uvarint(N) + bytes(payload)
    got = decode_jnp.decode_block_jnp(stream, N, start=len(put_uvarint(N)))
    assert got == bytes(expect)

    data = b"Q" * 300000
    stream2 = reference.compress(data)
    d, h = read_uvarint(stream2, 0)
    assert decode_jnp.decode_block_jnp(stream2, d, start=h) == data
