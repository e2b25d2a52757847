"""Parallel decoder (numpy reference): bit parity with the oracle on all
stream shapes, including streams from external C++ snappy, plus the full
corrupt-stream error surface."""

import pytest

from conftest import make_corpus_samples
from snappy_tpu.errors import CorruptError
from snappy_tpu.kernels import decode_np, encode_np
from snappy_tpu.spec import reference

pa = pytest.importorskip("pyarrow")


def test_roundtrip_corpus(rng):
    for sample in make_corpus_samples(rng):
        for comp in (
            reference.compress(sample),
            encode_np.compress(sample),
            pa.compress(sample, codec="snappy", asbytes=True),
        ):
            assert decode_np.decompress(comp) == sample


def test_golden_vectors():
    assert decode_np.decompress(b"\x1b\x20Wikipedia\x46\x09\x00") == b"Wikipedia" * 3
    assert decode_np.decompress(b"\x00") == b""
    assert decode_np.decompress(b"\x01\x00a") == b"a"
    # overlapping RLE copy
    assert decode_np.decompress(b"\x09\x00a" + bytes([(4 << 2) | 1, 1])) == b"a" * 9
    # copy4 tag
    assert (
        decode_np.decompress(b"\x08\x0cabcd" + bytes([(3 << 2) | 3, 4, 0, 0, 0]))
        == b"abcdabcd"
    )


def test_multi_fragment(rng):
    data = rng.randbytes(65536) + b"Z" * 70000 + rng.randbytes(1000)
    assert decode_np.decompress(reference.compress(data)) == data


@pytest.mark.parametrize(
    "stream",
    [
        b"\x05\x0cabcd",  # short decode
        b"\x0a\x24abc",  # truncated literal
        b"\x08\x0cabcd" + bytes([(3 << 2) | 1, 0]),  # zero offset
        b"\x08\x0cabcd" + bytes([(3 << 2) | 2, 10, 0]),  # offset before start
        b"\x05\x0cabcd" + bytes([(60 << 2) | 2, 1, 0]),  # overruns output
        b"\x03\x0cabcd",  # extra output
        b"\x02",  # truncated: no elements
    ],
)
def test_corrupt_streams(stream):
    with pytest.raises(CorruptError):
        decode_np.decompress(stream)
    with pytest.raises(CorruptError):
        reference.decompress(stream)  # oracle agrees


def test_error_parity_fuzz(rng):
    """Random corruptions: the parallel decoder and the oracle must agree
    on accept/reject, and on the bytes when both accept."""
    data = rng.randbytes(500) + b"pattern" * 100 + rng.randbytes(100)
    comp = bytearray(reference.compress(data))
    for _ in range(150):
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
            got = decode_np.decompress(blob)
            ok_np = True
        except CorruptError:
            ok_np = False
        assert ok_ref == ok_np, f"accept/reject divergence on {blob[:20].hex()}"
        if ok_ref:
            assert got == want
