"""Hybrid decode: native tag parser records + pretagged device kernel."""

import numpy as np
import pytest

from snappy_tpu import native
from snappy_tpu.errors import CorruptError
from snappy_tpu.kernels.decode_pretagged import decode_blocks_pretagged
from snappy_tpu.spec import reference
from snappy_tpu.spec.format import read_uvarint

pytestmark = pytest.mark.skipif(not native.available(), reason="native build unavailable")


def test_parse_tags_records(rng):
    data = b"record parse " * 50 + rng.randbytes(200)
    comp = reference.compress(data)
    dlen, hdr = read_uvarint(comp, 0)
    rec = np.zeros((4096, 4), np.int32)
    nt = native.parse_tags(comp, hdr, dlen, rec)
    assert nt >= 2
    # records tile the output exactly
    assert rec[0, 3] == 0
    for k in range(1, nt):
        assert rec[k, 3] == rec[k - 1, 3] + rec[k - 1, 1]
    assert rec[nt - 1, 3] + rec[nt - 1, 1] == dlen
    # literal records point at real literal bytes
    for k in range(nt):
        kind, ln, arg, start = rec[k]
        if kind == 0:
            assert comp[arg : arg + ln] == data[start : start + ln]


def test_parse_tags_rejects_corrupt():
    rec = np.zeros((64, 4), np.int32)
    for stream in (b"\x05\x0cabcd", b"\x08\x0cabcd" + bytes([(3 << 2) | 1, 0])):
        dlen, hdr = read_uvarint(stream, 0)
        with pytest.raises(CorruptError):
            native.parse_tags(stream, hdr, dlen, rec)


def test_pretagged_kernel_roundtrip(rng):
    samples = [
        rng.randbytes(1000),
        b"A" * 5000,
        (b"pattern! " * 800)[:6000],
        b"",
    ]
    B, CMAX, OMAX, T = len(samples), 8192, 8192, 2048
    comp = np.zeros((B, CMAX), np.uint8)
    recs = np.zeros((B, T, 4), np.int32)
    ntags = np.zeros(B, np.int32)
    dlens = np.zeros(B, np.int32)
    for i, s in enumerate(samples):
        c = reference.compress(s)
        d, h = read_uvarint(c, 0)
        comp[i, : len(c)] = np.frombuffer(c, np.uint8)
        tmp = np.zeros((T, 4), np.int32)
        nt = native.parse_tags(c, h, d, tmp)
        recs[i, :nt] = tmp[:nt]
        ntags[i], dlens[i] = nt, d
    out = decode_blocks_pretagged(comp, recs, ntags, dlens, out_max=OMAX)
    out = np.asarray(out)
    for i, s in enumerate(samples):
        assert out[i, : len(s)].tobytes() == s
