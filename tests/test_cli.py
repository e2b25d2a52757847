"""CLI: subcommands, atomic writes, exit-code contract (driven through
main() with the fast native/oracle backends)."""

import os

import pytest

from snappy_tpu.cli.main import main
from snappy_tpu.errors import EXIT_CORRUPT


@pytest.fixture
def workdir(tmp_path, rng):
    p = tmp_path / "data.bin"
    p.write_bytes(b"cli test payload " * 2000 + rng.randbytes(5000))
    return tmp_path, p


def _backend():
    from snappy_tpu import native

    return "native" if native.available() else "oracle"


def test_compress_verify_decompress_roundtrip(workdir, capsys):
    tmp, src = workdir
    out = tmp / "data.sz"
    dec = tmp / "data.out"
    assert main([
        "compress", str(src), "-o", str(out), "--verify", "-q",
        "--backend", _backend(),
    ]) == 0
    assert out.exists()
    assert main([
        "decompress", str(out), "-o", str(dec), "-q", "--backend", _backend(),
    ]) == 0
    assert dec.read_bytes() == src.read_bytes()
    # no tmp droppings from atomic writes
    assert not [f for f in os.listdir(tmp) if f.startswith(".tpusnappy-")]


def test_verify_and_info(workdir, capsys):
    tmp, src = workdir
    out = tmp / "data.sz"
    main(["compress", str(src), "-o", str(out), "-q", "--backend", _backend()])
    assert main(["verify", str(out), "--backend", _backend()]) == 0
    assert main(["info", str(out)]) == 0
    text = capsys.readouterr().out
    assert "framed" in text and "ratio" in text


def test_corrupt_exit_code(workdir, capsys):
    tmp, src = workdir
    out = tmp / "data.sz"
    main(["compress", str(src), "-o", str(out), "-q", "--backend", _backend()])
    blob = bytearray(out.read_bytes())
    blob[len(blob) // 2] ^= 0xFF
    bad = tmp / "bad.sz"
    bad.write_bytes(bytes(blob))
    rc = main(["verify", str(bad), "--backend", _backend()])
    assert rc != 0


def test_missing_file():
    assert main(["compress", "/nonexistent/file", "-q"]) == 2


def test_raw_format_roundtrip(workdir):
    tmp, src = workdir
    out = tmp / "data.snappy"
    dec = tmp / "raw.out"
    assert main([
        "compress", str(src), "-o", str(out), "--format", "raw", "-q",
        "--backend", _backend(),
    ]) == 0
    assert main([
        "decompress", str(out), "-o", str(dec), "-q", "--backend", _backend(),
    ]) == 0
    assert dec.read_bytes() == src.read_bytes()
