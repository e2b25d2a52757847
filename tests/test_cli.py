"""CLI: subcommands, atomic writes, exit-code contract (driven through
main() with the fast native/oracle backends)."""

import os

import pytest

from snappy_tpu.cli.main import main


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


def test_streaming_compress_roundtrip(tmp_path, rng, monkeypatch):
    """Slab-streamed CLI path: bounded-memory compress+verify+decompress
    (threshold lowered so the test stays small)."""
    import importlib

    cli_main = importlib.import_module("snappy_tpu.cli.main")

    monkeypatch.setattr(cli_main, "STREAM_THRESHOLD", 100_000)
    monkeypatch.setattr(cli_main, "_SLAB", 70_000)
    src = tmp_path / "big.bin"
    data = (b"streaming payload " * 30000)[:400_000] + rng.randbytes(150_000)
    src.write_bytes(data)
    out = tmp_path / "big.sz"
    dec = tmp_path / "big.out"
    assert main([
        "compress", str(src), "-o", str(out), "--verify", "-q",
        "--backend", _backend(),
    ]) == 0
    assert main([
        "decompress", str(out), "-o", str(dec), "-q", "--backend", _backend(),
    ]) == 0
    assert dec.read_bytes() == data
    # the streamed output is a valid framed stream for the oracle too
    from snappy_tpu.spec import framing

    assert framing.decompress_framed(out.read_bytes()) == data


def test_streaming_meter_records(tmp_path, rng, monkeypatch):
    """The progress meter is wired through the streaming path."""
    import importlib

    cli_main = importlib.import_module("snappy_tpu.cli.main")
    from snappy_tpu.utils import progress

    events = []

    class Recorder(progress.Meter):
        def start(self, label, total):
            events.append(("start", label, total))

        def set(self, done):
            events.append(("set", done))

        def finish(self):
            events.append(("finish",))

    monkeypatch.setattr(cli_main, "STREAM_THRESHOLD", 50_000)
    monkeypatch.setattr(cli_main, "_SLAB", 64 << 10)
    monkeypatch.setattr(cli_main, "_make_meter", lambda args: Recorder())
    src = tmp_path / "m.bin"
    src.write_bytes(rng.randbytes(200_000))
    out = tmp_path / "m.sz"
    assert main([
        "compress", str(src), "-o", str(out), "-q", "--backend", _backend(),
    ]) == 0
    starts = [e for e in events if e[0] == "start"]
    sets = [e for e in events if e[0] == "set"]
    assert starts and starts[0][2] == 200_000
    assert sets and sets[-1][1] == 200_000
    assert ("finish",) in events


def test_pipe_streaming_roundtrip(rng, tmp_path):
    """UNIX piping: `compress - -` / `decompress - -` stream framed
    bytes through stdin/stdout with bounded memory; raw streams on the
    auto path are detected by the magic peek."""
    import subprocess
    import sys

    data = b"pipe me " * 40000 + rng.randbytes(50_000)
    env = dict(__import__("os").environ, JAX_PLATFORMS="cpu")
    c = subprocess.run(
        [sys.executable, "-m", "snappy_tpu.cli", "compress", "-", "-o",
         "-", "-q"],
        input=data, capture_output=True, env=env, cwd="/root/repo")
    assert c.returncode == 0, c.stderr[-300:]
    assert c.stdout[:10] == b"\xff\x06\x00\x00sNaPpY"
    d = subprocess.run(
        [sys.executable, "-m", "snappy_tpu.cli", "decompress", "-",
         "-o", "-", "-q"],
        input=c.stdout, capture_output=True, env=env, cwd="/root/repo")
    assert d.returncode == 0, d.stderr[-300:]
    assert d.stdout == data
    # raw stream through the same pipe path (magic peek routes it)
    from snappy_tpu import native
    raw = native.compress(data) if native.available() else None
    if raw is not None:
        d = subprocess.run(
            [sys.executable, "-m", "snappy_tpu.cli", "decompress", "-",
             "-o", "-", "-q"],
            input=raw, capture_output=True, env=env, cwd="/root/repo")
        assert d.returncode == 0, d.stderr[-300:]
        assert d.stdout == data
    # --verify on a pipe is refused, not silently skipped
    v = subprocess.run(
        [sys.executable, "-m", "snappy_tpu.cli", "compress", "-", "-o",
         "-", "--verify", "-q"],
        input=data, capture_output=True, env=env, cwd="/root/repo")
    assert v.returncode == 2


def test_info_shows_checkpoint_manifest(tmp_path):
    import io
    import contextlib

    import jax
    import numpy as np

    from snappy_tpu import checkpoint
    from snappy_tpu.cli.main import main

    p = tmp_path / "w.sz"
    p.write_bytes(checkpoint.save_array(
        jax.device_put(np.arange(1000, dtype=np.int32))))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["info", str(p)]) == 0
    out = buf.getvalue()
    assert "checkpoint:" in out and "int32" in out and "[1000]" in out
