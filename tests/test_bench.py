"""Bench harness: corpus determinism, ratio-parity accounting,
scaling_bench on the virtual mesh, and the CLI bench smoke the r1
VERDICT flagged as missing."""

import json

import pytest

from snappy_tpu.bench import corpus, harness


def test_corpus_deterministic():
    a = corpus.make_corpus(1 << 20)
    b = corpus.make_corpus(1 << 20)
    assert [n for n, _ in a] == [n for n, _ in b]
    assert all(x == y for (_, x), (_, y) in zip(a, b))
    total = sum(len(d) for _, d in a)
    assert total >= (1 << 20) * 0.95  # sized approximately, by design


def test_corpus_mixed_compressibility():
    files = corpus.make_corpus(2 << 20)
    from snappy_tpu.spec import reference

    ratios = []
    for _, d in files:
        ratios.append(len(d) / len(reference.compress(d)))
    # a Silesia-like corpus must span compressible and incompressible
    assert max(ratios) > 2.0
    assert min(ratios) < 1.2


def test_enwik_like_shape():
    d = corpus.make_enwik_like(300_000)
    assert len(d) == 300_000
    assert corpus.make_enwik_like(300_000) == d


def test_ref_sizes_uses_external_oracle():
    files = [("a", b"compress me " * 1000), ("b", b"\x00" * 5000)]
    sizes = harness._ref_sizes(files)
    assert set(sizes) == {"a", "b"}
    assert 0 < sizes["a"] < len(files[0][1])


def test_scaling_bench_virtual_mesh():
    # conftest provides the 8-device CPU mesh: must return a non-null
    # efficiency (the r1 bench shipped null — VERDICT missing #5)
    out = harness.scaling_bench(repeats=1, virtual=True, flat=False)
    assert out["scaling_devices"] == 8
    assert out["scaling_efficiency"] is not None
    assert 0 < out["scaling_efficiency"] <= 1.0
    assert "scaling_note" in out


def test_cli_bench_smoke(capsys):
    from snappy_tpu.cli.main import main

    rc = main(["bench", "--size", str(1 << 20), "--backend", "native"])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(line)
    assert result["unit"] == "GB/s/chip"
    assert result["ratio_le_reference_all_files"] is True
    assert result["e2e_bytes"] > 0
    assert result["value"] > 0


def test_run_bench_device_backend_small(monkeypatch):
    # tiny end-to-end pass through run_bench on the jnp backend: the
    # device phase must produce the device_* fields on the CPU mesh
    monkeypatch.setenv("SNAPPY_TPU_BENCH_E2E_CAP", str(1 << 20))
    monkeypatch.setenv("SNAPPY_TPU_BENCH_DEVBATCH", "8")
    out = harness.run_bench(size=1 << 20, backend="jnp", repeats=1)
    assert out["backend"] == "jnp"
    assert out["e2e_decompress_gbs"] > 0
    assert "device_decompress_gbs" in out
    assert out["ratio_le_reference_all_files"] is True


def test_system_path_bench_small():
    """The system phase (pipelined host plan + device execute, VERDICT
    r2 #2) runs tiny-scale in interpret mode: both directions produce
    positive GB/s and the device CRC barrier holds (a staging race or
    plan corruption would fail the phase, not mis-time it)."""
    native = pytest.importorskip("snappy_tpu.native")
    if not native.available():
        pytest.skip("native library unavailable")
    data = b"".join(d for _, d in corpus.make_corpus(300_000, seed=5))
    out = harness._system_path_bench(
        data, repeats=1, sysbytes=4 * 65536, batch=2, interpret=True)
    assert out["system_decompress_gbs"] > 0
    assert out["system_compress_gbs"] > 0
    assert out["system_bytes"] == 4 * 65536  # 2 batches: set rotation
