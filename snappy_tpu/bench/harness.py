"""Benchmark harness: honest GB/s accounting per BASELINE.

Measures wall-clock per operation including host<->device staging
(SURVEY.md §7.3.7), after one warmup pass (first-compile excluded, as is
standard for jit benchmarks).  Also reports device-resident op time and
ratio parity vs the reference codec.
"""

from __future__ import annotations

import os
import time

import numpy as np

from snappy_tpu.utils.hostmem import tune_allocator, warm_heap


def _load_corpus(size: int, corpus_path: str | None):
    if corpus_path and os.path.isdir(corpus_path):
        files = []
        for name in sorted(os.listdir(corpus_path)):
            p = os.path.join(corpus_path, name)
            if os.path.isfile(p):
                with open(p, "rb") as f:
                    files.append((name, f.read()))
        if files:
            return files
    from snappy_tpu.bench.corpus import make_corpus

    return make_corpus(size)


def _ref_sizes(files) -> dict[str, int]:
    """Reference compressed sizes: external C++ snappy if present, else
    our native reference implementation."""
    sizes = {}
    try:
        import pyarrow as pa

        for name, data in files:
            sizes[name] = len(pa.compress(data, codec="snappy", asbytes=True))
        return sizes
    except Exception:
        pass
    from snappy_tpu import native

    if native.available():
        for name, data in files:
            sizes[name] = len(native.compress(data))
    return sizes


def run_bench(
    size: int = 64 << 20,
    backend: str | None = None,
    corpus_path: str | None = None,
    repeats: int = 3,
) -> dict:
    tune_allocator()
    warm_heap(min(2 * size + (64 << 20), 1 << 31))

    from snappy_tpu import api

    backend = backend or os.environ.get("SNAPPY_TPU_BACKEND") or "jnp"
    files = _load_corpus(size, corpus_path)
    total = sum(len(d) for _, d in files)

    # -- compress (timed per file, summed) --------------------------------
    framed: list[bytes] = []
    comp_t = 0.0
    # warmup on first file (jit compile; excluded from timing)
    api.compress_framed(files[0][1][: 1 << 20], backend=backend)
    for _, data in files:
        t0 = time.perf_counter()
        framed.append(api.compress_framed(data, backend=backend))
        comp_t += time.perf_counter() - t0
    for r in range(repeats - 1):
        for i, (_, data) in enumerate(files):
            t0 = time.perf_counter()
            api.compress_framed(data, backend=backend)
            comp_t += time.perf_counter() - t0
    comp_gbs = total * repeats / 1e9 / comp_t

    # -- decompress -------------------------------------------------------
    api.decompress_framed(framed[0], backend=backend)  # warmup
    dec_t = 0.0
    for r in range(repeats):
        for i, blob in enumerate(framed):
            t0 = time.perf_counter()
            out = api.decompress_framed(blob, backend=backend)
            dec_t += time.perf_counter() - t0
            if r == 0:
                assert out == files[i][1], f"round-trip mismatch on {files[i][0]}"
    dec_gbs = total * repeats / 1e9 / dec_t

    # -- ratio parity -----------------------------------------------------
    ref_sizes = _ref_sizes(files)
    ours_raw = {}
    for name, data in files:
        ours_raw[name] = len(api.compress(data, backend=backend))
    ratio_ok = all(
        ours_raw[name] <= ref_sizes.get(name, ours_raw[name]) for name, _ in files
    )
    ratio = total / max(sum(ours_raw.values()), 1)

    return {
        "metric": "synthetic_silesia_decompress",
        "value": round(dec_gbs, 4),
        "unit": "GB/s/chip",
        "vs_baseline": round(dec_gbs / 20.0, 4),
        "compress_gbs": round(comp_gbs, 4),
        "compress_vs_baseline": round(comp_gbs / 5.0, 4),
        "ratio": round(ratio, 4),
        "ratio_le_reference_all_files": bool(ratio_ok),
        "corpus_bytes": total,
        "backend": backend,
        "files": len(files),
    }
