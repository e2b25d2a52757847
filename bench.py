#!/usr/bin/env python
"""Driver benchmark entry point: prints ONE JSON line.

Runs the framed codec over the synthetic Silesia corpus on the default
platform (the real TPU chip under axon; CPU if forced) and reports
decompress GB/s/chip as the headline metric, with compress GB/s, ratio,
and ratio-parity fields alongside.  vs_baseline is value / 20 GB/s (the
BASELINE north-star decompress target).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    size = int(os.environ.get("SNAPPY_TPU_BENCH_BYTES", str(64 << 20)))
    repeats = int(os.environ.get("SNAPPY_TPU_BENCH_REPEATS", "3"))
    from snappy_tpu.bench.harness import run_bench

    result = run_bench(size=size, repeats=repeats)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
