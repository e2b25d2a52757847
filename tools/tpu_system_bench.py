#!/usr/bin/env python
"""Run ONLY the system phase on the real TPU (fast iteration on the
fused/pipelined clock without the 40-minute full bench).

Usage: python tools/tpu_system_bench.py [--mb 32] [--repeats 2]
Env: SNAPPY_TPU_BENCH_SYS{BYTES,BATCH}, SNAPPY_TPU_BENCH_SYS_REPS,
SNAPPY_TPU_SYS_COUPLED (default on), SNAPPY_TPU_BENCH_STREAM=0 to
skip nothing here (the stream phase is not part of this driver).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=32,
                    help="corpus MB to build (system volume rides "
                         "SNAPPY_TPU_BENCH_SYSBYTES, default 256 MB)")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    import jax

    print("platform:", jax.default_backend(), file=sys.stderr)
    from snappy_tpu.bench import harness
    from snappy_tpu.bench.corpus import make_corpus

    data = b"".join(d for _, d in make_corpus(args.mb << 20))
    out = harness._system_path_bench(data, repeats=args.repeats)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
