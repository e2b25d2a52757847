"""Subprocess entry: scaling bench on a virtual 8-device CPU mesh.

The build host exposes one real TPU chip; BASELINE config 4 (>=85%
linear GB/s scaling) still needs *evidence on some backend* every round.
When the main bench runs with <2 devices, it shells out here to measure
DP-block scaling on an 8-device virtual CPU mesh, and labels the result
`scaling_platform: "cpu-virtual"` (honest accounting, SURVEY.md §7.3.7).

Must run as its own process: platform/device-count selection has to
happen before any jax backend initializes, and the parent already holds
a live TPU backend.
"""

import json
import os
import sys


def main() -> int:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    # sitecustomize pins JAX_PLATFORMS=axon; the config override is the
    # only reliable switch (see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    from snappy_tpu.bench.harness import scaling_bench

    out = scaling_bench(virtual=True)
    out["scaling_platform"] = "cpu-virtual"
    print("SCALING_JSON " + json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
