#!/usr/bin/env python
"""Driver benchmark entry point: prints ONE JSON line.

Runs the framed codec over the synthetic Silesia corpus and reports
decompress GB/s/chip as the headline metric (device-resident timing),
with end-to-end, compress, ratio-parity, and scaling fields alongside.
vs_baseline is value / 20 GB/s (the BASELINE north-star decompress
target).

Relay resilience (round-2): the TPU behind the axon relay wedges
spontaneously for ~30-60 min windows.  The probe now retries with
backoff across a configurable window (SNAPPY_TPU_BENCH_RETRY_S, default
900 s) before falling back to CPU; every successful TPU bench persists
its result to BENCH_LASTGOOD_TPU.json, and a CPU-fallback run embeds
that last-good TPU result (timestamped) so the round's number of record
is never blind to the chip.
"""

import json
import os
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _ROOT)

_LASTGOOD = os.path.join(_ROOT, "BENCH_LASTGOOD_TPU.json")
_BEST = os.path.join(_ROOT, "BENCH_BEST_TPU.json")

_PROBE = (
    "import jax, jax.numpy as jnp, numpy as np;"
    "x = jnp.ones((128, 128));"
    "print('ALIVE', float(np.asarray((x @ x)[0, 0])))"
)


def _note(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _device_alive(timeout_s: int = 180) -> bool:
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE],
            capture_output=True,
            timeout=timeout_s,
            text=True,
        )
        return "ALIVE" in r.stdout
    except Exception:
        return False


def _device_alive_with_retry() -> bool:
    """Probe the relay across the wedge window: immediate first try,
    then backoff until SNAPPY_TPU_BENCH_RETRY_S is exhausted."""
    window = int(os.environ.get("SNAPPY_TPU_BENCH_RETRY_S", "900"))
    deadline = time.time() + window
    delay = 60
    attempt = 1
    while True:
        if _device_alive():
            return True
        left = deadline - time.time()
        if left <= 0:
            return False
        _note(
            f"TPU probe {attempt} failed; retrying in {min(delay, left):.0f}s "
            f"({left:.0f}s left in retry window)"
        )
        time.sleep(min(delay, left))
        delay = min(delay * 2, 240)
        attempt += 1


def _git_head() -> str:
    try:
        r = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=_ROOT, timeout=10,
        )
        return r.stdout.strip()
    except Exception:
        return ""


def main() -> int:
    size = int(os.environ.get("SNAPPY_TPU_BENCH_BYTES", str(32 << 20)))
    repeats = int(os.environ.get("SNAPPY_TPU_BENCH_REPEATS", "2"))

    platform = os.environ.get("JAX_PLATFORMS", "default")
    fallback = False
    if platform == "cpu":
        # honor an explicit CPU request: sitecustomize pins the axon
        # platform, so the env var alone does NOT stick — force it via
        # jax.config before any backend init (else a "cpu" smoke run
        # silently lands on the TPU and overwrites BENCH_LASTGOOD)
        import jax

        jax.config.update("jax_platforms", "cpu")
    if platform != "cpu" and not _device_alive_with_retry():
        fallback = True
        # virtual 8-device mesh so the CPU fallback still produces a
        # non-null scaling figure (the flag must precede backend init)
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    from snappy_tpu.bench.harness import run_bench

    result = run_bench(size=size, repeats=repeats)
    import jax

    result["platform"] = jax.devices()[0].platform
    if fallback:
        result["platform_note"] = (
            "TPU relay unresponsive through the retry window; "
            "measured on CPU fallback"
        )
        try:
            with open(_LASTGOOD) as f:
                result["last_good_tpu"] = json.load(f)
        except Exception:
            pass
    elif result["platform"] != "cpu":
        snap = dict(result)
        snap["captured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        snap["git_head"] = _git_head()
        try:
            with open(_LASTGOOD, "w") as f:
                json.dump(snap, f, indent=1)
        except Exception:
            pass
        # best-of-round snapshot: relay-window variance moves the
        # headline 10-20% run to run (see *_relay_sync_ms), so the
        # freshest capture (LASTGOOD) is kept separately from the
        # best honest one (timestamped + git-pinned, same JSON shape)
        try:
            best_val = -1.0
            try:
                with open(_BEST) as f:
                    best_val = float(json.load(f).get("value", -1.0))
            except Exception:
                pass
            if float(snap.get("value", 0.0)) > best_val:
                with open(_BEST, "w") as f:
                    json.dump(snap, f, indent=1)
        except Exception:
            pass
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
