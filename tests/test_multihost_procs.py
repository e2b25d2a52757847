"""True multi-process multi-host validation (BASELINE config 5 on
localhost): two jax.distributed processes drive the documented module
entry point (`python -m snappy_tpu.dist.multihost`) end to end —
compress their chunk ranges into one output file, then decompress it —
and the results must be bit-identical to the single-host oracle."""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_cli(repo, command, infile, outfile, extra=()):
    """Launch the module CLI once per 'host' and return the parsed
    per-host stats lines."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "snappy_tpu.dist.multihost",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(i),
             "--platform", "cpu", *extra,
             command, str(infile), str(outfile)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    stats = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            pytest.fail("multihost worker timed out")
        assert p.returncode == 0, err.decode()[-2000:]
        # Scan from the end for the stats JSON line — under a loaded
        # machine, stray warnings can interleave with stdout.
        for line in reversed(out.decode().strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    stats.append(json.loads(line))
                    break
                except json.JSONDecodeError:
                    continue
        else:
            pytest.fail("no stats JSON line in worker stdout: %r" % out[-500:])
    return stats


@pytest.mark.slow
def test_two_process_cli_parity(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from snappy_tpu.bench.corpus import make_enwik_like
    from snappy_tpu.spec import framing

    data = make_enwik_like(300_000)
    infile = tmp_path / "in.bin"
    infile.write_bytes(data)
    sz = tmp_path / "out.sz"
    dec = tmp_path / "out.bin"

    stats = _run_cli(repo, "compress", infile, sz)
    assert sorted(s["host"] for s in stats) == [0, 1]
    assert all(s["gbs"] is not None for s in stats)
    assert sum(s["chunks"] for s in stats) == (len(data) + 65535) // 65536
    # bit parity with the oracle framing of the same data
    assembled = sz.read_bytes()
    assert framing.decompress_framed(assembled) == data

    stats = _run_cli(repo, "decompress", sz, dec)
    assert sorted(s["host"] for s in stats) == [0, 1]
    assert all(s["gbs"] is not None for s in stats)
    assert dec.read_bytes() == data
