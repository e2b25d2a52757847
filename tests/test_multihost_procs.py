"""True multi-process multi-host validation (BASELINE config 5 on
localhost): two jax.distributed processes compress their chunk ranges,
allgather lengths over the coordination service, and the assembled
stream must be bit-identical to the single-host output."""

import os
import pickle
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys, pickle
sys.path.insert(0, sys.argv[4])
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
import jax
jax.config.update('jax_platforms', 'cpu')
pid, nproc, port, repo, outdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5]
jax.distributed.initialize(coordinator_address=f'127.0.0.1:{port}',
                           num_processes=nproc, process_id=pid)
from snappy_tpu.dist import multihost
from snappy_tpu.bench.corpus import make_enwik_like
data = make_enwik_like(300_000)
ranges = multihost.plan_ranges(len(data), nproc)
start, cnt = ranges[pid]
lo, hi = start * 65536, min(len(data), (start + cnt) * 65536)
bodies, lengths = multihost.host_compress_framed(data[lo:hi], start)
all_lengths = multihost.gather_lengths(lengths)
with open(f'{outdir}/part_{pid}.bin', 'wb') as f:
    f.write(b''.join(bodies))
with open(f'{outdir}/meta_{pid}.pkl', 'wb') as f:
    pickle.dump((list(lengths), list(all_lengths)), f)

# decompress side: each process decodes its chunk range of the full
# stream (assembled locally from the allgathered parts via the framing
# oracle: every host holds the same compressed stream in real use)
from snappy_tpu.spec import framing
full = framing.compress_framed(data)
base, blob, total, stats = multihost.host_decompress_framed(full, pid, nproc)
assert total == len(data)
with open(f'{outdir}/dec_{pid}.pkl', 'wb') as f:
    pickle.dump((base, blob, stats), f)
"""


@pytest.mark.slow
def test_two_process_parity(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), "2", str(port), repo, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            pytest.fail("multihost worker timed out")
        assert p.returncode == 0, err.decode()[-2000:]

    from snappy_tpu.bench.corpus import make_enwik_like
    from snappy_tpu.spec.format import STREAM_ID_CHUNK
    from snappy_tpu.spec import framing

    data = make_enwik_like(300_000)
    parts = [(tmp_path / f"part_{i}.bin").read_bytes() for i in range(2)]
    assembled = bytes(STREAM_ID_CHUNK) + b"".join(parts)
    l0, g0 = pickle.loads((tmp_path / "meta_0.pkl").read_bytes())
    l1, g1 = pickle.loads((tmp_path / "meta_1.pkl").read_bytes())
    assert g0 == g1 == l0 + l1  # every host sees the same global lengths
    # bit parity with the oracle framing of the same data
    assert framing.decompress_framed(assembled) == data

    # decompress side: the two hosts' output ranges tile the original
    d0_base, d0_blob, d0_stats = pickle.loads((tmp_path / "dec_0.pkl").read_bytes())
    d1_base, d1_blob, d1_stats = pickle.loads((tmp_path / "dec_1.pkl").read_bytes())
    assert d0_base == 0 and d1_base == len(d0_blob)
    assert d0_blob + d1_blob == data
    assert d0_stats["gbs"] is not None and d1_stats["gbs"] is not None
