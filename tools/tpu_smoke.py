"""On-TPU runtime smoke: drive the PRODUCTION framed paths end to end
on the real chip (engine auto-selection included), verify bytes, ratio
bound, and the error surface.  The CPU test suite covers these paths in
interpret mode; this is the operational check that the deployed engine
ladder works on hardware.

Usage: python tools/tpu_smoke.py [mbytes]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from snappy_tpu.utils.jaxcache import setup_compilation_cache

setup_compilation_cache()

import jax

from snappy_tpu import native
from snappy_tpu.bench.corpus import make_corpus
from snappy_tpu.errors import ChecksumError
from snappy_tpu.runtime import device_codec

mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
print("devices:", jax.devices(), flush=True)
assert jax.devices()[0].platform == "tpu", "not on TPU"

files = make_corpus(mb << 20, seed=21)
data = b"".join(d for _, d in files)
rng = np.random.default_rng(0)
data += rng.integers(0, 256, 300000).astype(np.uint8).tobytes()  # raw tail

t0 = time.perf_counter()
blob = device_codec.compress_framed(data)
t_c = time.perf_counter() - t0
ref = native.compress_framed(data)
print(f"compress: {len(data)} -> {len(blob)} bytes "
      f"({len(data)/1e9/t_c:.3f} GB/s e2e) ratio_le_native="
      f"{len(blob) <= len(ref)}", flush=True)
assert len(blob) <= len(ref), "ratio bound violated vs native emission"

t0 = time.perf_counter()
out = device_codec.decompress_framed(blob)
t_d = time.perf_counter() - t0
print(f"decompress: {len(blob)} -> {len(out)} bytes "
      f"({len(data)/1e9/t_d:.3f} GB/s e2e) exact={out == data}", flush=True)
assert out == data, "roundtrip mismatch"

# cross-check against the native host decoder
assert native.decompress_framed(blob) == data, "native cross-decode failed"

# error surface: flip one payload byte -> ChecksumError from device CRC
bad = bytearray(blob)
bad[20] ^= 0x40
try:
    device_codec.decompress_framed(bytes(bad))
    raise AssertionError("corrupted stream accepted")
except ChecksumError:
    print("checksum error surfaced OK", flush=True)
except Exception as e:  # CorruptError acceptable if structure broke
    print(f"corruption surfaced as {type(e).__name__} (OK)", flush=True)

print("TPU SMOKE OK", flush=True)
