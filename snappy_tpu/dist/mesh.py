"""Mesh construction + sharded batch codec (single-host multi-chip, and
the multi-host entry points).

Design (SURVEY.md §7.4, BASELINE configs 4-5):
  - 1-D mesh over chips ('d'); multi-host adds a 'host' dimension only
    conceptually - jax.distributed gives every process the global mesh.
  - Blocks shard over 'd' on the batch dimension via NamedSharding; the
    kernels are pure vmapped element-wise/gather pipelines, so XLA's
    SPMD partitioner runs them with zero communication.
  - Per-block compressed lengths return to the host (tiny transfer);
    output assembly is an ordered gather keyed by block index - never
    by device/collective ordering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from snappy_tpu.kernels import decode_jnp, encode_jnp
from snappy_tpu.utils.jaxcache import setup_compilation_cache

setup_compilation_cache()

__all__ = [
    "make_mesh",
    "init_distributed",
    "sharded_encode",
    "sharded_decode",
    "roundtrip_step",
]


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), ("d",))


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host runtime init (BASELINE config 5).  Call once per host
    process before building the mesh; jax.distributed wires DCN and
    makes jax.devices() global."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def _pad_to_mesh(mesh: Mesh, *arrays):
    """Pad the batch axis to a multiple of the mesh size (padding rows are
    zero-length blocks, which the kernels treat as empty)."""
    n = mesh.devices.size
    b = arrays[0].shape[0]
    rem = (-b) % n
    if rem == 0:
        return arrays, b
    padded = tuple(
        np.concatenate([a, np.zeros((rem,) + a.shape[1:], a.dtype)]) for a in arrays
    )
    return padded, b


def _shard_batch(mesh: Mesh, *arrays):
    sharding = NamedSharding(mesh, P("d"))
    return tuple(jax.device_put(a, sharding) for a in arrays)


def sharded_encode(mesh: Mesh, blocks: np.ndarray, lens: np.ndarray, bmax: int):
    """Encode a [B, bmax] batch sharded over the mesh (auto-padded to a
    multiple of the mesh size).  Returns host numpy (comp, comp_len, ok)."""
    (blocks, lens), b = _pad_to_mesh(mesh, blocks, lens)
    blocks_d, lens_d = _shard_batch(mesh, blocks, lens)
    with mesh:
        comp, clen, ok = encode_jnp.encode_blocks(blocks_d, lens_d, bmax=bmax)
    return np.asarray(comp)[:b], np.asarray(clen)[:b], np.asarray(ok)[:b]


def sharded_decode(
    mesh: Mesh,
    comp: np.ndarray,
    start: np.ndarray,
    comp_len: np.ndarray,
    dst_len: np.ndarray,
    out_max: int,
):
    """Decode a padded compressed batch sharded over the mesh."""
    (comp, start, comp_len, dst_len), b = _pad_to_mesh(
        mesh, comp, start, comp_len, dst_len
    )
    comp_d, start_d, clen_d, dlen_d = _shard_batch(mesh, comp, start, comp_len, dst_len)
    with mesh:
        out, err = decode_jnp.decode_blocks(
            comp_d, start_d, clen_d, dlen_d, out_max=out_max
        )
    return np.asarray(out)[:b], np.asarray(err)[:b]


@functools.partial(jax.jit, static_argnames=("bmax",))
def _roundtrip_jit(blocks, lens, bmax: int):
    """The full device pipeline in ONE jitted graph: parallel encode of
    every block, then parallel decode of the produced element streams,
    plus an exclusive scan of compressed lengths (the offsets the framed
    assembler uses).  This is the 'training step' equivalent the
    multi-chip dry run compiles over a mesh."""
    comp, clen, ok = encode_jnp.encode_blocks(blocks, lens, bmax=bmax)
    offsets = jnp.cumsum(clen) - clen  # exclusive scan over block lengths
    starts = jnp.zeros_like(clen)
    out, err = decode_jnp.decode_blocks(comp, starts, clen, lens, out_max=bmax)
    match = jnp.all(jnp.where(
        jnp.arange(bmax)[None, :] < lens[:, None], out == blocks, True
    ))
    return comp, clen, ok, offsets, out, err, match


def roundtrip_step(mesh: Mesh, blocks: np.ndarray, lens: np.ndarray, bmax: int):
    """Run the jitted encode->scan->decode pipeline sharded over a mesh."""
    blocks_d, lens_d = _shard_batch(mesh, blocks, lens)
    with mesh:
        return _roundtrip_jit(blocks_d, lens_d, bmax=bmax)
