"""Parallel Snappy block encoder — jax/XLA implementation.

The jnp mirror of kernels/encode_np.py (identical algorithm contract,
shape-static, batched, jit-able).  Per block:

  1. match finding: 4-gram words -> stable sort -> candidates
     {prev1, prev2, first-occurrence} -> unbounded LCP via paired-u32
     Rabin-Karp prefix hashes + 17-step vectorized binary search
  2. parse: greedy and lazy successor walks marked by pointer doubling,
     two simultaneous-drop prune passes, per-block smaller emission wins
  3. emission: elements -> chop atoms -> per-byte formulas, all via
     scan/scatter/gather (reference chopping rules exactly)
  4. exact verification of every copy byte (one gather-compare); blocks
     that fail (hash collision, ~2^-64) report ok=False and the host
     re-encodes them with the oracle.

Static shapes derive from BMAX (block capacity); everything is vmapped
over a [B, BMAX] batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from snappy_tpu.kernels.common_jnp import (
    _pow_tables,
    bytes_to_u32_words,
    exclusive_cumsum,
    mark_orbits2,
    prefix_hashes,
    shifted,
)

__all__ = ["encode_blocks", "encode_block_jnp"]

_I32MAX = np.int32(0x7FFFFFFF)


def _derived_sizes(bmax: int):
    cp_max = bmax // 4 + 2
    atom_max = cp_max + bmax // 64 + bmax // 65 + cp_max + 8
    emax = bmax + bmax // 6 + 64
    return cp_max, atom_max, emax


def _lit_cost_v(r):
    """Vector literal emission cost; r == 0 -> 0."""
    extras = (
        (r - 1 >= 60).astype(jnp.int32)
        + (r - 1 >= 256).astype(jnp.int32)
        + (r - 1 >= 65536).astype(jnp.int32)
    )
    return jnp.where(r > 0, r + 1 + extras, 0)


def _copy_chops(off, length):
    """Vectorized reference chopping: returns (c64, e60, remf, cost)."""
    c64 = jnp.where(length >= 68, (length - 68) // 64 + 1, 0)
    rem1 = length - 64 * c64
    e60 = (rem1 > 64).astype(jnp.int32)
    remf = rem1 - 60 * e60
    final_cost = jnp.where((remf >= 12) | (off >= 2048), 3, 2)
    cost = 3 * c64 + 3 * e60 + final_cost
    return c64, e60, remf, jnp.where(length >= 4, cost, 0)


def _find_matches(block_u8, n, bmax: int):
    """Best candidate + certified match length per position."""
    w = bytes_to_u32_words(block_u8)
    pos = jnp.arange(bmax, dtype=jnp.int32)
    valid = pos < n - 3

    skey = jax.lax.bitcast_convert_type(w ^ jnp.uint32(0x80000000), jnp.int32)
    skey = jnp.where(valid, skey, _I32MAX)
    order = jnp.argsort(skey, stable=True).astype(jnp.int32)
    sv = skey[order]

    same1 = jnp.concatenate([jnp.array([False]), sv[1:] == sv[:-1]])
    same2 = jnp.concatenate([jnp.array([False, False]), sv[2:] == sv[:-2]])
    grp_start = jnp.where(~same1, jnp.arange(bmax, dtype=jnp.int32), 0)
    grp_start = jax.lax.cummax(grp_start)
    first_sorted = order[grp_start]

    z = jnp.zeros(1, jnp.int32)
    prev1_s = jnp.where(same1, jnp.concatenate([z, order])[:bmax], -1)
    prev2_s = jnp.where(same2, jnp.concatenate([z, z, order])[:bmax], -1)
    first_s = jnp.where(same1, first_sorted, -1)

    def unsort(x):
        return jnp.zeros(bmax, jnp.int32).at[order].set(x)

    cands = (unsort(prev1_s), unsort(prev2_s), unsort(first_s))

    ha, hb = prefix_hashes(block_u8)
    pa_, ipa, pb_, ipb = _pow_tables()
    ripa = jnp.asarray(ipa[: bmax + 1])
    ripb = jnp.asarray(ipb[: bmax + 1])

    # Normalized hashes: G[i] = H[i] * R^-i.  Substring equality
    # [p,p+m) == [c,c+m)  <=>  G[p+m]-G[p] == R^(c-p) * (G[c+m]-G[c]),
    # so the hot loop needs only TWO row gathers per step (the stacked
    # (a,b) hash pair), no power-table gathers.  All arithmetic is
    # mod-2^32 (i32 bit-identical), decisions identical to the direct
    # formulation — the np/jnp byte contract is unchanged.
    ga = jax.lax.bitcast_convert_type(ha * ripa, jnp.int32)
    gb = jax.lax.bitcast_convert_type(hb * ripb, jnp.int32)
    G = jnp.stack([ga, gb], axis=-1)  # [bmax+1, 2]

    maxm = jnp.maximum(n - pos, 0)

    # All three candidates share one stacked binary search ([3, bmax]):
    # same decisions as three separate searches, a third of the gather
    # dispatches (gathers are the expensive primitive).
    C = jnp.stack(cands)  # [3, bmax]
    CV = valid[None, :] & (C >= 0) & (C < n - 3)
    CC = jnp.clip(C, 0, bmax - 1)
    pos3 = jnp.broadcast_to(pos, C.shape)
    maxm3 = jnp.broadcast_to(maxm, C.shape)
    G0p = G[pos3]
    G0c = G[CC]
    dist = jnp.clip(pos3 - CC, 0, bmax)  # p - c >= 1 for real candidates
    fac = jnp.stack(
        [
            jax.lax.bitcast_convert_type(ripa[dist], jnp.int32),
            jax.lax.bitcast_convert_type(ripb[dist], jnp.int32),
        ],
        axis=-1,
    )

    def step(i, lo):
        # k = 16 - i; fori_loop keeps the HLO small (compile time)
        trial = lo + (jnp.int32(1) << (16 - i))
        ok = (trial <= maxm3) & CV
        t = jnp.minimum(trial, maxm3)
        Gp = G[jnp.clip(pos3 + t, 0, bmax)]
        Gc = G[jnp.clip(CC + t, 0, bmax)]
        eq2 = (Gp - G0p) == fac * (Gc - G0c)
        eq = eq2[..., 0] & eq2[..., 1] & ok
        return jnp.where(eq, trial, lo)

    ml3 = jax.lax.fori_loop(0, 17, step, jnp.full(C.shape, 4, dtype=jnp.int32))
    ml3 = jnp.where(CV, ml3, 0)

    best_c = jnp.full(bmax, -1, dtype=jnp.int32)
    best_l = jnp.zeros(bmax, dtype=jnp.int32)
    for k in range(3):
        c, mlk, cvalid = C[k], ml3[k], CV[k]
        better = mlk > best_l
        tie = (mlk == best_l) & (c > best_c) & cvalid
        upd = better | tie
        best_c = jnp.where(upd, c, best_c)
        best_l = jnp.where(upd, mlk, best_l)
    best_l = jnp.where(best_c >= 0, best_l, 0)
    return best_c, best_l


def _parse_masks(cand, ml, n, bmax: int):
    """Taken-copy masks for BOTH strategies via one fused orbit loop."""
    pos = jnp.arange(bmax, dtype=jnp.int32)
    ml_next = shifted(ml, 1)
    takeable_g = (ml >= 4) & (pos >= 1) & (pos < n)
    defer = ml_next > ml + 1
    takeable_l = takeable_g & ~defer
    nxt_g = jnp.minimum(pos + jnp.where(takeable_g, ml, 1), bmax)
    nxt_l = jnp.minimum(pos + jnp.where(takeable_l, ml, 1), bmax)
    marks = mark_orbits2(jnp.stack([nxt_g, nxt_l]), jnp.int32(1), 17)
    return marks[0] & takeable_g, marks[1] & takeable_l


def _parse(taken, cand, ml, n, bmax: int, cp_max: int):
    """Compaction + prune + alignment + size for one strategy's taken
    mask (see _parse_masks)."""
    pos = jnp.arange(bmax, dtype=jnp.int32)

    def compact(keep_mask, kpos, klen, koff, from_positions: bool):
        if from_positions:
            ci = jnp.cumsum(keep_mask.astype(jnp.int32)) - 1
            tgt = jnp.where(keep_mask, ci, cp_max)
            cpos = jnp.full(cp_max, jnp.int32(bmax)).at[tgt].set(pos, mode="drop")
            clen = jnp.zeros(cp_max, jnp.int32).at[tgt].set(ml, mode="drop")
            coff = jnp.ones(cp_max, jnp.int32).at[tgt].set(pos - cand, mode="drop")
            return cpos, clen, coff, jnp.sum(keep_mask.astype(jnp.int32))
        ci = jnp.cumsum(keep_mask.astype(jnp.int32)) - 1
        tgt = jnp.where(keep_mask, ci, cp_max)
        cpos = jnp.full(cp_max, jnp.int32(bmax)).at[tgt].set(kpos, mode="drop")
        clen = jnp.zeros(cp_max, jnp.int32).at[tgt].set(klen, mode="drop")
        coff = jnp.ones(cp_max, jnp.int32).at[tgt].set(koff, mode="drop")
        return cpos, clen, coff, jnp.sum(keep_mask.astype(jnp.int32))

    cpos, clen, coff, nc = compact(taken, None, None, None, True)

    kidx = jnp.arange(cp_max, dtype=jnp.int32)
    for _ in range(2):  # simultaneous-drop prune passes
        cvalid = kidx < nc
        pend = jnp.where(cvalid, cpos + clen, bmax)
        prev_end = jnp.concatenate([jnp.zeros(1, jnp.int32), pend])[:cp_max]
        a = jnp.where(cvalid, cpos - prev_end, 0)
        next_start = jnp.concatenate([cpos[1:], jnp.full(1, jnp.int32(bmax))])
        next_start = jnp.where(kidx + 1 < nc, next_start, n)
        b_gap = jnp.where(cvalid, next_start - pend, 0)
        prev_is_copy = (a == 0) & (kidx > 0)
        next_is_copy = (b_gap == 0) & (kidx + 1 < nc)
        _, _, _, ccost = _copy_chops(coff, clen)
        elig = (
            cvalid
            & ~prev_is_copy
            & ~next_is_copy
            # <= (not <): see encode_np._prune - tied drops merge literals
            & (_lit_cost_v(a + clen + b_gap) <= _lit_cost_v(a) + ccost + _lit_cost_v(b_gap))
        )
        keep = cvalid & ~elig
        cpos, clen, coff, nc = compact(keep, cpos, clen, coff, False)

    # start-shift alignment pass (see encode_np._shift_starts): shifting
    # a copy's start by d grows the preceding literal but can drop a
    # whole chop tag; each copy decides independently (ends are fixed).
    cvalid = kidx < nc
    prev_end0 = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.where(cvalid, cpos + clen, bmax)]
    )[:cp_max]
    a0 = jnp.where(cvalid, cpos - prev_end0, 0)
    _, _, _, ccost0 = _copy_chops(coff, clen)
    best_d = jnp.zeros(cp_max, jnp.int32)
    best_cost = _lit_cost_v(a0) + ccost0
    for d in (1, 2, 3):
        ok = cvalid & (clen - d >= 4)
        _, _, _, ccost_d = _copy_chops(coff, clen - d)
        cost = _lit_cost_v(a0 + d) + ccost_d
        upd = ok & (cost < best_cost)
        best_d = jnp.where(upd, jnp.int32(d), best_d)
        best_cost = jnp.where(upd, cost, best_cost)
    cpos = jnp.where(cvalid, cpos + best_d, cpos)
    clen = jnp.where(cvalid, clen - best_d, clen)

    pend = jnp.where(cvalid, cpos + clen, 0)
    prev_end = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.where(cvalid, cpos + clen, bmax)])[:cp_max]
    a = jnp.where(cvalid, cpos - prev_end, 0)
    _, _, _, ccost = _copy_chops(coff, clen)
    covered_end = jnp.max(jnp.where(cvalid, pend, 0))
    tail = n - covered_end
    total = jnp.sum(jnp.where(cvalid, _lit_cost_v(a) + ccost, 0)) + _lit_cost_v(tail)
    return cpos, clen, coff, nc, total


def _emit(block_u8, n, cpos, clen, coff, nc, bmax: int, cp_max: int, atom_max: int, emax: int):
    """Elements -> atoms -> bytes.  Elements are, in order: for each copy
    k an optional literal gap then the copy's chop atoms; finally an
    optional tail literal.  The tail is modeled as literal element nc in
    the extended per-element arrays."""
    kidx = jnp.arange(cp_max, dtype=jnp.int32)
    cvalid = kidx < nc
    pend_raw = cpos + clen
    prev_end = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.where(cvalid, pend_raw, bmax)])[:cp_max]
    a = jnp.where(cvalid, cpos - prev_end, 0)  # literal gap before copy k
    lit_start = jnp.where(cvalid, prev_end, 0)
    covered_end = jnp.max(jnp.where(cvalid, pend_raw, 0))
    tail_len = n - covered_end

    c64, e60, remf, _ = _copy_chops(coff, clen)
    natoms_copy = jnp.where(cvalid, c64 + e60 + 1, 0)
    natoms_lit = jnp.where(cvalid & (a > 0), 1, 0)
    pair_atoms = natoms_lit + natoms_copy
    pair_base = exclusive_cumsum(pair_atoms)
    total_pair_atoms = jnp.sum(pair_atoms)
    tail_atoms = jnp.where(tail_len > 0, 1, 0)
    total_atoms = total_pair_atoms + tail_atoms

    # Extended literal arrays: slot k < cp_max = gap before copy k;
    # conceptual slot for the tail handled via owner id == 2*cp_max.
    # owner ids: even = literal element k/2; odd = copy element k//2.
    owner_seed = jnp.full(atom_max, -1, dtype=jnp.int32)
    lit_tgt = jnp.where(cvalid & (natoms_lit > 0), pair_base, atom_max)
    owner_seed = owner_seed.at[lit_tgt].max(2 * kidx, mode="drop")
    copy_tgt = jnp.where(cvalid, pair_base + natoms_lit, atom_max)
    owner_seed = owner_seed.at[copy_tgt].max(2 * kidx + 1, mode="drop")
    tail_tgt = jnp.where(tail_atoms > 0, total_pair_atoms, atom_max)
    owner_seed = owner_seed.at[tail_tgt].max(2 * cp_max, mode="drop")
    owner = jax.lax.cummax(owner_seed)
    aidx = jnp.arange(atom_max, dtype=jnp.int32)
    atom_valid = aidx < total_atoms
    owner = jnp.clip(owner, 0, 2 * cp_max)

    k = owner >> 1
    is_copy_atom = (owner & 1) == 1
    is_tail = owner == 2 * cp_max
    kc = jnp.clip(k, 0, cp_max - 1)

    # per-atom literal info
    lit_len_at = jnp.where(is_tail, tail_len, a[kc])
    lit_src_at = jnp.where(is_tail, covered_end, lit_start[kc])
    lit_extra = (
        (lit_len_at - 1 >= 60).astype(jnp.int32)
        + (lit_len_at - 1 >= 256).astype(jnp.int32)
        + (lit_len_at - 1 >= 65536).astype(jnp.int32)
    )
    lit_hdr = 1 + lit_extra

    # per-atom copy info
    copy_base = pair_base[kc] + natoms_lit[kc]
    arel = aidx - copy_base
    alen = jnp.where(
        arel < c64[kc], 64, jnp.where((e60[kc] == 1) & (arel == c64[kc]), 60, remf[kc])
    )
    afinal = arel == natoms_copy[kc] - 1
    off_at = coff[kc]
    copy1 = afinal & (alen < 12) & (off_at < 2048)
    copy_size = jnp.where(copy1, 2, 3)

    asize = jnp.where(atom_valid, jnp.where(is_copy_atom, copy_size, lit_hdr + lit_len_at), 0)
    abase = exclusive_cumsum(asize)
    total_len = jnp.sum(asize)

    # per-byte atom labeling
    bidx = jnp.arange(emax, dtype=jnp.int32)
    seed = jnp.zeros(emax, dtype=jnp.int32)
    atgt = jnp.where(atom_valid & (asize > 0), abase, emax)
    seed = seed.at[atgt].add(1, mode="drop")
    batom = jnp.clip(jnp.cumsum(seed) - 1, 0, atom_max - 1)
    brel = bidx - abase[batom]

    b_is_copy = is_copy_atom[batom]
    b_copy1 = copy1[batom]
    b_alen = alen[batom]
    b_off = off_at[batom]
    b_lit_len = lit_len_at[batom]
    b_lit_extra = lit_extra[batom]
    b_lit_hdr = lit_hdr[batom]
    b_lit_src = lit_src_at[batom]

    copy_val = jnp.where(
        b_copy1,
        jnp.where(
            brel == 0,
            ((b_off >> 8) << 5) | ((b_alen - 4) << 2) | 1,
            b_off & 255,
        ),
        jnp.select(
            [brel == 0, brel == 1],
            [((b_alen - 1) << 2) | 2, b_off & 255],
            (b_off >> 8) & 255,
        ),
    )
    lit_tag = jnp.where(b_lit_extra == 0, (b_lit_len - 1) << 2, (59 + b_lit_extra) << 2)
    lit_hdr_val = jnp.where(
        brel == 0,
        lit_tag,
        ((b_lit_len - 1) >> (8 * jnp.clip(brel - 1, 0, 3))) & 255,
    )
    lit_data = block_u8[jnp.clip(b_lit_src + brel - b_lit_hdr, 0, bmax - 1)].astype(jnp.int32)
    lit_val = jnp.where(brel < b_lit_hdr, lit_hdr_val, lit_data)

    val = jnp.where(b_is_copy, copy_val, lit_val)
    comp = jnp.where(bidx < total_len, val, 0).astype(jnp.uint8)
    return comp, total_len


def _verify(block_u8, n, cpos, clen, coff, nc, bmax: int, cp_max: int):
    """Exact byte equality of every copy (hash-certification check)."""
    kidx = jnp.arange(cp_max, dtype=jnp.int32)
    cvalid = kidx < nc
    pos = jnp.arange(bmax, dtype=jnp.int32)
    seed = jnp.full(bmax, -1, dtype=jnp.int32)
    tgt = jnp.where(cvalid, jnp.clip(cpos, 0, bmax - 1), bmax)
    seed = seed.at[tgt].max(kidx, mode="drop")
    ownr = jnp.clip(jax.lax.cummax(seed), 0, cp_max - 1)
    covered = (seed.max() >= 0) & (pos >= cpos[ownr]) & (pos < cpos[ownr] + clen[ownr]) & (pos < n)
    src = pos - coff[ownr]
    eq = block_u8[jnp.clip(src, 0, bmax - 1)] == block_u8
    struct_ok = jnp.all(~cvalid | ((coff >= 1) & (coff <= cpos) & (clen >= 4)))
    return jnp.all(~covered | (eq & (src >= 0))) & struct_ok


def _encode_one(block_u8, n, bmax: int, cp_max: int, atom_max: int, emax: int):
    cand, ml = _find_matches(block_u8, n, bmax)
    taken_g, taken_l = _parse_masks(cand, ml, n, bmax)
    g = _parse(taken_g, cand, ml, n, bmax, cp_max)
    l = _parse(taken_l, cand, ml, n, bmax, cp_max)
    use_lazy = l[4] < g[4]

    def sel(i):
        return jnp.where(use_lazy, l[i], g[i])

    cpos, clen, coff, nc = sel(0), sel(1), sel(2), jnp.where(use_lazy, l[3], g[3])
    ok = _verify(block_u8, n, cpos, clen, coff, nc, bmax, cp_max)
    comp, total_len = _emit(
        block_u8, n, cpos, clen, coff, nc, bmax, cp_max, atom_max, emax
    )
    ok = ok & (total_len <= emax)
    return comp, total_len, ok


@functools.partial(jax.jit, static_argnames=("bmax",))
def encode_blocks(block, n, bmax: int = 65536):
    """Batched parallel encode.

    block: uint8[B, bmax] padded blocks; n: int32[B] valid lengths.
    Returns (comp uint8[B, EMAX], comp_len int32[B], ok bool[B]); rows
    with ok=False must be re-encoded by the host oracle (hash-collision
    fallback, SURVEY.md §7.3.3).  Output is the element stream only (no
    varint preamble).
    """
    cp_max, atom_max, emax = _derived_sizes(bmax)
    fn = functools.partial(
        _encode_one, bmax=bmax, cp_max=cp_max, atom_max=atom_max, emax=emax
    )
    return jax.vmap(fn)(block, n)


def encode_block_jnp(block: bytes, bmax: int | None = None) -> bytes:
    """Single-block convenience wrapper (tests / small-input path)."""
    from snappy_tpu.spec import reference as _oracle

    n = len(block)
    if n == 0:
        return b""
    if bmax is None:
        bmax = 256
        while bmax < n:
            bmax *= 2
    arr = np.zeros((1, bmax), dtype=np.uint8)
    arr[0, :n] = np.frombuffer(block, dtype=np.uint8)
    comp, total_len, ok = encode_blocks(jnp.asarray(arr), jnp.array([n], jnp.int32), bmax=bmax)
    if not bool(ok[0]):  # pragma: no cover - hash collision fallback
        return _oracle.encode_block(block)
    tl = int(total_len[0])
    return bytes(np.asarray(comp[0, :tl]).tobytes())
