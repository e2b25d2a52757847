"""Round-4 design study: what does the host replay REALLY have to touch?

The r3 verdict's top item is breaking the host-planner Amdahl ceiling:
today the fused stage replays every output byte into the mirror image.
This experiment measures, per corpus block, the quantities that decide
whether a cheaper planner exists:

1. literal vs copy share of output bytes;
2. copy bytes whose source lies inside ONE literal (direct payload
   remap — no mirror byte needed) at DIRECT_T thresholds;
3. TRANSITIVE coverage: output bytes needed (directly or transitively)
   as sources of non-direct copies — the bytes a lazy replay must still
   compute;
4. origin-resolution fragmentation: resolving every copy to payload
   origins through an interval map — fragments per block, materialized
   bytes under a fragment cap K, rot (phase) spread of the pieces.

Pure measurement; no product code depends on it.  Run:
    python tools/exp_chain_coverage.py [corpus_MB]
"""

import sys
import bisect
import numpy as np

sys.path.insert(0, ".")

from snappy_tpu import native
from snappy_tpu.bench.corpus import make_corpus
from snappy_tpu.spec.format import read_uvarint

BMAX = 65536
_TMP = np.empty((34000, 4), np.int32)


def parse_block(block: bytes):
    c = native.compress(block)
    dlen, h = read_uvarint(c, 0)
    nt = native.parse_tags(c, h, dlen, _TMP)
    return np.array(_TMP[:nt]), dlen, len(c)


def study_block(recs, dlen, frag_cap=4):
    n = len(recs)
    lit_bytes = cop_bytes = 0
    direct_at = {16: 0, 64: 0, 1024: 0, 4096: 0}
    # literal intervals for direct-remap lookup
    lit_s, lit_e = [], []
    # needed intervals (sources of non-direct copies), pre-transitive
    needed = np.zeros(dlen + 1, np.int32)

    # origin map: intervals tiling [0, d) -> (kind, base); kind 0 payload
    # origin, kind 1 materialized.  Arrays parallel to starts.
    o_start, o_end, o_kind, o_base = [], [], [], []
    frags_total = 0
    mat_bytes = 0          # bytes the host must compute under the cap
    pieces = 0             # device pieces after 128-row dst splits
    rot_hist = np.zeros(128, np.int64)

    def row_pieces(b, d, L):
        nonlocal pieces
        # split at 128-byte dst rows, count rot classes like pack()
        while L > 0:
            take = min(L, 128 - (d & 127))
            base = b - (d & 127)
            rot_hist[(128 - (base & 127)) & 127] += 1
            pieces += 1
            b += take; d += take; L -= take

    def resolve(lo, hi, out):
        """Collect origin fragments covering [lo, hi) into out."""
        i = bisect.bisect_right(o_start, lo) - 1
        p = lo
        while p < hi:
            while o_end[i] <= p:
                i += 1
            take = min(hi, o_end[i]) - p
            out.append((o_kind[i], o_base[i] + (p - o_start[i]), p, take))
            p += take

    for t in range(n):
        kind, L, arg, d = (int(recs[t, 0]), int(recs[t, 1]),
                           int(recs[t, 2]), int(recs[t, 3]))
        if kind == 0:
            lit_bytes += L
            lit_s.append(d); lit_e.append(d + L)
            o_start.append(d); o_end.append(d + L)
            o_kind.append(0); o_base.append(arg)
            row_pieces(128 + arg, d, L)
            continue
        cop_bytes += L
        s0 = d - arg
        i = bisect.bisect_right(lit_s, s0) - 1
        in_lit = i >= 0 and lit_e[i] >= s0 + L
        if in_lit:
            for thr in direct_at:
                if L >= thr:
                    direct_at[thr] += L
        # transitive-coverage accounting: a non-direct copy needs its
        # source span; direct copies (>=16) need nothing extra
        if not (in_lit and L >= 16):
            needed[s0:min(s0 + L, d)] = 1  # clip self-overlap tail

        # origin resolution with fragment cap
        frs = []
        if arg >= L:
            resolve(s0, s0 + L, frs)
        else:
            resolve(s0, d, frs)  # the period; tiling multiplies pieces
            frs = frs * ((L + arg - 1) // arg)
        frags_total += len(frs)
        if len(frs) > frag_cap or arg < L:
            # materialize: host computes the L bytes into the mirror
            mat_bytes += L
            o_start.append(d); o_end.append(d + L)
            o_kind.append(1); o_base.append(0)
            row_pieces(d, d, L)  # mirror aligned -> rot 0 (base==dst phase)
        else:
            pos = d
            for fk, fb, _p, fl in frs:
                o_start.append(d + (_p - s0)) if False else None
            # insert fragments as new intervals (flatten chains to depth 1)
            pos = d
            for fk, fb, _p, fl in frs:
                o_start.append(pos); o_end.append(pos + fl)
                o_kind.append(fk); o_base.append(fb)
                row_pieces((128 + fb) if fk == 0 else fb, pos, fl)
                pos += fl

    # transitive closure of needed: walk tags backward; if any byte of a
    # copy's OUTPUT is needed, its source span becomes needed too
    for t in range(n - 1, -1, -1):
        kind, L, arg, d = (int(recs[t, 0]), int(recs[t, 1]),
                           int(recs[t, 2]), int(recs[t, 3]))
        if kind != 1:
            continue
        if needed[d:d + L].any():
            s0 = d - arg
            needed[s0:min(s0 + L, d)] = 1
    trans_needed = int(needed[:dlen].sum())

    return dict(lit=lit_bytes, cop=cop_bytes, direct=direct_at,
                needed=trans_needed, frags=frags_total, mat=mat_bytes,
                pieces=pieces, rot0=int(rot_hist[0]),
                rot_nz=int(rot_hist[1:].sum()),
                rot_distinct=int((rot_hist > 0).sum()))


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    total = int(mb * (1 << 20))
    agg = None
    nblk = 0
    per_file = {}
    for name, data in make_corpus(total, seed=23):
        for off in range(0, len(data) - BMAX + 1, BMAX):
            recs, dlen, clen = parse_block(data[off:off + BMAX])
            st = study_block(recs, dlen)
            st["tags"] = len(recs)
            st["clen"] = clen
            nblk += 1
            if agg is None:
                agg = {k: (dict(v) if isinstance(v, dict) else v)
                       for k, v in st.items()}
            else:
                for k, v in st.items():
                    if isinstance(v, dict):
                        for kk in v:
                            agg[k][kk] += v[kk]
                    else:
                        agg[k] += v
            f = per_file.setdefault(name, dict(needed=0, out=0, blocks=0,
                                               frags=0, mat=0, pieces=0))
            f["needed"] += st["needed"]; f["out"] += dlen
            f["blocks"] += 1; f["frags"] += st["frags"]
            f["mat"] += st["mat"]; f["pieces"] += st["pieces"]

    out = nblk * BMAX
    print(f"blocks={nblk}  out={out/1e6:.1f} MB  "
          f"tags/blk={agg['tags']/nblk:.0f}  ratio={out/agg['clen']:.2f}")
    print(f"literal share      {agg['lit']/out:.3f}")
    print(f"copy share         {agg['cop']/out:.3f}")
    for thr, b in sorted(agg["direct"].items()):
        print(f"direct@{thr:<5}       {b/out:.3f} of output")
    print(f"TRANSITIVE needed  {agg['needed']/out:.3f} of output "
          "(lazy-replay floor)")
    print(f"origin frags/blk   {agg['frags']/nblk:.0f}")
    print(f"materialized       {agg['mat']/out:.3f} of output (cap K=4)")
    print(f"pieces/blk         {agg['pieces']/nblk:.0f}  "
          f"(rot0 {agg['rot0']/max(agg['pieces'],1):.2f}, "
          f"distinct rots/blk {agg['rot_distinct']/nblk:.0f})")
    print("\nper file:")
    for name, f in per_file.items():
        print(f"  {name:<8} needed {f['needed']/f['out']:.3f}  "
              f"frags/blk {f['frags']/f['blocks']:.0f}  "
              f"mat {f['mat']/f['out']:.3f}  "
              f"pieces/blk {f['pieces']/f['blocks']:.0f}")


if __name__ == "__main__":
    main()
