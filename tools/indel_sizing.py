"""Sizing study for the r6 device indel mode (COMPONENTS "Indels ...
remain a host fallback" design note).

The host engine branches the frame at LOW-QUALITY bases
(Score_Indels, glimmer-mg.cc:1513): with default 454-synthesized
qualities (Set_Quality_454, mg.cc:1865 — a pure homopolymer-run
function), a base is a branch point iff its quality is <=
INDEL_QUALITY_THRESHOLD (18), i.e. it sits in a homopolymer run of
length >= 4. The device design enumerates depth-1 branches as
per-(branch-point, direction) candidate families and depth-2 as branch
PAIRS within one ORF, so the padded tensor sizes are set by

  * branch points per read          (depth-1 family count)
  * branch points per ORF run       (depth-2 pair count = C(k,2))

This script measures both distributions on the corpora the parity
tests use (sample-run reads + NC_000915 fragments), giving the p99 /
max capacities the device tensors need and the expected host-fallback
rate for any chosen cap.

Run: python tools/indel_sizing.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from glimmer_mg_tpu.engine.glimmer_mg import set_quality_454
from glimmer_mg_tpu.io.fasta import read_fasta


def branch_points(seq: str) -> np.ndarray:
    q = np.asarray(set_quality_454(seq.lower()), dtype=np.int64)
    return np.flatnonzero(q <= 18)  # INDEL_QUALITY_THRESHOLD


def orf_pair_counts(seq: str, bp: np.ndarray) -> list[int]:
    """Branch points per stop-free run per frame class — an upper bound
    on per-ORF depth-2 pair membership (every ORF is a subrange of its
    class's stop-free run)."""
    s = seq.lower()
    n = len(s)
    stops = {"taa", "tag", "tga"}
    out = []
    isb = np.zeros(n + 1, dtype=bool)
    isb[bp] = True
    for c in range(3):
        run = 0
        for i in range(c, n - 2, 3):
            if s[i:i + 3] in stops:
                out.append(run)
                run = 0
            else:
                run += int(isb[i]) + int(isb[i + 1]) + int(isb[i + 2])
        out.append(run)
    return out


def study(name, reads):
    per_read = []
    per_orf = []
    for seq in reads:
        bp = branch_points(seq)
        per_read.append(len(bp))
        per_orf.extend(orf_pair_counts(seq, bp))
    pr = np.asarray(per_read)
    po = np.asarray(per_orf)
    pairs = po * (po - 1) // 2
    print(f"[{name}] reads={len(pr)}")
    print(f"  branch points/read: mean={pr.mean():.1f} "
          f"p50={np.percentile(pr, 50):.0f} p99={np.percentile(pr, 99):.0f} "
          f"max={pr.max()}")
    print(f"  branch points/ORF-run: p50={np.percentile(po, 50):.0f} "
          f"p99={np.percentile(po, 99):.0f} max={po.max()}")
    print(f"  depth-2 pairs/ORF-run: p99={np.percentile(pairs, 99):.0f} "
          f"max={pairs.max()}")
    for cap in (8, 16, 32, 64):
        ovf = float((pr > cap).mean())
        print(f"  cap {cap:3d} branch/read -> host fallback {ovf:.3%}")


def main():
    recs = list(read_fasta("/root/reference/sample-run/glimmer-mg/seqs.fa"))
    study("sample-run 454 reads", [s for _h, s in recs])

    (_h, genome), = read_fasta(
        "/root/reference/sample-run/glimmer3/NC_000915.fna")
    rng = np.random.default_rng(7)
    frags = []
    for _ in range(500):
        rl = int(rng.integers(200, 2000))
        st = int(rng.integers(0, len(genome) - rl))
        frags.append(genome[st:st + rl])
    study("NC_000915 fragments 200-2000bp", frags)


if __name__ == "__main__":
    main()
