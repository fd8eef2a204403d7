"""Codon translation and amino-acid entropy profiles.

Reference: src/Common/xlate_tables.hh (CODON_XLATE_TABLE_*),
gene.cc:1016 Codon_Translation, gene.cc:1095 Counts_To_Entropy_Profile,
long-orfs.cc:301 / glimmer3.cc:423 Entropy_Distance_Ratio.
"""

from __future__ import annotations

import math

import numpy as np

# index = 16*b0 + 4*b1 + b2 over acgt
CODON_XLATE_TABLE_1 = "KNKNTTTTRSRSIIMIQHQHPPPPRRRRLLLLEDEDAAAAGGGGVVVV*Y*YSSSS*CWCLFLF"
# Other NCBI tables differ in a handful of entries (gene.cc:1037-1092);
# table 4 (Mold/Protozoan Mito): tga -> W. Tables 1/11 are identical.
_T4 = list(CODON_XLATE_TABLE_1)
_T4[16 * 3 + 4 * 2 + 0] = "W"  # tga
CODON_XLATE_TABLE_4 = "".join(_T4)

IS_AMINO = [c not in "BJOUXZ" for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ"]

DEFAULT_POS_ENTROPY_PROF = np.array(
    [0.08468, 0.01606, 0.05739, 0.05752, 0.04328, 0.07042, 0.02942, 0.05624,
     0.04442, 0.05620, 0.03029, 0.03975, 0.05116, 0.04098, 0.05989, 0.08224,
     0.05660, 0.06991, 0.02044, 0.03310]
)
DEFAULT_NEG_ENTROPY_PROF = np.array(
    [0.07434, 0.03035, 0.05936, 0.04729, 0.05662, 0.07704, 0.05777, 0.05328,
     0.03360, 0.05581, 0.01457, 0.03718, 0.04594, 0.05977, 0.08489, 0.05990,
     0.04978, 0.07227, 0.01050, 0.01974]
)


def xlate_table(code: int) -> str:
    if code in (0, 1, 11):
        return CODON_XLATE_TABLE_1
    if code == 4:
        return CODON_XLATE_TABLE_4
    raise NotImplementedError(f"translation table {code}")


def translate_codons(base_idx: np.ndarray, code: int = 0) -> np.ndarray:
    """Translate in-frame codons of an encoded sequence -> AA byte array."""
    table = np.frombuffer(xlate_table(code).encode(), dtype=np.uint8)
    n = (len(base_idx) // 3) * 3
    s = np.asarray(base_idx[:n], dtype=np.int64).reshape(-1, 3)
    return table[16 * s[:, 0] + 4 * s[:, 1] + s[:, 2]]


def counts_to_entropy_profile(count26: np.ndarray) -> np.ndarray:
    """gene.cc:1095: AA counts -> normalized entropy profile (20,)."""
    amino = np.asarray(IS_AMINO)
    total = count26[amino].sum()
    ep = np.zeros(20, dtype=np.float64)
    if total == 0:
        return ep
    ep = count26[amino].astype(np.float64) / total
    with np.errstate(divide="ignore", invalid="ignore"):
        ep = np.where(ep <= 0.0, 0.0, -ep * np.log(np.where(ep > 0, ep, 1.0)))
    return ep / ep.sum()


def entropy_distance_ratio(
    aa_bytes: np.ndarray,
    pos_profile=DEFAULT_POS_ENTROPY_PROF,
    neg_profile=DEFAULT_NEG_ENTROPY_PROF,
) -> float:
    """long-orfs.cc:301: distance to coding vs noncoding AA profiles."""
    count26 = np.zeros(26, dtype=np.int64)
    keep = aa_bytes != ord("*")
    np.add.at(count26, aa_bytes[keep] - ord("A"), 1)
    ep = counts_to_entropy_profile(count26)
    pos_dist = math.sqrt(float(((ep - pos_profile) ** 2).sum()))
    neg_dist = math.sqrt(float(((ep - neg_profile) ** 2).sum()))
    if neg_dist == 0.0:
        return 1.0 if pos_dist == 0.0 else 1e3
    return pos_dist / neg_dist
