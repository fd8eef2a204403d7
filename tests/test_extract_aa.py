"""extract_aa: pseudo-MSA construction + frame-corrected gene emission.

Pins the reference semantics (scripts/extract_aa.py): insertion -> gap,
deletion -> homopolymer guess + base, substitution -> C/G placeholder;
gene walk excludes the stop codon and trims to whole codons.
"""

import numpy as np

from glimmer_mg_tpu.pipeline import extract_aa as xa


def test_predict_msa_no_errors_is_fragment_row():
    seq = "acgtac"
    p = xa.Pred(0, 6, 1, True, True, [], [], [])
    row = xa.predict_msa([p], seq)
    assert row == [" "] * 3 + list(seq) + [" "] * 3


def test_predict_msa_error_walk():
    # f:      0    1    2(ins) 3    4    5(del) 6    7
    seq = "acgtacgt"
    p = xa.Pred(0, 8, 1, True, True, [2], [5], [0])
    row = xa.predict_msa([p], seq)
    # sub at 0: base 'a' -> 'C'; ins at 2: gap; del at 5: guess (copy of
    # previous emitted 'a') then the base 'c'; length = 8 + 6 + 1 deletion
    want = [" ", " ", " ", "C", "c", "-", "t", "a", "a", "c", "g", "t",
            " ", " ", " "]
    assert row == want
    assert len(row) == len(seq) + 6 + 1


def test_predict_msa_substitution_of_c_becomes_g():
    # the reference placeholder compare is case-sensitive: only an
    # uppercase C flips to G; anything else (incl. lowercase c) becomes C
    p = xa.Pred(0, 2, 1, True, True, [], [], [0])
    assert xa.predict_msa([p], "CC")[3] == "G"
    p = xa.Pred(0, 2, 1, True, True, [], [], [0])
    assert xa.predict_msa([p], "cc")[3] == "C"


def test_predict_msa_stale_coordinates_fall_through():
    # duplicate insertion coordinate: only the first consumes; the stale
    # head never matches again and later bases emit normally
    seq = "acgt"
    p = xa.Pred(0, 4, 1, True, True, [1, 1], [], [])
    row = xa.predict_msa([p], seq)
    assert row == [" "] * 3 + ["a", "-", "g", "t"] + [" "] * 3


def test_frag_genes_simple_forward():
    seq = "atggcatgctaagg"
    text = ">h\norf00001 1 12 +1 9.99 I: D: S:\n"
    recs = list(xa.extract_aa([("h", seq)], text))
    assert len(recs) == 1
    tag, dna, aa = recs[0]
    assert tag == "h_0,12_+"
    assert dna == "atggcatgc"  # stop codon excluded, whole codons only
    assert aa == "mac"


def test_frag_genes_reverse_strand():
    # reverse gene: predict start/end swapped, frame negative
    core = "atggcatgc"
    gene = xa.rc(core + "taa")
    seq = "gg" + gene + "cc"
    start = 3 + len(gene) - 1  # 1-based coords of the reverse gene
    text = f">h\norf00001 {start} 3 -1 9.99 I: D: S:\n"
    recs = list(xa.extract_aa([("h", seq)], text))
    assert len(recs) == 1
    tag, dna, aa = recs[0]
    assert dna.startswith("atg")
    assert aa.startswith("m")
