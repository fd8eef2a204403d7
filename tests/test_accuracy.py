"""Gene-level accuracy scoreboard (VERDICT r3 task 6).

The reference ships no gene-coordinate truth for its sample metagenome
(map.txt records read provenance; the source genomes/annotations are
missing blobs), so the accuracy bar is carried by fragments simulated from
the shipped NC_000915 genome scored against the reference's own golden
whole-genome calls. See glimmer_mg_tpu/pipeline/accuracy.py.
"""

from pathlib import Path

import pytest

from glimmer_mg_tpu.pipeline import accuracy


def test_matcher_semantics():
    G = accuracy.GeneCall
    n = 500
    # exact 3' match, both ends in-read
    assert accuracy._matches(G(10, 300, 3), G(40, 300, 3), n, 60)
    # same frame, different stop, both in-read: no match
    assert not accuracy._matches(G(10, 297, 3), G(40, 300, 3), n, 60)
    # wrong strand never matches
    assert not accuracy._matches(G(300, 10, -1), G(10, 300, 1), n, 60)
    # out-of-frame overlap never matches
    assert not accuracy._matches(G(11, 301, 2), G(10, 300, 3), n, 60)
    # truncated 3' end (stop beyond read): in-frame overlap >= 60 matches
    assert accuracy._matches(G(100, 502, 3), G(40, 502, 3), n, 60)
    assert not accuracy._matches(G(460, 502, 3), G(40, 502, 3), n, 60)


def test_project_truth_strands():
    G = accuracy.GeneCall
    ann = [G(101, 400, 1)]  # forward gene, genome coords
    fwd = accuracy.project_truth(ann, 51, 550, 1)
    assert len(fwd) == 1 and (fwd[0].start, fwd[0].stop) == (51, 350)
    assert fwd[0].frame > 0
    rev = accuracy.project_truth(ann, 51, 550, -1)
    # read is the revcomp: gene lands on the read's minus strand
    assert len(rev) == 1 and (rev[0].start, rev[0].stop) == (450, 151)
    assert rev[0].frame < 0
    # a gene barely overlapping is dropped below min_overlap
    assert accuracy.project_truth(ann, 390, 889, 1, min_overlap=60) == []


def test_evaluate_counts():
    G = accuracy.GeneCall
    preds = {"r1": [G(1, 300, 3), G(350, 430, 2)]}
    truth = {"r1": [G(10, 300, 3)], "r2": [G(5, 200, 2)]}
    acc = accuracy.evaluate(preds, truth, {"r1": 500, "r2": 500})
    assert (acc.tp, acc.fn, acc.fp) == (1, 1, 1)
    assert acc.sensitivity == 0.5 and acc.precision == 0.5


@pytest.mark.slow
def test_simulated_pipeline_accuracy(tmp_path):
    """Full-pipeline gene-level accuracy on NC_000915 fragments must clear
    the bar (measured 0.95 sens / 0.97 prec at 200 reads, r4)."""
    out = accuracy.simulated_benchmark(str(tmp_path / "wk"), n_reads=120,
                                       read_len=500)
    assert out["sensitivity"] >= 0.90, out
    assert out["precision"] >= 0.90, out
    assert out["truth_genes"] > 100, out
