"""glimmer3 engine parity: .predict output vs the reference binary."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from glimmer_mg_tpu.engine import glimmer3 as g3
from glimmer_mg_tpu.io.fasta import read_fasta
from glimmer_mg_tpu.models import dna, icm as icm_mod, icm_train

from . import oracle

SAMPLE = Path("/root/reference/sample-run/glimmer3")


@pytest.fixture(scope="module")
def oracle_bin():
    if not oracle.available():
        pytest.skip("reference sources unavailable")
    return oracle.ensure_built()


def _write_fasta(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n")
            for k in range(0, len(s), 60):
                f.write(s[k : k + 60] + "\n")


def _train_icm(rng, n=60, length=400):
    genes = ["".join(rng.choice(list("acgt"), length)) for _ in range(n)]
    return icm_train.train_icm([dna.encode(g[::-1]) for g in genes])


def _oracle_glimmer3(tmp_path, seqs, icm, extra_args):
    fna = tmp_path / "g.fna"
    icm_path = tmp_path / "g.icm"
    _write_fasta(fna, seqs)
    icm_mod.write_icm(icm, icm_path)
    bin_dir = oracle.ensure_built()
    res = subprocess.run(
        [str(bin_dir / "glimmer3"), *extra_args, "-m", str(icm_path), str(fna),
         str(tmp_path / "out")],
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    return (tmp_path / "out.predict").read_text()


@pytest.mark.parametrize("seed,gc,fudge", [(2, 0.5, None), (3, 0.35, -12), (4, 0.62, -5)])
def test_random_genomes(tmp_path, oracle_bin, seed, gc, fudge):
    rng = np.random.default_rng(seed)
    icm = _train_icm(rng)
    p = [(1 - gc) / 2, gc / 2, gc / 2, (1 - gc) / 2]
    seqs = ["".join(rng.choice(list("acgt"), int(rng.integers(5000, 30000)), p=p))
            for _ in range(3)]
    args = [] if fudge is None else ["-u", str(fudge)]
    want = _oracle_glimmer3(tmp_path, seqs, icm, args)
    got = g3.format_predict(
        list(
            g3.run_glimmer3(
                [(f"s{i}", s) for i, s in enumerate(seqs)], icm, logodds_fudge=fudge
            )
        )
    )
    assert got == want


def test_min_gene_len_and_ambiguous(tmp_path, oracle_bin):
    rng = np.random.default_rng(7)
    icm = _train_icm(rng)
    seq = "".join(rng.choice(list("acgtnryswkmbdhv"), 20000,
                             p=[0.23, 0.23, 0.23, 0.23] + [0.08 / 11] * 11))
    want = _oracle_glimmer3(tmp_path, [seq], icm, ["-g", "120", "-u", "-12"])
    got = g3.format_predict(
        list(g3.run_glimmer3([("s0", seq)], icm, logodds_fudge=-12, min_gene_len=120))
    )
    assert got == want


@pytest.mark.slow
def test_sample_run_golden():
    """Bit-identical .predict on the H. pylori sample run (run1 config)."""
    fna = SAMPLE / "NC_000915.fna"
    icm_path = SAMPLE / "results/NC_000915.icm"
    golden = SAMPLE / "results/NC_000915.run1.predict"
    if not fna.exists():
        pytest.skip("sample run unavailable")
    recs = list(read_fasta(fna))
    m = icm_mod.read_icm(icm_path)
    got = g3.format_predict(list(g3.run_glimmer3(recs, m, logodds_fudge=-12)))
    assert got == golden.read_text()


def test_ignore_regions(tmp_path, oracle_bin):
    """glimmer3 -i: ignore-region handling matches the reference."""
    from glimmer_mg_tpu.engine.orfs import parse_ignore_regions

    genome_path = SAMPLE / "NC_000915.fna"
    if not genome_path.exists():
        pytest.skip("sample genome unavailable")
    _, genome = next(iter(read_fasta(genome_path)))
    genome = genome[:120000]
    fna = tmp_path / "g.fna"
    with open(fna, "w") as f:
        f.write(">g\n")
        for i in range(0, len(genome), 60):
            f.write(genome[i : i + 60] + "\n")
    ig = "5000 9000\n20000 20500\n45000 44000\n100000 101000\n"
    igf = tmp_path / "ig.txt"
    igf.write_text(ig)
    icm_path = SAMPLE / "results/NC_000915.icm"
    res = subprocess.run(
        [str(oracle.BIN / "glimmer3"), "-i", str(igf), "-u", "-12",
         "-m", str(icm_path), str(fna), str(tmp_path / "out")],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr[-800:]
    want = (tmp_path / "out.predict").read_text()
    m = icm_mod.read_icm(icm_path)
    got = g3.format_predict(
        list(g3.run_glimmer3([("g", genome)], m, logodds_fudge=-12,
                             ignore_regions=parse_ignore_regions(ig)))
    )
    assert got == want


def test_orflist_and_separate_modes(tmp_path, oracle_bin):
    from glimmer_mg_tpu.engine.glimmer3 import Models, gc_fraction
    from glimmer_mg_tpu.engine.orfs import CodonPatterns

    genome_path = SAMPLE / "NC_000915.fna"
    if not genome_path.exists():
        pytest.skip("sample genome unavailable")
    _, genome = next(iter(read_fasta(genome_path)))
    icm_path = SAMPLE / "results/NC_000915.icm"
    m = icm_mod.read_icm(icm_path)
    lines = []
    for ln in open(SAMPLE / "results/NC_000915.run1.predict"):
        if ln.startswith(">"):
            continue
        t = ln.split()
        d = 1 if int(t[3]) > 0 else -1
        lines.append(f"{t[0]} {t[1]} {t[2]} {d}")
        if len(lines) >= 40:
            break
    orflist = "\n".join(lines) + "\n"
    olf = tmp_path / "orflist.txt"
    olf.write_text(orflist)
    res = subprocess.run(
        [str(oracle.BIN / "glimmer3"), "-L", str(olf), "-m", str(icm_path),
         str(SAMPLE / "NC_000915.fna"), str(tmp_path / "orfl")],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr[-500:]
    want = "".join(
        l + "\n" for l in (tmp_path / "orfl.predict").read_text().splitlines()
        if not l.startswith(">")
    )
    pat = CodonPatterns.make()
    gc = gc_fraction([genome])
    indep = icm_mod.build_indep_wo_stops(gc, pat.stop_codons)
    models = Models(gene_icm=m, indep_model=indep, patterns=pat, indep_gc_frac=gc)
    got = g3.score_orflist(models, dna.encode(genome), orflist)
    assert got == want


def test_trans_table_extend_qlen(tmp_path, oracle_bin):
    """glimmer3 -z (stop codons by Genbank code), -X (truncated orfs),
    -q (ignore-score length) parity."""
    from glimmer_mg_tpu.io.genome_data import STOP_CODONS_BY_CODE

    rng = np.random.default_rng(11)
    icm = _train_icm(rng)
    seqs = ["".join(rng.choice(list("acgt"), 22000)) for _ in range(2)]
    for extra, kwargs in [
        (["-z", "4"],
         dict(stop_codons=list(STOP_CODONS_BY_CODE[4]))),
        (["-X"], dict(allow_truncated_orfs=True)),
        (["-q", "900"], dict(ignore_score_len=900)),
        (["-X", "-z", "6", "-u", "-8"],
         dict(allow_truncated_orfs=True,
              stop_codons=list(STOP_CODONS_BY_CODE[6]), logodds_fudge=-8)),
    ]:
        want = _oracle_glimmer3(tmp_path, seqs, icm, extra)
        got = g3.format_predict(
            list(g3.run_glimmer3([(f"s{i}", s) for i, s in enumerate(seqs)],
                                 icm, **kwargs))
        )
        assert got == want, extra


def test_detail_output(tmp_path):
    """--detail writes the reference's per-ORF diagnostic table
    (glimmer3.cc:1527-1542; compile-time-disabled there) without changing
    predictions."""
    import io

    genome_path = SAMPLE / "NC_000915.fna"
    if not genome_path.exists():
        pytest.skip("sample genome unavailable")
    _, genome = next(iter(read_fasta(genome_path)))
    icm_path = SAMPLE / "results/NC_000915.icm"
    m = icm_mod.read_icm(icm_path)
    recs = [("s0", genome[:60000])]
    buf = io.StringIO()
    with_detail = g3.format_predict(
        list(g3.run_glimmer3(recs, m, logodds_fudge=-12, detail_fp=buf)))
    plain = g3.format_predict(
        list(g3.run_glimmer3(recs, m, logodds_fudge=-12)))
    assert with_detail == plain
    lines = buf.getvalue().splitlines()
    assert any("F1 F2 F3 R1 R2 R3" in l for l in lines[:3])
    rows = [l for l in lines if l[:4].strip().isdigit() or l.startswith("    ")]
    rows = [l for l in rows if len(l.split()) >= 15]
    assert len(rows) > 10
    # every predicted gene id appears as a tagged detail row
    pred_ids = [l.split()[0] for l in plain.splitlines() if not l.startswith(">")]
    tagged = {l.split()[0] for l in rows if l[:4].strip().isdigit()}
    assert len(tagged) >= len(pred_ids) - 1
