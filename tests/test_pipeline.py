"""Training pipeline parity: long-orfs, extract, train_features, g3-iterated."""

import filecmp
import io
from pathlib import Path

import pytest

from glimmer_mg_tpu.io.fasta import read_fasta, write_fasta
from glimmer_mg_tpu.pipeline import extract as ex
from glimmer_mg_tpu.pipeline import long_orfs as lo
from glimmer_mg_tpu.pipeline import train_features as tf

SAMPLE = Path("/root/reference/sample-run/glimmer3")
R = SAMPLE / "results"


@pytest.fixture(scope="module")
def genome():
    if not (SAMPLE / "NC_000915.fna").exists():
        pytest.skip("sample genome unavailable")
    return next(iter(read_fasta(SAMPLE / "NC_000915.fna")))


@pytest.mark.slow
def test_long_orfs_golden(genome):
    _, seq = genome
    lines, _ = lo.run_long_orfs(seq, entropy_cutoff=1.15)
    assert "\n".join(lines) + "\n" == (R / "NC_000915.longorfs").read_text()


def test_extract_golden(genome):
    _, seq = genome
    coords = (R / "NC_000915.longorfs").read_text()
    recs = list(ex.extract(seq, coords, skip_stop=True))
    buf = io.StringIO()
    write_fasta(buf, recs, width=60)
    assert buf.getvalue() == (R / "NC_000915.train").read_text()


@pytest.mark.slow
def test_train_features_golden(genome, tmp_path):
    header, seq = genome
    predict = (R / "NC_000915.run1.predict").read_text()
    prefix = str(tmp_path / "NC.run1")
    tf.train_features(predict, {header: seq}, prefix)
    assert (
        Path(prefix + ".features.txt").read_text()
        == (R / "NC_000915.run1.features.txt").read_text()
    )
    assert (
        Path(prefix + ".gene.fasta").read_text()
        == (R / "NC_000915.run1.gene.fasta").read_text()
    )
    assert filecmp.cmp(prefix + ".gicm", R / "NC_000915.run1.gicm", shallow=False)


def test_elph_empty_input():
    from glimmer_mg_tpu.pipeline import elph

    text = elph.motif_counts([])
    assert text.startswith("6\n")
    assert "a       1       1" in text


def test_elph_finds_planted_motif():
    import numpy as np

    from glimmer_mg_tpu.pipeline import elph

    rng = np.random.default_rng(0)
    seqs = []
    for _ in range(50):
        s = "".join(rng.choice(list("acgt"), 25))
        k = int(rng.integers(0, 20))
        s = s[:k] + "aggagg" + s[k + 6 :]
        seqs.append(s)
    text = elph.motif_counts(seqs)
    rows = {ln.split()[0]: [int(x) for x in ln.split()[1:]] for ln in text.splitlines()[1:]}
    # consensus of found motif should be aggagg
    consensus = "".join(
        max("acgt", key=lambda b: rows[b][j]) for j in range(6)
    )
    assert consensus == "aggagg"


def _run_ref_long_orfs(tmp_path, seq, extra):
    from . import oracle

    if not oracle.available():
        pytest.skip("reference sources unavailable")
    bin_dir = oracle.ensure_built()
    import subprocess

    fna = tmp_path / "lo.fna"
    with open(fna, "w") as f:
        f.write(">g\n")
        for i in range(0, len(seq), 60):
            f.write(seq[i : i + 60] + "\n")
    res = subprocess.run(
        [str(bin_dir / "long-orfs"), "-n", *extra, str(fna), "-"],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr[-1000:]
    return res.stdout


def test_long_orfs_options_vs_oracle(genome, tmp_path):
    """-i/-w/-z/-l option parity against the reference binary."""
    from glimmer_mg_tpu.engine.orfs import parse_ignore_regions

    _, full = genome
    seq = full[:150000]

    ig = "12000 20000\n40000 41000\n90001 88000\n"
    (tmp_path / "ig.txt").write_text(ig)
    cases = [
        (["-i", str(tmp_path / "ig.txt")],
         dict(ignore_regions=parse_ignore_regions(ig))),
        (["-w"], dict(without_stops=True)),
        (["-w", "-l"], dict(without_stops=True, circular=False)),
        (["-z", "4", "-t", "1.15"],
         dict(stop_codons=["taa", "tag"], xlate_code=4, entropy_cutoff=1.15)),
        (["-i", str(tmp_path / "ig.txt"), "-l", "-t", "1.2"],
         dict(ignore_regions=parse_ignore_regions(ig), circular=False,
              entropy_cutoff=1.2)),
    ]
    for extra, kwargs in cases:
        want = _run_ref_long_orfs(tmp_path, seq, extra)
        lines, _ = lo.run_long_orfs(seq, **kwargs)
        assert "\n".join(lines) + "\n" == want, extra
