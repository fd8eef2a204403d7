"""Circular-genome mode (glimmer-mg -r): wraparound ORFs + event shifting."""

import subprocess
from pathlib import Path

import pytest

from glimmer_mg_tpu.engine import glimmer_mg as mg
from glimmer_mg_tpu.io.fasta import read_fasta, write_fasta
from glimmer_mg_tpu.models import icm as icm_mod

from . import oracle

GENOME = Path("/root/reference/sample-run/glimmer3/NC_000915.fna")
ICM = Path("/root/reference/sample-run/glimmer3/results/NC_000915.icm")


def test_circular_contigs(tmp_path):
    if not oracle.available() or not GENOME.exists():
        pytest.skip("reference unavailable")
    oracle.ensure_built()
    _, genome = next(iter(read_fasta(GENOME)))
    contigs = [
        ("c0", genome[:20000]),
        ("c1", genome[50000:75000]),
        ("c2", genome[100000:110000]),
    ]
    fa = tmp_path / "circ.fa"
    write_fasta(fa, contigs, width=60)
    res = subprocess.run(
        [str(oracle.BIN / "glimmer-mg"), "-m", str(ICM), "-r", str(fa),
         str(tmp_path / "circ")],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr[-1000:]
    want = (tmp_path / "circ.predict").read_text()
    m = icm_mod.read_icm(ICM)
    got = mg.format_predict_mg(list(mg.run_glimmer_mg(contigs, m, circular=True)))
    assert got == want
