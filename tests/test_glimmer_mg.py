"""glimmer-mg engine parity vs the reference binary on sample-run reads."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from glimmer_mg_tpu.engine import glimmer_mg as mg
from glimmer_mg_tpu.io.fasta import read_fasta
from glimmer_mg_tpu.models import features as feat, icm as icm_mod

from . import oracle

SR = Path("/root/reference/sample-run/glimmer-mg")
CLUSTER = SR / "results/seqs.cluster-0.run1.filt"


@pytest.fixture(scope="module")
def oracle_bin():
    if not oracle.available():
        pytest.skip("reference sources unavailable")
    return oracle.ensure_built()


@pytest.fixture(scope="module")
def reads():
    if not (SR / "seqs.fa").exists():
        pytest.skip("sample-run reads unavailable")
    return list(read_fasta(SR / "seqs.fa"))


@pytest.fixture(scope="module")
def gicm():
    return icm_mod.read_icm(str(CLUSTER) + ".gicm")


def _write_fasta(path, recs):
    with open(path, "w") as f:
        for h, s in recs:
            f.write(f">{h}\n")
            for i in range(0, len(s), 60):
                f.write(s[i : i + 60] + "\n")


def _oracle_mg(tmp_path, recs, args):
    fa = tmp_path / "reads.fa"
    _write_fasta(fa, recs)
    bin_dir = oracle.ensure_built()
    res = subprocess.run(
        [str(bin_dir / "glimmer-mg"), *args, str(fa), str(tmp_path / "out")],
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    return (tmp_path / "out.predict").read_text()


def test_plain_icm(tmp_path, oracle_bin, reads, gicm):
    subset = reads[:150]
    want = _oracle_mg(tmp_path, subset, ["-m", str(CLUSTER) + ".gicm"])
    got = mg.format_predict_mg(list(mg.run_glimmer_mg(subset, gicm)))
    assert got == want


def test_features_and_motif(tmp_path, oracle_bin, reads, gicm):
    subset = reads[:250]
    want = _oracle_mg(
        tmp_path,
        subset,
        ["-m", str(CLUSTER) + ".gicm", "-b", str(CLUSTER) + ".motif",
         "-f", str(CLUSTER) + ".features.txt"],
    )
    rbs = feat.PWM.read(str(CLUSTER) + ".motif")
    rbs.counts_to_prob()
    rbs.probs_to_logs()
    got = mg.format_predict_mg(
        list(mg.run_glimmer_mg(subset, gicm, rbs_pwm=rbs,
                               features_path=str(CLUSTER) + ".features.txt"))
    )
    assert got == want


def test_substitutions(tmp_path, oracle_bin, reads, gicm):
    subset = reads[:150]
    want = _oracle_mg(tmp_path, subset, ["-m", str(CLUSTER) + ".gicm", "-s"])
    got = mg.format_predict_mg(list(mg.run_glimmer_mg(subset, gicm, allow_subs=True)))
    assert got == want


def test_indels_454(tmp_path, oracle_bin, reads, gicm):
    subset = reads[:150]
    want = _oracle_mg(tmp_path, subset, ["-m", str(CLUSTER) + ".gicm", "-i"])
    got = mg.format_predict_mg(list(mg.run_glimmer_mg(subset, gicm, allow_indels=True)))
    assert got == want


def test_indels_quality_file(tmp_path, oracle_bin, reads, gicm):
    subset = reads[:80]
    rng = np.random.default_rng(0)
    quals = {}
    qual_path = tmp_path / "reads.qual"
    with open(qual_path, "w") as q:
        for h, s in subset:
            qv = rng.integers(5, 40, len(s)).tolist()
            quals[h.split()[0]] = qv
            q.write(f">{h}\n")
            for i in range(0, len(qv), 20):
                q.write(" ".join(map(str, qv[i : i + 20])) + "\n")
    want = _oracle_mg(
        tmp_path, subset,
        ["-m", str(CLUSTER) + ".gicm", "-i", "-q", str(qual_path)],
    )
    got = mg.format_predict_mg(
        list(mg.run_glimmer_mg(subset, gicm, allow_indels=True, qualities=quals))
    )
    assert got == want
