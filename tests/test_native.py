"""Native C++ engine parity vs the pure-Python oracle engine.

The glimmer-mg run_* entry points dispatch to the native engine by default
(tests/test_glimmer_mg.py therefore already oracle-diffs it against the
reference binary); this module pins the native == python equivalence
explicitly per mode, so a silent fallback or a divergence in either path
fails loudly.
"""

from pathlib import Path

import numpy as np
import pytest

from glimmer_mg_tpu.engine import glimmer_mg as mg
from glimmer_mg_tpu.io.fasta import read_fasta
from glimmer_mg_tpu.models import features as feat, icm as icm_mod

SR = Path("/root/reference/sample-run/glimmer-mg")
CLUSTER = SR / "results/seqs.cluster-0.run1.filt"


@pytest.fixture(scope="module")
def reads():
    if not (SR / "seqs.fa").exists():
        pytest.skip("sample-run reads unavailable")
    return list(read_fasta(SR / "seqs.fa"))[:120]


@pytest.fixture(scope="module")
def gicm():
    return icm_mod.read_icm(str(CLUSTER) + ".gicm")


@pytest.fixture(autouse=True)
def require_native():
    from glimmer_mg_tpu import native

    if not native.available():
        pytest.skip("native engine unavailable")


def _both(monkeypatch, fn):
    monkeypatch.delenv("GLIMMER_MG_TPU_NATIVE", raising=False)
    got_native = mg.format_predict_mg(fn())
    monkeypatch.setenv("GLIMMER_MG_TPU_NATIVE", "0")
    got_python = mg.format_predict_mg(fn())
    return got_native, got_python


def test_plain_parity(monkeypatch, reads, gicm):
    nat, py = _both(
        monkeypatch, lambda: list(mg.run_glimmer_mg(reads, gicm))
    )
    assert nat == py
    assert nat.count("orf") > 0  # the run produced genes at all


def test_features_rbs_parity(monkeypatch, reads, gicm):
    rbs = feat.PWM.read(str(CLUSTER) + ".motif")
    rbs.counts_to_prob()
    rbs.probs_to_logs()
    nat, py = _both(
        monkeypatch,
        lambda: list(
            mg.run_glimmer_mg(
                reads, gicm, rbs_pwm=rbs,
                features_path=str(CLUSTER) + ".features.txt",
            )
        ),
    )
    assert nat == py


def test_subs_parity(monkeypatch, reads, gicm):
    nat, py = _both(
        monkeypatch, lambda: list(mg.run_glimmer_mg(reads, gicm, allow_subs=True))
    )
    assert nat == py


def test_indels_454_parity(monkeypatch, reads, gicm):
    nat, py = _both(
        monkeypatch,
        lambda: list(mg.run_glimmer_mg(reads, gicm, allow_indels=True)),
    )
    assert nat == py


def test_indels_qual_parity(monkeypatch, reads, gicm):
    rng = np.random.default_rng(7)
    quals = {h.split()[0]: rng.integers(3, 40, len(s)).tolist()
             for h, s in reads}
    nat, py = _both(
        monkeypatch,
        lambda: list(
            mg.run_glimmer_mg(reads, gicm, allow_indels=True, qualities=quals)
        ),
    )
    assert nat == py


def test_native_frame_scores_match_host():
    import ctypes as ct

    from glimmer_mg_tpu import native
    from glimmer_mg_tpu.engine.glimmer3 import Models, set_ignore_score_len
    from glimmer_mg_tpu.engine import orfs as orf_mod
    from glimmer_mg_tpu.models import dna

    gene = icm_mod.read_icm(str(CLUSTER) + ".gicm")
    patterns = orf_mod.CodonPatterns.make(None, None)
    indep = icm_mod.build_indep_wo_stops(0.42, patterns.stop_codons)
    models = Models(gene_icm=gene, indep_model=indep, patterns=patterns,
                    indep_gc_frac=0.42)
    models.ignore_score_len = set_ignore_score_len(0.42, patterns.stop_codons)

    rng = np.random.default_rng(3)
    seq_idx = rng.integers(0, 4, 700).astype(np.int8)
    want = mg.host_frame_scores(models, seq_idx)

    lib = native.get_lib()
    nm = native.NativeModels(models)
    out = np.zeros((6, len(seq_idx)), dtype=np.float64)
    lib.gmg_frame_scores(ct.byref(nm.c), seq_idx.ctypes.data, len(seq_idx),
                         out.ctypes.data)
    assert np.array_equal(want, out)


def test_native_length_trunc_scan_matches_python(monkeypatch):
    from glimmer_mg_tpu.io import features_file as ff

    rng = np.random.default_rng(11)
    with np.errstate(divide="ignore"):
        gene_l = np.log(rng.random(1500) * (rng.random(1500) > 0.05))
        non_l = np.log(rng.random(1500))
    monkeypatch.delenv("GLIMMER_MG_TPU_NATIVE", raising=False)
    ld_nat = ff._length_make_log_odds(gene_l, non_l, [650.0], 75)
    monkeypatch.setenv("GLIMMER_MG_TPU_NATIVE", "0")
    import glimmer_mg_tpu.native as nat_mod

    saved = nat_mod._lib
    nat_mod._lib = None
    try:
        ld_py = ff._length_make_log_odds(gene_l, non_l, [650.0], 75)
    finally:
        nat_mod._lib = saved
    for a, b in zip(ld_nat.full + ld_nat.trunc + ld_nat.trunc2,
                    ld_py.full + ld_py.trunc + ld_py.trunc2):
        assert np.array_equal(a, b, equal_nan=True)
