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


def test_fixed_frame_probs_vector_walk_edges(gicm):
    """The AVX-512 walk (icm_probs_avx512) vs the numpy oracle, bitwise.

    Lengths straddle the vector kernel's thresholds: < 64 falls back to the
    blocked scalar walk, >= 64 runs the 16-lane vector loop with a scalar
    head (< 11) and tail (n % 16), so every dispatch path and boundary is
    pinned.  Also covers the depth-2 null model (LUT-only walk levels).
    """
    from glimmer_mg_tpu import native
    from glimmer_mg_tpu.models import dna, icm as icm_mod

    ind = icm_mod.build_indep_wo_stops(
        np.float32(0.45), ("taa", "tag", "tga")
    )
    rng = np.random.default_rng(0)
    for n in (1, 5, 11, 12, 30, 63, 64, 65, 100, 257, 511, 512):
        seq_idx = rng.integers(0, 4, n).astype(np.int8)
        gene6, ind6 = native.fixed_frame_probs(gicm, ind, seq_idx)
        rev = seq_idx[::-1]
        comp = dna.COMPLEMENT_INDEX[seq_idx]
        for icm, got in ((gicm, gene6), (ind, ind6)):
            for f in range(3):
                want_rev = icm_mod.per_base_logprob_vec(
                    icm, rev, f, cycle=False)
                want_comp = icm_mod.per_base_logprob_vec(
                    icm, comp, f, cycle=False)
                assert np.array_equal(got[f], want_rev), (n, f)
                assert np.array_equal(got[3 + f], want_comp), (n, f)


def test_predict_batch_fast_and_slow_marshal_agree(reads, gicm):
    """predict_batch's vectorized struct-fill fast path == the per-job
    ctypes loop (forced via a non-int8 seq dtype)."""
    from glimmer_mg_tpu import native
    from glimmer_mg_tpu.engine.glimmer_mg import Models
    from glimmer_mg_tpu.engine.orfs import CodonPatterns
    from glimmer_mg_tpu.models import dna, icm as icm_mod

    ind = icm_mod.build_indep_wo_stops(
        np.float32(0.45), ("taa", "tag", "tga")
    )
    models = Models(gene_icm=gicm, indep_model=ind,
                    patterns=CodonPatterns.make(None, ("taa", "tag", "tga")))
    nm = native.NativeModels(models)
    jobs_fast = [(dna.encode(s.lower()), None, False, None, nm)
                 for _h, s in reads[:40]]
    jobs_slow = [(seq.astype(np.int16), q, hq, fs, m)
                 for seq, q, hq, fs, m in jobs_fast]
    out_fast = native.predict_batch(jobs_fast)
    out_slow = native.predict_batch(jobs_slow)

    def flat(res):
        return [
            (g.id, g.start, g.stop, g.frame, g.score, g.errors, g.truncated)
            for genes in res
            for g in genes
        ]

    assert flat(out_fast) == flat(out_slow)
    assert [len(g) for g in out_fast] == [len(g) for g in out_slow]
    assert sum(len(g) for g in out_fast) > 0
