"""ICM scoring parity: numpy exact engine and JAX kernel vs the C++ oracle."""

from pathlib import Path

import numpy as np
import pytest

from glimmer_mg_tpu.models import dna, icm as icm_mod
from glimmer_mg_tpu.ops import icm_score

from . import oracle

GOLDEN_ICM = Path("/root/reference/sample-run/glimmer3/results/NC_000915.icm")


def _rand_seqs(rng, n, lo=5, hi=400):
    out = []
    for _ in range(n):
        m = int(rng.integers(lo, hi))
        out.append("".join(rng.choice(list("acgt"), m)))
    return out


@pytest.fixture(scope="module")
def golden():
    if not GOLDEN_ICM.exists():
        pytest.skip("golden ICM unavailable")
    return icm_mod.read_icm(GOLDEN_ICM)


@pytest.fixture(scope="module")
def oracle_bin():
    if not oracle.available():
        pytest.skip("reference sources unavailable")
    oracle.ensure_built()
    return True


@pytest.mark.parametrize("frame", [0, 1, 2])
def test_numpy_cumulative_vs_oracle(golden, oracle_bin, frame):
    rng = np.random.default_rng(42 + frame)
    seqs = _rand_seqs(rng, 12)
    want = oracle.icm_scores(GOLDEN_ICM, seqs, frame, "cum")
    for s, w in zip(seqs, want):
        got = icm_mod.cumulative_score(golden, dna.encode(s), frame)
        np.testing.assert_allclose(got, w, rtol=0, atol=1e-9)


@pytest.mark.parametrize("frame", [0, 1, 2])
def test_numpy_frame_score_vs_oracle(golden, oracle_bin, frame):
    rng = np.random.default_rng(7 + frame)
    seqs = _rand_seqs(rng, 8)
    want = oracle.icm_scores(GOLDEN_ICM, seqs, frame, "frame")
    for s, w in zip(seqs, want):
        got = icm_mod.frame_score(golden, dna.encode(s), frame)
        np.testing.assert_allclose(got, w, rtol=0, atol=0)  # exact table lookups


def test_ambiguous_bases(golden, oracle_bin):
    seqs = ["acgtnryswkmbdhvacgtacgtnnn", "nnnnnnnnnnnnnnnn", "acgtACGTNRYacgtacgt"]
    want = oracle.icm_scores(GOLDEN_ICM, seqs, 0, "cum")
    for s, w in zip(seqs, want):
        got = icm_mod.cumulative_score(golden, dna.encode(s), 0)
        np.testing.assert_allclose(got, w, rtol=0, atol=1e-9)


@pytest.mark.parametrize("frame", [0, 1, 2])
def test_jax_matches_numpy_per_base(golden, frame):
    rng = np.random.default_rng(3 + frame)
    for s in _rand_seqs(rng, 6):
        idx = dna.encode(s)
        ref = icm_mod.per_base_logprob(golden, idx, frame, cycle=True)
        got = icm_score.per_base_logprob(
            golden.mip,
            golden.probs,
            idx.astype(np.int32),
            frame,
            golden.model_len,
            golden.model_depth,
            cycle=True,
        )
        # Per-base values are exact f32 table entries — must match bitwise.
        np.testing.assert_array_equal(
            np.asarray(got), ref.astype(np.float32), err_msg=f"seq len {len(s)}"
        )


def test_jax_fixed_frame(golden):
    rng = np.random.default_rng(11)
    for s in _rand_seqs(rng, 4):
        idx = dna.encode(s)
        for frame in range(3):
            ref = icm_mod.frame_score(golden, idx, frame)
            got = icm_score.per_base_logprob(
                golden.mip, golden.probs, idx.astype(np.int32), frame,
                golden.model_len, golden.model_depth, cycle=False,
            )
            np.testing.assert_array_equal(np.asarray(got), ref.astype(np.float32))


def test_null_model_vs_oracle(tmp_path, oracle_bin):
    null = icm_mod.build_indep_wo_stops(0.45, dna.DEFAULT_STOP_CODONS)
    p = tmp_path / "null.icm"
    icm_mod.write_icm(null, p)
    rng = np.random.default_rng(5)
    seqs = _rand_seqs(rng, 8)
    for frame in range(3):
        want = oracle.icm_scores(p, seqs, frame, "cum")
        for s, w in zip(seqs, want):
            got = icm_mod.cumulative_score(null, dna.encode(s), frame)
            np.testing.assert_allclose(got, w, rtol=0, atol=1e-9)


def test_bank_scoring_shapes(golden):
    # A bank of same-shape models (Phymm banks are all len-12 gene ICMs).
    other = icm_mod.ICM(
        golden.model_len,
        golden.model_depth,
        golden.periodicity,
        golden.mip.copy(),
        (golden.probs * 1.25).astype(np.float32),
    )
    mip, probs = icm_score.stack_bank([golden, other])
    rng = np.random.default_rng(9)
    reads = rng.integers(0, 4, size=(5, 64), dtype=np.int32)
    lengths = np.array([64, 50, 30, 12, 5], dtype=np.int32)
    scores = icm_score.bank_score_reads(mip, probs, reads, lengths, 12, 7)
    assert scores.shape == (5, 2)
    # cross-check entries against the exact engine
    for b, m in [(1, 0), (3, 1), (0, 0)]:
        model = [golden, other][m]
        want = icm_mod.score_string(model, reads[b][: lengths[b]], 0)
        np.testing.assert_allclose(float(scores[b, m]), want, rtol=0, atol=2e-3)


def test_mg_six_frame_device_matches_host(golden):
    """Batched device Score_All_Frames precompute is bitwise equal to the
    host numpy mirror, across mixed lengths, models, and chunk padding."""
    from glimmer_mg_tpu.engine import glimmer_mg as mg
    from glimmer_mg_tpu.engine import orfs as orf_mod
    from glimmer_mg_tpu.engine.glimmer3 import Models

    rng = np.random.default_rng(11)
    patterns = orf_mod.CodonPatterns.make(None, None)

    def make_models(gc):
        indep = icm_mod.build_indep_wo_stops(gc, patterns.stop_codons)
        return Models(
            gene_icm=golden, indep_model=indep, patterns=patterns,
            indep_gc_frac=gc, min_gene_len=75, max_olap_bases=50,
            allow_truncated_orfs=True, circular=False,
        )

    m1, m2 = make_models(0.41), make_models(0.62)
    jobs = []
    for i, s in enumerate(_rand_seqs(rng, 9, lo=5, hi=700)):
        jobs.append((m1 if i % 2 else m2, dna.encode(s)))
    dev = mg.device_frame_scores(jobs)
    for j, (m, s) in enumerate(jobs):
        host = mg.host_frame_scores(m, s)
        assert np.array_equal(dev[j], host), f"read {j} mismatch"


def test_run_glimmer_mg_chunking_invariant(golden, monkeypatch):
    """Output is identical whatever the device-chunk size (boundary safety)."""
    from glimmer_mg_tpu.engine import glimmer_mg as mg

    rng = np.random.default_rng(12)
    seqs = [(f"r{i}", s) for i, s in enumerate(_rand_seqs(rng, 7, lo=80, hi=900))]
    monkeypatch.setenv("GLIMMER_MG_TPU_CHUNK", "3")
    small = mg.format_predict_mg(list(mg.run_glimmer_mg(seqs, golden)))
    monkeypatch.setenv("GLIMMER_MG_TPU_CHUNK", "256")
    big = mg.format_predict_mg(list(mg.run_glimmer_mg(seqs, golden)))
    host = mg.format_predict_mg(
        list(mg.run_glimmer_mg(seqs, golden, device_precompute=False))
    )
    assert small == big == host
