"""Chip-resident prediction path (ops.device_predict) parity tests.

The on-device ORF scan + event DP (SURVEY §7.4/§7.5) must produce
coordinate-identical gene calls to the exact host engine in error-free
mode. Scores are f64 with different summation groupings (whole-read
prefix-sum differences vs fresh per-ORF cumsums) and XLA transcendentals,
so they can differ in the last ulps — the tests also assert the PRINTED
(%8.2f) scores agree, which bounds the practical effect.
"""

import os

import numpy as np
import pytest

from glimmer_mg_tpu.engine import glimmer_mg as mg
from glimmer_mg_tpu.engine import orfs as orf_mod
from glimmer_mg_tpu.engine.glimmer3 import Models
from glimmer_mg_tpu.io.fasta import read_fasta
from glimmer_mg_tpu.models import dna, icm as icm_mod, icm_train


def _coords(genes):
    return [(g.id, g.start, g.stop, g.frame) for g in genes]


def _rows(genes):
    return [
        "%05d %d %d %+d %8.2f" % (g.id, g.start, g.stop, g.frame, g.score)
        for g in genes
    ]


@pytest.fixture(scope="module")
def trained_models():
    """Two realistic Models bundles (trained gene ICMs, meta PWMs,
    features) with distinct GC, like classes-mode parameterization."""
    from glimmer_mg_tpu.io.genome_data import GenomeData
    from glimmer_mg_tpu.pipeline import train_all

    import tempfile

    rng = np.random.default_rng(5)
    root = tempfile.mkdtemp(prefix="devdp_db_")
    genomes = {}
    for gi, gc in ((0, 0.38), (1, 0.58)):
        p = [(1 - gc) / 2, gc / 2, gc / 2, (1 - gc) / 2]

        def gene(ncod):
            cs = []
            while len(cs) < ncod:
                c = "".join(rng.choice(list("ACGT"), 3, p=p))
                if c not in ("TAA", "TAG", "TGA"):
                    cs.append(c)
            return "ATG" + "".join(cs) + rng.choice(["TAA", "TAG", "TGA"])

        parts = []
        for _ in range(60):
            parts.append(
                "".join(rng.choice(list("ACGT"), int(rng.integers(40, 200)), p=p))
            )
            g = gene(int(rng.integers(80, 300)))
            if rng.random() < 0.5:
                g = g[::-1].translate(str.maketrans("ACGT", "TGCA"))
            parts.append(g)
        genomes[f"s{gi}|chr"] = "".join(parts)
    train_all.train_all(genomes, os.path.join(root, "genomeData"))
    gd = GenomeData(os.path.join(root, "genomeData"))
    return gd, list(genomes)


def _run_both(reads, gd, cls_map, monkeypatch):
    monkeypatch.setenv("GLIMMER_MG_TPU_NATIVE", "0")
    monkeypatch.delenv("GLIMMER_MG_TPU_DEVICE_DP", raising=False)
    host = list(mg.run_glimmer_mg_classes(reads, gd, cls_map,
                                          device_precompute=False))
    monkeypatch.setenv("GLIMMER_MG_TPU_DEVICE_DP", "1")
    dev = list(mg.run_glimmer_mg_classes(reads, gd, cls_map,
                                         device_precompute=False))
    monkeypatch.delenv("GLIMMER_MG_TPU_DEVICE_DP", raising=False)
    return host, dev


def test_sample_reads_parity(trained_models, monkeypatch):
    """Coordinate parity on the reference's sample reads (classes mode)."""
    gd, classes = trained_models
    recs = list(read_fasta("/root/reference/sample-run/glimmer-mg/seqs.fa"))
    recs = recs[:250]
    cls_map = {
        h.split()[0]: [classes[i % 2], classes[(i + 1) % 2]]
        for i, (h, _s) in enumerate(recs)
    }
    host, dev = _run_both(recs, gd, cls_map, monkeypatch)
    assert [h for h, _ in host] == [h for h, _ in dev]
    n_genes = 0
    for (h, hg), (_d, dg) in zip(host, dev):
        assert _coords(hg) == _coords(dg), h
        assert _rows(hg) == _rows(dg), h  # printed scores agree too
        n_genes += len(hg)
    assert n_genes > 50  # the comparison actually exercised genes


def test_fuzz_random_reads(trained_models, monkeypatch):
    """Random reads of varied lengths, including degenerate tiny ones."""
    gd, classes = trained_models
    rng = np.random.default_rng(17)
    reads = []
    cls_map = {}
    for i in range(120):
        n = int(rng.integers(30, 700))
        gc = float(rng.uniform(0.3, 0.7))
        p = [(1 - gc) / 2, gc / 2, gc / 2, (1 - gc) / 2]
        seq = "".join(rng.choice(list("acgt"), n, p=p))
        rid = f"fz{i}"
        reads.append((rid, seq))
        cls_map[rid] = [classes[int(rng.integers(0, 2))]]
    host, dev = _run_both(reads, gd, cls_map, monkeypatch)
    for (h, hg), (_d, dg) in zip(host, dev):
        assert _coords(hg) == _coords(dg), h


def test_user_icm_mode_parity(trained_models, monkeypatch):
    """run_glimmer_mg (-m user ICM, no classes) through the device path."""
    gd, classes = trained_models
    icm_file = gd.classes_icm_file([classes[0]])
    gicm = icm_mod.read_icm_cached(icm_file)
    recs = list(read_fasta("/root/reference/sample-run/glimmer-mg/seqs.fa"))
    recs = recs[:80]

    monkeypatch.setenv("GLIMMER_MG_TPU_NATIVE", "0")
    monkeypatch.delenv("GLIMMER_MG_TPU_DEVICE_DP", raising=False)
    host = list(mg.run_glimmer_mg(recs, gicm, device_precompute=False))
    monkeypatch.setenv("GLIMMER_MG_TPU_DEVICE_DP", "1")
    dev = list(mg.run_glimmer_mg(recs, gicm, device_precompute=False))
    for (h, hg), (_d, dg) in zip(host, dev):
        assert _coords(hg) == _coords(dg), h


def test_subs_mode_device_parity_classes(trained_models, monkeypatch):
    """Substitution mode (-S) runs ON DEVICE since r5: classes-mode
    coordinate + error-record parity vs the host engine. Indel mode still
    falls back (checked below)."""
    gd, classes = trained_models
    recs = list(read_fasta("/root/reference/sample-run/glimmer-mg/seqs.fa"))
    recs = recs[:25]
    cls_map = {h.split()[0]: [classes[0]] for h, _s in recs}

    monkeypatch.setenv("GLIMMER_MG_TPU_NATIVE", "0")
    monkeypatch.delenv("GLIMMER_MG_TPU_DEVICE_DP", raising=False)
    host = list(mg.run_glimmer_mg_classes(
        recs, gd, cls_map, allow_subs=True, device_precompute=False))
    monkeypatch.setenv("GLIMMER_MG_TPU_DEVICE_DP", "1")
    dev = list(mg.run_glimmer_mg_classes(
        recs, gd, cls_map, allow_subs=True, device_precompute=False))
    for (h, hg), (_d, dg) in zip(host, dev):
        assert _coords(hg) == _coords(dg), h
        assert [tuple((e.pos, e.type) for e in g.errors) for g in hg] == \
               [tuple((e.pos, e.type) for e in g.errors) for g in dg]

    # indel mode remains a host fallback with identical output
    monkeypatch.delenv("GLIMMER_MG_TPU_DEVICE_DP", raising=False)
    host_i = list(mg.run_glimmer_mg_classes(
        recs[:8], gd, cls_map, allow_indels=True, device_precompute=False))
    monkeypatch.setenv("GLIMMER_MG_TPU_DEVICE_DP", "1")
    dev_i = list(mg.run_glimmer_mg_classes(
        recs[:8], gd, cls_map, allow_indels=True, device_precompute=False))
    for (h, hg), (_d, dg) in zip(host_i, dev_i):
        assert _coords(hg) == _coords(dg), h


def test_subs_mode_device_parity_fuzz(monkeypatch):
    """Error-dense fuzz for the device substitution machinery: NC_000915
    fragments with sprinkled substitutions, user-ICM mode; coordinates,
    error records, and ORF ids must all match the host engine."""
    from glimmer_mg_tpu.models import icm as icm_mod2

    gicm = icm_mod2.read_icm(
        "/root/reference/sample-run/glimmer3/results/NC_000915.icm")
    (_h, genome), = read_fasta(
        "/root/reference/sample-run/glimmer3/NC_000915.fna")
    genome = genome.lower()
    rng = np.random.default_rng(9)
    reads = []
    for i in range(80):
        rl = int(rng.integers(200, 700))
        st = int(rng.integers(0, len(genome) - rl))
        s = list(genome[st:st + rl])
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, rl))
            s[p] = "acgt"[int(rng.integers(0, 4))]
        reads.append((f"r{i}", "".join(s)))

    def run(dev):
        monkeypatch.setenv("GLIMMER_MG_TPU_NATIVE", "0")
        if dev:
            monkeypatch.setenv("GLIMMER_MG_TPU_DEVICE_DP", "1")
        else:
            monkeypatch.setenv("GLIMMER_MG_TPU_DEVICE_DP", "0")
        return [
            (h, [(g.id, g.start, g.stop, g.frame,
                  tuple((e.pos, e.type) for e in g.errors)) for g in gs])
            for h, gs in mg.run_glimmer_mg(reads, gicm, allow_subs=True,
                                           device_precompute=False)]

    host = run(False)
    dev = run(True)
    n_err = sum(1 for _h, gs in host for g in gs if g[4])
    assert host == dev
    assert n_err >= 5  # the corpus really exercised sub-extended genes


def test_subs_mode_quality_file_device_parity(monkeypatch):
    """Quality-file subs mode runs ON DEVICE: Pass_Stop_Penalty switches
    to the per-position quality form (glimmer-mg.cc:961) built from
    uploaded uint8 qualities. A mixed bank (reads with and without a
    quality file) must match the host engine on coordinates, ids, AND
    error records."""
    from glimmer_mg_tpu.models import icm as icm_mod2

    gicm = icm_mod2.read_icm(
        "/root/reference/sample-run/glimmer3/results/NC_000915.icm")
    (_h, genome), = read_fasta(
        "/root/reference/sample-run/glimmer3/NC_000915.fna")
    genome = genome.lower()
    rng = np.random.default_rng(31)
    reads = []
    qualities = {}
    for i in range(60):
        rl = int(rng.integers(200, 700))
        st = int(rng.integers(0, len(genome) - rl))
        s = list(genome[st:st + rl])
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, rl))
            s[p] = "acgt"[int(rng.integers(0, 4))]
        rid = f"q{i}"
        reads.append((rid, "".join(s)))
        if i % 3 != 2:  # two thirds carry a quality file entry
            # full plausible phred span incl. extremes (q=1 -> p=0.2,
            # q~87 -> p within an ulp of 1.0)
            qualities[rid] = [int(q) for q in rng.integers(1, 88, rl)]

    def run(dev):
        monkeypatch.setenv("GLIMMER_MG_TPU_NATIVE", "0")
        monkeypatch.setenv("GLIMMER_MG_TPU_DEVICE_DP", "1" if dev else "0")
        return [
            (h, [(g.id, g.start, g.stop, g.frame,
                  tuple((e.pos, e.type) for e in g.errors)) for g in gs])
            for h, gs in mg.run_glimmer_mg(
                reads, gicm, allow_subs=True, qualities=qualities,
                device_precompute=False)]

    host = run(False)
    dev = run(True)
    n_err = sum(1 for _h, gs in host for g in gs if g[4])
    assert host == dev
    assert n_err >= 3  # quality penalties really produced sub genes


def test_quality_file_error_free_stays_on_device(trained_models,
                                                 monkeypatch):
    """Error-free mode never reads quality values (their only consumers
    are the indel branch and Pass_Stop_Penalty), so a quality file must
    not knock reads off the device path — and the output must equal the
    no-quality run."""
    gd, classes = trained_models
    recs = list(read_fasta("/root/reference/sample-run/glimmer-mg/seqs.fa"))
    recs = recs[:40]
    rng = np.random.default_rng(41)
    cls_map = {h.split()[0]: [classes[i % 2]]
               for i, (h, _s) in enumerate(recs)}
    qualities = {
        h.split()[0]: [int(q) for q in rng.integers(1, 60, len(s))]
        for h, s in recs
    }

    monkeypatch.setenv("GLIMMER_MG_TPU_NATIVE", "0")
    monkeypatch.setenv("GLIMMER_MG_TPU_DEVICE_DP", "0")
    host = list(mg.run_glimmer_mg_classes(recs, gd, cls_map,
                                          device_precompute=False))

    monkeypatch.setenv("GLIMMER_MG_TPU_DEVICE_DP", "1")

    def boom(*_a, **_k):  # any host fallback fails the test
        raise AssertionError("read fell back to the host engine")

    monkeypatch.setattr(mg, "predict_read", boom)
    monkeypatch.setattr(mg, "_predict_read_with_models", boom)
    dev = list(mg.run_glimmer_mg_classes(recs, gd, cls_map,
                                         qualities=qualities,
                                         device_precompute=False))
    assert [h for h, _ in host] == [h for h, _ in dev]
    for (h, hg), (_d, dg) in zip(host, dev):
        assert _coords(hg) == _coords(dg), h


def test_f32_dp_parity(trained_models, monkeypatch):
    """The f32 score-carry mode (the TPU-fast configuration — f64 is
    emulated on TPU) must also be coordinate-identical to the host
    engine on sample + fuzz reads."""
    gd, classes = trained_models
    monkeypatch.setenv("GLIMMER_MG_TPU_DEVICE_DP_F32", "1")
    rng = np.random.default_rng(23)
    recs = list(read_fasta("/root/reference/sample-run/glimmer-mg/seqs.fa"))
    reads = recs[:120]
    for i in range(60):
        n = int(rng.integers(60, 600))
        reads.append((f"fz{i}", "".join(rng.choice(list("acgt"), n))))
    cls_map = {
        h.split()[0]: [classes[i % 2]] for i, (h, _s) in enumerate(reads)
    }
    host, dev = _run_both(reads, gd, cls_map, monkeypatch)
    monkeypatch.delenv("GLIMMER_MG_TPU_DEVICE_DP_F32", raising=False)
    for (h, hg), (_d, dg) in zip(host, dev):
        assert _coords(hg) == _coords(dg), h


def test_event_overflow_falls_back(trained_models, monkeypatch):
    """Reads whose event count exceeds the device tensor capacity must be
    detected per read and served by the host engine with identical
    output. Forced by shrinking MAX_EVENTS."""
    from glimmer_mg_tpu.ops import device_predict as dpk

    gd, classes = trained_models
    recs = list(read_fasta("/root/reference/sample-run/glimmer-mg/seqs.fa"))
    recs = recs[:40]
    cls_map = {h.split()[0]: [classes[i % 2]]
               for i, (h, _s) in enumerate(recs)}
    monkeypatch.setattr(dpk, "MAX_EVENTS", 12)
    dpk._JIT_CACHE.clear()
    try:
        host, dev = _run_both(recs, gd, cls_map, monkeypatch)
    finally:
        dpk._JIT_CACHE.clear()
    n_genes = 0
    for (h, hg), (_d, dg) in zip(host, dev):
        assert _coords(hg) == _coords(dg), h
        n_genes += len(hg)
    assert n_genes > 0  # overflow reads really produced genes via fallback


def test_default_engages_without_native(trained_models, monkeypatch):
    """With the native engine unavailable and an accelerator present, the
    device path is the default (no env var needed)."""
    monkeypatch.delenv("GLIMMER_MG_TPU_DEVICE_DP", raising=False)
    import glimmer_mg_tpu.native as native_mod

    monkeypatch.setattr(native_mod, "available", lambda: False)
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert mg._use_device_dp()
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert not mg._use_device_dp()
    monkeypatch.setattr(native_mod, "available", lambda: True)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "local_device_count", lambda: 1)
    monkeypatch.setattr(os, "cpu_count", lambda: 2)
    assert not mg._use_device_dp()  # 1 chip loses to 2 host cores


def test_engine_autoselect_economics(trained_models, monkeypatch):
    """With both engines available the default is a measured-throughput
    choice: a chip fleet beats the host cores once chips x ~3.5k reads/s
    exceeds cores x ~10.8k (VERDICT r4 task 8)."""
    monkeypatch.delenv("GLIMMER_MG_TPU_DEVICE_DP", raising=False)
    import glimmer_mg_tpu.native as native_mod
    import jax

    monkeypatch.setattr(native_mod, "available", lambda: True)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(os, "cpu_count", lambda: 2)
    monkeypatch.setattr(jax, "local_device_count", lambda: 16)
    assert mg._use_device_dp()  # 16 chips (~56k) beat 2 cores (~22k)
    monkeypatch.setattr(jax, "local_device_count", lambda: 4)
    assert not mg._use_device_dp()  # 4 chips (~14k) lose
    monkeypatch.setenv("GLIMMER_MG_TPU_DEVICE_DP", "1")
    assert mg._use_device_dp()  # env override wins regardless


def test_long_reads_parity(trained_models, monkeypatch):
    """Reads past the old packed-sort-key bound (~1.4 kb): the event order
    must stay pos-then-family for any padded length (r4 advisor high —
    pos*8192+rank overflowed its bucket above Lp~1360). Gene-dense long
    reads device vs host."""
    gd, classes = trained_models
    rng = np.random.default_rng(53)
    reads = []
    cls_map = {}

    def gene_like(ncod, gc):
        p = [(1 - gc) / 2, gc / 2, gc / 2, (1 - gc) / 2]
        cs = []
        while len(cs) < ncod:
            c = "".join(rng.choice(list("acgt"), 3, p=p))
            if c not in ("taa", "tag", "tga"):
                cs.append(c)
        return "atg" + "".join(cs) + str(rng.choice(["taa", "tag", "tga"]))

    for i in range(10):
        gc = (0.38, 0.58)[i % 2]
        parts = []
        total = 0
        target = int(rng.integers(1450, 2100))
        while total < target:
            parts.append("".join(
                rng.choice(list("acgt"), int(rng.integers(20, 80)))))
            g = gene_like(int(rng.integers(40, 150)), gc)
            if rng.random() < 0.5:
                g = g[::-1].translate(str.maketrans("acgt", "tgca"))
            parts.append(g)
            total = sum(len(x) for x in parts)
        rid = f"lr{i}"
        reads.append((rid, "".join(parts)[:target]))
        cls_map[rid] = [classes[i % 2]]
    host, dev = _run_both(reads, gd, cls_map, monkeypatch)
    n_genes = 0
    for (h, hg), (_d, dg) in zip(host, dev):
        assert _coords(hg) == _coords(dg), h
        n_genes += len(hg)
    assert n_genes > 5  # long reads really produced genes (9 measured)


def test_fuzz_overlap_dense(trained_models, monkeypatch):
    """Adversarial re-link stress: reads built from tightly packed /
    overlapping gene-like segments on both strands, so closures fire with
    many openers inside the 50 bp window (the vectorized re-link +
    disqualify/requalify machinery must match the host exactly)."""
    gd, classes = trained_models
    rng = np.random.default_rng(41)
    reads = []
    cls_map = {}

    def gene_like(ncod, gc):
        # class-GC-matched codons so the trained ICMs actually score them
        p = [(1 - gc) / 2, gc / 2, gc / 2, (1 - gc) / 2]
        cs = []
        while len(cs) < ncod:
            c = "".join(rng.choice(list("acgt"), 3, p=p))
            if c not in ("taa", "tag", "tga"):
                cs.append(c)
        return "atg" + "".join(cs) + str(rng.choice(["taa", "tag", "tga"]))

    for i in range(60):
        gc = (0.38, 0.58)[i % 2]
        parts = []
        total = 0
        while total < 450:
            g = gene_like(int(rng.integers(30, 80)), gc)
            if rng.random() < 0.5:
                g = g[::-1].translate(str.maketrans("acgt", "tgca"))
            ov = int(rng.integers(0, 45))  # overlap previous segment
            if parts and ov:
                joined = "".join(parts)
                parts = [joined[: max(0, len(joined) - ov)]]
            parts.append(g)
            total = sum(len(p) for p in parts)
        seq = "".join(parts)[:500]
        rid = f"ov{i}"
        reads.append((rid, seq))
        cls_map[rid] = [classes[i % 2]]
    host, dev = _run_both(reads, gd, cls_map, monkeypatch)
    n_genes = 0
    for (h, hg), (_d, dg) in zip(host, dev):
        assert _coords(hg) == _coords(dg), h
        n_genes += len(hg)
    assert n_genes > 15  # dense input really generated genes (26 measured)


def test_packed_layout_roundtrip_and_sixframe_parity():
    """The chip upload path: pack_reads/unpack_reads round-trip bit-exact,
    and the layout-ordered six-frame Pallas call (interpret mode) matches
    the XLA walk on the same rows."""
    import jax
    import numpy as np

    from glimmer_mg_tpu.models import dna, icm as icm_mod, icm_train
    from glimmer_mg_tpu.engine import orfs as orf_mod
    from glimmer_mg_tpu.ops import device_predict as dpk, icm_pallas, icm_score

    rng = np.random.default_rng(11)
    seqs = [rng.integers(0, 4, rng.integers(40, 120)).astype(np.int8)
            for _ in range(13)]
    groups = rng.integers(0, 2, 13).astype(np.int32)
    L = 120
    layout = icm_pallas.plan_group_layout(groups, L)
    row_src = layout[0]
    packed, lens2, grp2 = dpk.pack_reads(seqs, row_src, L, groups)
    reads_dev = np.asarray(dpk.unpack_reads(packed, L))
    for row, src in enumerate(row_src):
        if src >= 0:
            s = seqs[src][:L]
            assert np.array_equal(reads_dev[row, :len(s)], s), row
            assert reads_dev[row, len(s):].max(initial=0) == 0
            assert lens2[row] == len(s) and grp2[row] == groups[src]
        else:
            assert lens2[row] == 0

    # two tiny model pairs; layout-ordered pallas (interpret) vs XLA walk
    pat = orf_mod.CodonPatterns.make()
    icms = []
    for k in range(2):
        tr = ["atg" + "".join(rng.choice(list("acgt"), 120)) for _ in range(4)]
        icms.append(icm_train.train_icm(
            [dna.encode(s) for s in tr], model_len=12, depth=3))
    indep = icm_mod.build_indep_wo_stops(0.5, pat.stop_codons)
    gmip = np.stack([m.mip for m in icms])
    gprobs = np.stack([m.probs for m in icms])
    imip = np.stack([indep.mip] * 2)
    iprobs = np.stack([indep.probs] * 2)

    g6p, i6p = icm_pallas.mg_six_frame_pallas(
        gmip, gprobs, imip, iprobs, reads_dev, lens2, grp2,
        model_len=12, depth=3, interpret=True, layout=layout)
    g6x, i6x = icm_score.mg_six_frame_batch(
        gmip, gprobs, imip, iprobs, reads_dev, lens2, grp2,
        model_len=12, depth=3)
    mask = (np.arange(L)[None, :] < lens2[:, None])[:, None, :]
    for a, b in ((g6p, g6x), (i6p, i6x)):
        a = np.where(mask, np.asarray(a), 0.0)
        b = np.where(mask, np.asarray(b), 0.0)
        assert np.array_equal(a, b)  # bitwise on every in-read base


def test_first_start_codon_flag_is_eligible(monkeypatch):
    """use_first_start_codon is a glimmer3 whole-genome knob the per-read
    engine ignores; a Models carrying it must still run on the device path
    with identical output (VERDICT r4 task 6)."""
    from glimmer_mg_tpu.ops import device_predict as dpk

    rng = np.random.default_rng(31)
    pat = orf_mod.CodonPatterns.make()
    gc = 0.6
    p = [(1 - gc) / 2, gc / 2, gc / 2, (1 - gc) / 2]

    def gene_like(ncod):
        cs = []
        while len(cs) < ncod:
            c = "".join(rng.choice(list("acgt"), 3, p=p))
            if c not in ("taa", "tag", "tga"):
                cs.append(c)
        return "atg" + "".join(cs) + str(rng.choice(["taa", "tag", "tga"]))

    train = [gene_like(120) for _ in range(8)]
    gicm = icm_train.train_icm(
        [dna.encode(s) for s in train], model_len=12, depth=3)
    indep = icm_mod.build_indep_wo_stops(0.5, pat.stop_codons)
    models = Models(gene_icm=gicm, indep_model=indep, patterns=pat,
                    min_gene_len=75, allow_truncated_orfs=True,
                    use_first_start_codon=True)
    jobs = []
    for i in range(24):
        s = ("".join(rng.choice(list("acgt"), 30)) + gene_like(60)
             + "".join(rng.choice(list("acgt"), 30)))
        jobs.append((dna.encode(s), models, None, False))

    dev = mg._device_dp_chunk(jobs, False, False)
    assert dev is not None  # eligible despite the flag
    n_genes = 0
    for r, (seq_idx, m, _q, _hq) in enumerate(jobs):
        host = mg._predict_read_with_models(m, seq_idx)
        assert _coords(host) == _coords(dev[r]), r
        n_genes += len(host)
    assert n_genes > 5
