"""glimmer-mg classification mode (-c) parity against the reference binary.

Builds a synthetic .genomeData DB (gene-dense random genomes self-trained
with this framework), compiles a reference glimmer-mg variant whose compiled
ICM_dir points at the test DB, and compares per-read predictions.
"""

import os
import subprocess
from pathlib import Path

import numpy as np
import pytest

from glimmer_mg_tpu.engine import glimmer3 as g3
from glimmer_mg_tpu.engine import glimmer_mg as mg
from glimmer_mg_tpu.io.fasta import read_fasta, write_fasta
from glimmer_mg_tpu.io.genome_data import GenomeData, parse_classes
from glimmer_mg_tpu.models import dna, icm_train
from glimmer_mg_tpu.pipeline import extract as ex, long_orfs as lo, train_features as tf

from . import oracle

DB = Path("/tmp/gdb-test")
STOPS = {"TAA", "TAG", "TGA"}


def _make_genome(rng, gc, n_genes=50):
    p = [(1 - gc) / 2, gc / 2, gc / 2, (1 - gc) / 2]

    def gene(n_codons):
        codons = []
        while len(codons) < n_codons:
            c = "".join(rng.choice(list("ACGT"), 3, p=p))
            if c not in STOPS:
                codons.append(c)
        return "ATG" + "".join(codons) + rng.choice(["TAA", "TAG", "TGA"])

    parts = []
    for _ in range(n_genes):
        parts.append("".join(rng.choice(list("ACGT"), int(rng.integers(50, 300)), p=p)))
        g = gene(int(rng.integers(100, 400)))
        if rng.random() < 0.4:
            g = g[::-1].translate(str.maketrans("ACGT", "TGCA"))
        parts.append(g)
    return "".join(parts)


@pytest.fixture(scope="module")
def test_db():
    if not oracle.available():
        pytest.skip("reference sources unavailable")
    oracle.ensure_built()
    # build the patched-ICM_dir oracle binary
    bdir = oracle.BUILD
    src = (bdir / "Glimmer/glimmer-mg.cc").read_text()
    import re

    src = re.sub(
        r'static string ICM_dir = ".*";',
        f'static string ICM_dir = "{DB}/genomeData";',
        src,
    )
    (bdir / "Glimmer/glimmer-mg-testdb.cc").write_text(src)
    binary = oracle.BIN / "glimmer-mg-testdb"
    if not binary.exists():
        subprocess.run(
            oracle._CXX + oracle._INC
            + [str(bdir / "Glimmer/glimmer-mg-testdb.cc"),
               str(oracle.OBJ / "glimmer_base.o"), str(oracle.OBJ / "icm.o"),
               str(oracle.OBJ / "delcher.o"), str(oracle.OBJ / "gene.o"),
               str(oracle.OBJ / "kelley.o"), str(oracle.OBJ / "fasta.o"),
               "-o", str(binary)],
            check=True,
        )

    rng = np.random.default_rng(7)
    genomes = {}
    for gi, gc in enumerate([0.38, 0.5, 0.6]):
        genomes[f"strain{gi}|chr"] = _make_genome(rng, gc)

    (DB / "genomeData").mkdir(parents=True, exist_ok=True)
    for cls, seq in genomes.items():
        strain, nc = cls.split("|")
        d = DB / "genomeData" / strain
        d.mkdir(exist_ok=True)
        if (d / f"{nc}.gicm").exists():
            continue
        lines, _ = lo.run_long_orfs(seq, entropy_cutoff=1.15)
        train_recs = list(ex.extract(seq, "\n".join(lines), skip_stop=True))
        strings = icm_train.prepare_training_strings(
            [s for _, s in train_recs], reverse=True
        )
        m = icm_train.train_icm([dna.encode(s) for s in strings])
        res = list(g3.run_glimmer3([(nc, seq)], m, logodds_fudge=-12))
        tf.train_genome_data(g3.format_predict(res), {nc: seq}, str(d / nc))

    classes = list(genomes)
    reads = []
    class_lines = []
    for i in range(40):
        cls = classes[i % 3]
        seq = genomes[cls]
        start = int(rng.integers(0, len(seq) - 700))
        reads.append((f"read{i}", seq[start : start + 700]))
        second = classes[(i + 1) % 3]
        class_lines.append(
            f"read{i}\t{cls} {second}" if i % 2 == 0 else f"read{i}\t{cls}"
        )
    write_fasta(DB / "reads.fa", reads, width=60)
    (DB / "classes.txt").write_text("\n".join(class_lines) + "\n")
    return binary, reads


def _per_read(text):
    out = {}
    cur = None
    for line in text.splitlines():
        if line.startswith(">"):
            cur = line[1:]
            out[cur] = []
        else:
            out[cur].append(line)
    return out


@pytest.mark.parametrize(
    "name,args,kw",
    [
        ("plain", [], {}),
        ("subs", ["-s"], dict(allow_subs=True)),
        ("indels", ["-i"], dict(allow_indels=True)),
    ],
)
def test_classes_mode(test_db, name, args, kw):
    binary, reads = test_db
    res = subprocess.run(
        [str(binary), "-c", str(DB / "classes.txt"), *args,
         str(DB / "reads.fa"), str(DB / f"out_{name}")],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr[-1500:]
    want = _per_read((DB / f"out_{name}.predict").read_text())

    gd = GenomeData(str(DB / "genomeData"))
    classes = parse_classes(DB / "classes.txt")
    got_text = mg.format_predict_mg(
        list(mg.run_glimmer_mg_classes(reads, gd, classes, **kw))
    )
    ours = _per_read(got_text)
    assert set(want) == set(ours)
    diffs = [r for r in want if want[r] != ours[r]]
    assert not diffs, f"{len(diffs)} reads differ, first: {diffs[0]}: want={want[diffs[0]]} got={ours[diffs[0]]}"
    # whole-file byte parity: record order reproduces the reference's
    # __gnu_cxx::hash_map iteration order (utils/gnuhash.py)
    assert got_text == (DB / f"out_{name}.predict").read_text()


def test_classes_mode_user_stops(test_db):
    """-Z in classification mode overrides Update_Meta_Stop (User_Stop)."""
    binary, reads = test_db
    res = subprocess.run(
        [str(binary), "-c", str(DB / "classes.txt"), "-Z", "taa,tag",
         str(DB / "reads.fa"), str(DB / "out_zstop")],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr[-1500:]
    want = _per_read((DB / "out_zstop.predict").read_text())
    gd = GenomeData(str(DB / "genomeData"))
    classes = parse_classes(DB / "classes.txt")
    got_text = mg.format_predict_mg(
        list(mg.run_glimmer_mg_classes(
            reads, gd, classes, user_stop_codons=["taa", "tag"]))
    )
    ours = _per_read(got_text)
    diffs = [r for r in want if want[r] != ours[r]]
    assert not diffs, f"{len(diffs)} reads differ: {diffs[:2]}"
    assert got_text == (DB / "out_zstop.predict").read_text()


def test_overlap_pipeline_byte_equal(test_db, monkeypatch):
    """GLIMMER_MG_TPU_OVERLAP=1 (the >=4-core default: the engine worker
    runs chunk k while the main thread parameterizes chunk k+1) produces
    byte-identical output to the synchronous path, including record order,
    across chunk boundaries (chunk=64 forces several in-flight chunks)."""
    _binary, reads = test_db
    gd = GenomeData(str(DB / "genomeData"))
    classes = parse_classes(DB / "classes.txt")

    monkeypatch.setenv("GLIMMER_MG_TPU_CHUNK", "64")
    monkeypatch.setenv("GLIMMER_MG_TPU_OVERLAP", "0")
    sync = mg.format_predict_mg(
        list(mg.run_glimmer_mg_classes(reads, gd, classes))
    )
    monkeypatch.setenv("GLIMMER_MG_TPU_OVERLAP", "1")
    overlapped = mg.format_predict_mg(
        list(mg.run_glimmer_mg_classes(reads, gd, classes))
    )
    assert overlapped == sync
