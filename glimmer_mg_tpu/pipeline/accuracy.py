"""Gene-level accuracy evaluation: sensitivity / precision of .predict calls.

The reference ships NO gene-coordinate ground truth for its sample
metagenome: ``sample-run/glimmer-mg/map.txt`` records each simulated read's
provenance (source genome + genome coordinates + strand), but the source
genomes and their annotations are absent (.MISSING_LARGE_BLOBS — the Phymm
DB is a ~50 GB external download, docs/notes.tex:81-83).  Gene-level truth
is therefore constructed the same way the sample metagenome itself was
made (reads simulated from genomes of known gene content):

  * **Simulated benchmark** — fragments are sampled from the shipped
    H. pylori genome (sample-run/glimmer3/NC_000915.fna) exactly like
    map.txt rows (uniform position, either strand), and the truth
    annotation is the reference's own golden iterated-training prediction
    (sample-run/glimmer3/results/NC_000915.run2.predict, 1802 genes)
    projected into read coordinates.  This measures the FULL reconstructed
    pipeline (classification -> per-read prediction -> clustering ->
    retraining -> arbitration) against coordinates the reference itself
    endorses.
  * **Shipped-output agreement** — on the actual 999 sample reads the only
    reference-endorsed gene calls are its shipped final
    ``results/seqs.predict`` (produced with the real Phymm DB); we score
    our pipeline's output against it with the same matcher, reporting
    agreement rather than accuracy (different model DBs, so disagreement
    conflates model quality with engine quality).

Matching criterion (3'-anchored, the standard for prokaryotic gene callers;
the reference's own regression differ scripts/glim-diff.awk keys genes by
their stop coordinate): a predicted gene matches a truth gene iff they are
on the same strand, in the same frame (3' coordinates congruent mod 3),
and

  * both 3' ends lie inside the read: the 3' (stop-field) coordinates are
    equal, or
  * either 3' end is truncated by a read boundary: their in-frame overlap
    is >= ``min_overlap`` bases (default 60).

Sensitivity = matched truth genes / truth genes with >= ``min_overlap``
bases inside the read; precision = matched predictions / all predictions.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..models import dna


@dataclasses.dataclass
class GeneCall:
    start: int  # 1-based, 5' end (first base of start codon / truncation pt)
    stop: int  # 1-based, 3' end (last base of stop codon / truncation pt)
    frame: int  # +-1..3


def parse_predict(text: str) -> dict[str, list[GeneCall]]:
    """Parse .predict text (glimmer3 or glimmer-mg rows) per read header."""
    out: dict[str, list[GeneCall]] = {}
    cur: list[GeneCall] | None = None
    for line in text.splitlines():
        if line.startswith(">"):
            cur = out.setdefault(line[1:].split()[0], [])
        elif line.strip() and cur is not None:
            toks = line.split()
            cur.append(GeneCall(int(toks[1]), int(toks[2]), int(toks[3])))
    return out


def simulate_reads(genome: str, n_reads: int, read_len: int, seed: int = 11):
    """Sample reads like the reference's simulated metagenome (map.txt rows:
    uniform start, either strand).  Returns (reads [(header, seq)],
    provenance [(gstart, gend, strand)]) with gstart/gend 1-based inclusive
    genome coordinates of the fragment (strand -1 reads are the reverse
    complement of that genome slice)."""
    rng = np.random.default_rng(seed)
    n = len(genome)
    reads = []
    prov = []
    for i in range(n_reads):
        gstart = int(rng.integers(1, n - read_len + 1))
        gend = gstart + read_len - 1
        strand = 1 if rng.random() < 0.5 else -1
        frag = genome[gstart - 1 : gend]
        if strand < 0:
            frag = dna.reverse_complement_str(frag)
        reads.append((f"sim{i}", frag))
        prov.append((gstart, gend, strand))
    return reads, prov


def project_truth(
    annotation: list[GeneCall],
    gstart: int,
    gend: int,
    strand: int,
    min_overlap: int = 60,
    genome_len: int | None = None,
) -> list[GeneCall]:
    """Project whole-genome gene calls onto one read's coordinates.

    Genes with < ``min_overlap`` bases inside [gstart, gend] are dropped;
    projected 5'/3' ends outside [1, read_len] mark truncation (like the
    engine's own out-of-range coordinates for truncated genes).  Genes that
    wrap the circular origin (coordinates outside the genome) are skipped.
    """
    read_len = gend - gstart + 1
    out = []
    for g in annotation:
        lo, hi = min(g.start, g.stop), max(g.start, g.stop)
        if lo < 1 or (genome_len is not None and hi > genome_len):
            continue  # wraps the circular origin
        ov = min(hi, gend) - max(lo, gstart) + 1
        if ov < min_overlap:
            continue

        def to_read(coord: int) -> int:
            if strand > 0:
                return coord - gstart + 1
            return gend - coord + 1

        start, stop = to_read(g.start), to_read(g.stop)
        frame_sign = (1 if g.frame > 0 else -1) * strand
        # the matcher only consults sign(frame) and stop mod 3; the
        # absolute frame digit is cosmetic
        out.append(GeneCall(start, stop, frame_sign * (1 + stop % 3)))
    return out


def _in_frame(a: GeneCall, b: GeneCall) -> bool:
    if (a.frame > 0) != (b.frame > 0):
        return False
    return (a.stop - b.stop) % 3 == 0


def _span(g: GeneCall) -> tuple[int, int]:
    return (min(g.start, g.stop), max(g.start, g.stop))


def _matches(pred: GeneCall, truth: GeneCall, read_len: int,
             min_overlap: int) -> bool:
    if not _in_frame(pred, truth):
        return False
    p_lo, p_hi = _span(pred)
    t_lo, t_hi = _span(truth)
    ov = min(p_hi, t_hi) - max(p_lo, t_lo) + 1
    if ov < min_overlap:
        return False
    pred_3p_in = 1 <= pred.stop <= read_len
    truth_3p_in = 1 <= truth.stop <= read_len
    if pred_3p_in and truth_3p_in:
        return pred.stop == truth.stop
    return True  # >= min_overlap in-frame overlap with a truncated 3' end


@dataclasses.dataclass
class Accuracy:
    tp: int = 0
    fn: int = 0
    fp: int = 0

    @property
    def sensitivity(self) -> float:
        d = self.tp + self.fn
        return self.tp / d if d else 0.0

    @property
    def precision(self) -> float:
        d = self.tp + self.fp
        return self.tp / d if d else 0.0

    def as_dict(self) -> dict:
        return {
            "sensitivity": round(self.sensitivity, 4),
            "precision": round(self.precision, 4),
            "tp": self.tp, "fn": self.fn, "fp": self.fp,
        }


def evaluate(
    predictions: dict[str, list[GeneCall]],
    truth: dict[str, list[GeneCall]],
    read_lens: dict[str, int],
    min_overlap: int = 60,
) -> Accuracy:
    """Gene-level sensitivity/precision of per-read predictions vs truth."""
    acc = Accuracy()
    for rid, true_genes in truth.items():
        preds = list(predictions.get(rid, []))
        n = read_lens[rid]
        used = [False] * len(preds)
        for tg in true_genes:
            hit = False
            for pi, pg in enumerate(preds):
                if not used[pi] and _matches(pg, tg, n, min_overlap):
                    used[pi] = True
                    hit = True
                    break
            acc.tp += 1 if hit else 0
            acc.fn += 0 if hit else 1
        acc.fp += sum(1 for u in used if not u)
    # predictions on reads without truth entries are all false positives
    for rid, preds in predictions.items():
        if rid not in truth:
            acc.fp += len(preds)
    return acc


def golden_annotation() -> list[GeneCall]:
    """The reference's own golden whole-genome calls for NC_000915 (the
    iterated-training final run, sample-run/glimmer3/results/
    NC_000915.run2.predict)."""
    from pathlib import Path

    text = Path(
        "/root/reference/sample-run/glimmer3/results/NC_000915.run2.predict"
    ).read_text()
    return next(iter(parse_predict(text).values()))


def simulated_benchmark(
    workdir: str,
    *,
    n_reads: int = 500,
    read_len: int = 500,
    seed: int = 11,
    min_overlap: int = 60,
    db_root: str | None = None,
) -> dict:
    """End-to-end accuracy of the FULL pipeline on NC_000915 fragments.

    Builds (or reuses) a small Phymm-style DB of self-trained synthetic
    strains plus a self-trained H. pylori entry, simulates ``n_reads``
    fragments, runs the complete pipeline (classify -> predict -> cluster
    -> retrain -> arbitrate), and scores against the projected golden
    annotation. Returns the accuracy dict plus run metadata.
    """
    import os

    from ..io.fasta import read_fasta, write_fasta
    from . import glimmer_mg_pipe as pipe

    os.makedirs(workdir, exist_ok=True)
    if db_root is None:
        db_root = os.path.join(workdir, "db")
    icm_dir = build_accuracy_db(db_root)

    genome = next(iter(read_fasta("/root/reference/sample-run/glimmer3/NC_000915.fna")))[1]
    reads, prov = simulate_reads(genome, n_reads, read_len, seed=seed)
    reads_fa = os.path.join(workdir, "simreads.fa")
    write_fasta(reads_fa, reads)

    annotation = golden_annotation()
    truth = {}
    read_lens = {}
    for (rid, seq), (gs, ge, st) in zip(reads, prov):
        truth[rid] = project_truth(annotation, gs, ge, st, min_overlap,
                                   genome_len=len(genome))
        read_lens[rid] = len(seq)

    final = pipe.run_pipeline(reads_fa, icm_dir, workdir=workdir)
    from pathlib import Path

    preds = parse_predict(Path(final).read_text())
    acc = evaluate(preds, truth, read_lens, min_overlap)
    out = acc.as_dict()
    out.update(
        n_reads=n_reads, read_len=read_len, min_overlap=min_overlap,
        truth_genes=acc.tp + acc.fn,
        predicted_genes=sum(len(v) for v in preds.values()),
        truth_source="NC_000915.run2.predict (reference golden)",
    )
    return out


def build_accuracy_db(db_root: str, n_decoys: int = 3) -> str:
    """A Phymm-style DB with a self-trained H. pylori NC_000915 entry plus
    synthetic decoy strains (classification has real wrong answers to pick).

    Self-training = the reference's own novel-genome bootstrap
    (long-orfs -> extract -> build-icm -r -> glimmer3 -> train_features;
    g3-iterated.py), run for every genome by pipeline.train_all — including
    the whole-genome classification .icm (Phymm equivalent)."""
    import os

    import numpy as np

    from .. import bench_db
    from ..io.fasta import read_fasta
    from . import train_all as ta

    gd = os.path.join(db_root, "genomeData")
    done = os.path.join(gd, ".accuracy_db_done")
    if os.path.exists(done):
        return gd
    genome = next(
        iter(read_fasta("/root/reference/sample-run/glimmer3/NC_000915.fna"))
    )[1]
    genomes = {"Helicobacter_pylori_26695|NC_000915": genome}
    rng = np.random.default_rng(7)
    for gi in range(n_decoys):
        gc = 0.35 + 0.12 * gi
        genomes[f"decoy{gi}|chr"] = bench_db.make_genome(rng, gc, n_genes=40)
    ta.train_all(genomes, gd)
    ta.double_icms(gd, top=2)
    with open(done, "w") as fh:
        fh.write("ok\n")
    return gd


def shipped_agreement(workdir: str, *, min_overlap: int = 60,
                      db_root: str | None = None) -> dict:
    """Agreement of our full pipeline (own synthetic DB) with the
    reference's shipped final predictions on the 999 sample reads.

    The shipped ``results/seqs.predict`` was produced with the real ~50 GB
    Phymm DB we cannot ship, so this is an agreement (reference-as-truth)
    number, not an accuracy number — documented as such."""
    import os
    from pathlib import Path

    from . import glimmer_mg_pipe as pipe

    os.makedirs(workdir, exist_ok=True)
    if db_root is None:
        db_root = os.path.join(workdir, "db")
    icm_dir = build_accuracy_db(db_root)

    seqs = "/root/reference/sample-run/glimmer-mg/seqs.fa"
    final = pipe.run_pipeline(seqs, icm_dir, workdir=workdir)
    ours = parse_predict(Path(final).read_text())
    shipped = parse_predict(
        Path("/root/reference/sample-run/glimmer-mg/results/seqs.predict").read_text()
    )
    from ..io.fasta import read_fasta

    read_lens = {h.split()[0]: len(s) for h, s in read_fasta(seqs)}
    acc = evaluate(ours, shipped, read_lens, min_overlap)
    return {
        "agreement_vs_shipped": round(acc.sensitivity, 4),
        "precision_vs_shipped": round(acc.precision, 4),
        "shipped_genes": acc.tp + acc.fn,
        "our_genes": acc.tp + acc.fp,
        "note": "reference-as-truth agreement; DBs differ (synthetic vs real Phymm)",
    }
