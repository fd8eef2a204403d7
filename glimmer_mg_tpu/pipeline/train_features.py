"""Feature-model training from annotations or predictions.

Reimplements reference scripts/train_features.py (824-line Python2 script):
gene/non-ORF length, start-codon, adjacent-orientation and adjacent-distance
histograms from a .predict file (or parsed gene list) + sequences; writes
the .features.txt DIST blocks, the RBS upstream set + .motif (via the
ELPH-equivalent motif finder in pipeline/elph.py), the frame-corrected
.gene.fasta, and the retrained .gicm.

Faithfulness notes: codon matching is case-sensitive against uppercase
codons exactly like the reference (train_features.py:33-34 with raw input
sequence case); non-gene ORF counts are weighted 1/num_starts; orientation
counts are destranded by averaging (1,1) with (-1,-1); integer formatting
truncates floats like Python 2 '%d'.
"""

from __future__ import annotations

import dataclasses
import math

FORWARD_STARTS = ("ATG", "GTG", "TTG")
FORWARD_STOPS = ["TAG", "TAA", "TGA"]

_RC = str.maketrans("ATCGatcg", "TAGCtagc")


def rc(seq: str) -> str:
    return seq.translate(_RC)[::-1]


@dataclasses.dataclass
class Gene:
    start: int  # 0-based inclusive
    end: int  # 0-based exclusive (one past stop)
    frame_start: int
    frame_end: int
    strand: int
    start_codon: bool
    stop_codon: bool


def parse_predict(predict_text: str, seqs: dict[str, str]):
    """train_features.py:163 parse_predict. Returns {header: [Gene]}."""
    genes: dict[str, list[Gene]] = {}
    header = None
    for line in predict_text.splitlines():
        if not line.strip():
            continue
        if line[0] == ">":
            header = line[1:].rstrip()
            continue
        a = line.split()
        n = len(seqs[header])
        if int(a[3]) > 0:
            strand = 1
            start = int(a[1]) - 1
            end = int(a[2])
            start_codon = start >= 0
            stop_codon = end <= n
            frame_start = start + 3 * (1 - int(start_codon))
            frame_end = end - 3 * (1 - int(stop_codon))
        else:
            strand = -1
            start = int(a[2]) - 1
            end = int(a[1])
            stop_codon = start >= 0
            start_codon = end <= n
            frame_start = start + 3 * (1 - int(stop_codon))
            frame_end = end - 3 * (1 - int(start_codon))
        genes.setdefault(header, []).append(
            Gene(max(0, start), min(end, n), frame_start, frame_end, strand,
                 start_codon, stop_codon)
        )
    return genes


def init_stats():
    return {
        "start_codons": {sc: 0 for sc in FORWARD_STARTS},
        "lengths": {},
        "adj_orients": {(1, 1): 0, (1, -1): 0, (-1, 1): 0, (-1, -1): 0},
        "adj_dist": {(1, 1): {}, (1, -1): {}, (-1, 1): {}, (-1, -1): {}},
    }


def parse_genes(stats, genes, seqs, hypothetical, min_length, max_overlap):
    """train_features.py:223."""
    for header, hgenes in genes.items():
        hseq = seqs[header]
        last_strand = ""
        last_end = ""
        for gene in hgenes:
            gene_len = (gene.end - 3 - gene.start) // 3
            if gene.start not in hypothetical:
                stats["lengths"][gene_len] = stats["lengths"].get(gene_len, 0) + 1
            if gene.strand == 1:
                gene_seq = hseq[gene.start : gene.end]
            elif gene.strand == -1:
                gene_seq = rc(hseq[gene.start : gene.end])
            else:
                continue
            if gene.start_codon and gene_seq[:3] in FORWARD_STARTS:
                stats["start_codons"][gene_seq[:3]] += 1
            if last_strand != "":
                orientation = (last_strand, gene.strand)
                stats["adj_orients"][orientation] += 1
                prev_distance = gene.start - last_end
                if -prev_distance <= max_overlap:
                    d = stats["adj_dist"][orientation]
                    d[prev_distance] = d.get(prev_distance, 0) + 1
            last_strand = gene.strand
            last_end = gene.end


def _reverse_complement_genes(genes, seqs):
    rgenes, rseqs = {}, {}
    for header in genes:
        rseqs[header] = rc(seqs[header])
        n = len(rseqs[header])
        rgenes[header] = [
            Gene(n - g.end, n - g.start, n - g.frame_end, n - g.frame_start,
                 -g.strand, g.start_codon, g.stop_codon)
            for g in genes[header][::-1]
        ]
    return rgenes, rseqs


def _forward_parse_nongenes(genome_strand, genes, seqs, min_length, max_overlap,
                            start_codons, lengths, adj_orients, adj_dist):
    """train_features.py:327 forward_parse_nongenes."""
    for header, hgenes in genes.items():
        hseq = seqs[header]
        preceeding_i = 0
        succeeding_i = 0
        n = len(hseq)
        stop_positions = [
            i for i in range(n) if hseq[i : i + 3] in FORWARD_STOPS
        ] + [n, n + 1, n + 2]

        for stop_i in stop_positions:
            preceeding_i = max(preceeding_i, 0)
            while preceeding_i < len(hgenes) and hgenes[preceeding_i].end - 3 < stop_i:
                preceeding_i += 1
            succeeding_i = preceeding_i if preceeding_i < len(hgenes) else -1
            preceeding_i -= 1

            if succeeding_i != -1:
                if hgenes[succeeding_i].end - 3 == stop_i:
                    continue  # ORF is a gene
                succeeding_overlap = stop_i - hgenes[succeeding_i].start + 3
                if succeeding_overlap > max_overlap:
                    continue

            # count candidate starts
            num_starts = 0
            codon_i = stop_i
            while codon_i >= 0:
                codon_i -= 3
                codon = hseq[codon_i : codon_i + 3] if codon_i >= 0 else ""
                if codon in FORWARD_STOPS:
                    break
                if codon == "" or codon in FORWARD_STARTS:
                    if preceeding_i != -1:
                        if hgenes[preceeding_i].end - codon_i > max_overlap:
                            break
                    if 3 * ((stop_i - codon_i) // 3) >= min_length:
                        num_starts += 1

            # walk the ORF
            codon_i = stop_i
            while codon_i >= 0:
                codon_i -= 3
                codon = hseq[codon_i : codon_i + 3] if codon_i >= 0 else ""
                if codon in FORWARD_STOPS:
                    break
                if codon == "" or codon in FORWARD_STARTS:
                    if preceeding_i != -1:
                        if hgenes[preceeding_i].end - codon_i > max_overlap:
                            break
                    nongene_len = (stop_i - codon_i) // 3
                    if 3 * nongene_len < min_length:
                        lengths[nongene_len] = lengths.get(nongene_len, 0) + 1
                        continue
                    lengths[nongene_len] = lengths.get(nongene_len, 0) + 1
                    if codon:
                        start_codons[codon] += 1
                    if preceeding_i != -1:
                        if genome_strand == 1:
                            ori = (hgenes[preceeding_i].strand, 1)
                        else:
                            ori = (-1, -1 * hgenes[preceeding_i].strand)
                        adj_orients[ori] += 1.0 / num_starts
                        pre_distance = codon_i - hgenes[preceeding_i].end
                        adj_dist[ori][pre_distance] = (
                            adj_dist[ori].get(pre_distance, 0) + 1.0 / num_starts
                        )
                    if succeeding_i != -1:
                        if genome_strand == 1:
                            ori = (1, hgenes[succeeding_i].strand)
                        else:
                            ori = (-1 * hgenes[succeeding_i].strand, -1)
                        adj_orients[ori] += 1.0 / num_starts
                        suc_distance = hgenes[succeeding_i].start - (stop_i + 3)
                        adj_dist[ori][suc_distance] = (
                            adj_dist[ori].get(suc_distance, 0) + 1.0 / num_starts
                        )


def parse_nongenes(stats, genes, seqs, min_length, max_overlap):
    _forward_parse_nongenes(1, genes, seqs, min_length, max_overlap,
                            stats["start_codons"], stats["lengths"],
                            stats["adj_orients"], stats["adj_dist"])
    rgenes, rseqs = _reverse_complement_genes(genes, seqs)
    _forward_parse_nongenes(-1, rgenes, rseqs, min_length, max_overlap,
                            stats["start_codons"], stats["lengths"],
                            stats["adj_orients"], stats["adj_dist"])


def destrand_orientations(stats):
    ao = stats["adj_orients"]
    ao[(1, 1)] += ao[(-1, -1)]
    ao[(1, 1)] /= 2.0
    ao[(-1, -1)] = ao[(1, 1)]
    ad = stats["adj_dist"]
    for l in list(ad[(1, 1)].keys()) + list(ad[(-1, -1)].keys()):
        ad[(1, 1)][l] = (ad[(1, 1)].get(l, 0) + ad[(-1, -1)].get(l, 0)) / 2.0
        ad[(-1, -1)][l] = ad[(1, 1)][l]


def format_featurefile(stats, orf_type, max_overlap) -> str:
    """train_features.py:630 output_featurefile (one GENE/NON section)."""
    out = []
    out.append(f"DIST LENGTH {orf_type}")
    for l in range(1 + max(stats["lengths"].keys())):
        out.append("%d\t%d" % (l, int(stats["lengths"].get(l, 0))))
    out.append("")
    out.append(f"DIST START {orf_type}")
    for sc in FORWARD_STARTS:
        out.append("%s\t%d" % (sc, int(stats["start_codons"][sc])))
    out.append("")
    out.append(f"DIST ADJACENT_ORIENTATION {orf_type}")
    for s1 in (1, -1):
        for s2 in (1, -1):
            out.append("%d,%d\t%d" % (s1, s2, int(stats["adj_orients"][(s1, s2)])))
    out.append("")
    for s1 in (1, -1):
        for s2 in (1, -1):
            if s1 == -1 and s2 == -1:
                continue
            out.append(f"DIST ADJACENT_DISTANCE_{s1}_{s2} {orf_type}")
            d = stats["adj_dist"][(s1, s2)]
            if d:
                for l in range(-max_overlap, 1 + max(d.keys())):
                    out.append("%d\t%.1f" % (l, d.get(l, 0)))
            out.append("")
    return "\n".join(out) + "\n"


def gene_sequences(genes, seqs, hypothetical):
    """train_features.py:731 build_icm's .gene.fasta records."""
    recs = []
    for header, hgenes in genes.items():
        hseq = seqs[header]
        for gene in hgenes:
            if gene.start in hypothetical or gene.strand not in (-1, 1):
                continue
            if gene.strand == 1:
                gene_seq = hseq[gene.frame_start : gene.frame_end - 3 * int(gene.stop_codon)]
            else:
                gene_seq = rc(hseq[gene.frame_start + 3 * int(gene.stop_codon) : gene.frame_end])
            recs.append((
                "%s_%d-%d_%d%d" % (header, gene.start, gene.end,
                                   int(gene.start_codon), int(gene.stop_codon)),
                gene_seq,
            ))
    return recs


def rbs_upstream_sequences(genes, seqs, hypothetical, rbs_len=25):
    """train_features.py:682 rbs_model's upstream windows."""
    recs = []
    for header, hgenes in genes.items():
        hseq = seqs[header]
        for gene in hgenes:
            if gene.start in hypothetical:
                continue
            if gene.strand == 1 and gene.start >= rbs_len:
                recs.append(hseq[gene.start - 25 : gene.start])
            elif gene.strand == -1 and gene.end <= len(hseq) - rbs_len:
                recs.append(rc(hseq[gene.end : gene.end + 25]))
    return recs


def compute_gc(seqs) -> float:
    gc = at = 0
    for s in seqs.values():
        for ch in s:
            if ch in "AT":
                at += 1
            elif ch in "CG":
                gc += 1
    return gc / (at + gc)


def output_stats(out_prefix, stats, orf_type, max_overlap):
    """train_features.py:563 output_stats: per-feature stat files (the
    .genomeData layout consumed by glimmer-mg -c)."""
    sfx = "genes" if orf_type == "gene" else "non"
    with open(f"{out_prefix}.lengths.{sfx}.txt", "w") as out:
        if stats["lengths"]:
            for l in range(1 + max(stats["lengths"].keys())):
                out.write("%d\t%d" % (l, int(stats["lengths"].get(l, 0))) + "\n")
    with open(f"{out_prefix}.starts.{sfx}.txt", "w") as out:
        for sc in FORWARD_STARTS:
            out.write("%s\t%d\n" % (sc, int(stats["start_codons"][sc])))
    with open(f"{out_prefix}.adj_orients.{sfx}.txt", "w") as out:
        for s1 in (1, -1):
            for s2 in (1, -1):
                out.write("%d,%d\t%d\n" % (s1, s2, int(stats["adj_orients"][(s1, s2)])))
    for s1 in (1, -1):
        for s2 in (1, -1):
            if s1 == -1 and s2 == -1:
                continue
            with open(f"{out_prefix}.adj_dist.{s1}.{s2}.{sfx}.txt", "w") as out:
                d = stats["adj_dist"][(s1, s2)]
                if d:
                    for l in range(-max_overlap, 1 + max(d.keys())):
                        out.write("%d\t%.1f\n" % (l, d.get(l, 0)))


def train_genome_data(
    predict_text: str,
    seqs: dict[str, str],
    out_prefix: str,
    *,
    min_length: int = 75,
    max_overlap: int = 50,
    min_icm_bp: int = 0,
):
    """Stats-file mode (reference train_features.py without -f): writes the
    per-genome model files of the Phymm .genomeData layout, including
    .gc.txt, used by train_all.py (SURVEY P6)."""
    genes = parse_predict(predict_text, seqs)
    hypothetical: dict = {}
    gene_stats = init_stats()
    nongene_stats = init_stats()
    parse_genes(gene_stats, genes, seqs, hypothetical, min_length, max_overlap)
    parse_nongenes(nongene_stats, genes, seqs, min_length, max_overlap)
    destrand_orientations(gene_stats)
    destrand_orientations(nongene_stats)
    output_stats(out_prefix, gene_stats, "gene", max_overlap)
    output_stats(out_prefix, nongene_stats, "nongene", max_overlap)

    from . import elph

    upstream = rbs_upstream_sequences(genes, seqs, hypothetical)
    with open(f"{out_prefix}.motif", "w") as fh:
        fh.write(elph.motif_counts(upstream, width=6))

    from ..io.fasta import write_fasta
    from ..models import dna, icm as icm_mod, icm_train

    recs = gene_sequences(genes, seqs, hypothetical)
    write_fasta(f"{out_prefix}.gene.fasta", recs, width=10**9)
    bp = sum(len(s) for _, s in recs)
    if bp >= min_icm_bp and bp > 0:
        strings = icm_train.prepare_training_strings([s for _, s in recs], reverse=True)
        strings = [s for s in strings if len(s) >= 12]
        if strings:
            m = icm_train.train_icm([dna.encode(s) for s in strings])
            icm_mod.write_icm(m, f"{out_prefix}.gicm")
    with open(f"{out_prefix}.gc.txt", "w") as fh:
        fh.write("%f\n" % compute_gc(seqs))


def train_features(
    predict_text: str,
    seqs: dict[str, str],
    out_prefix: str,
    *,
    min_length: int = 75,
    max_overlap: int = 50,
    min_icm_bp: int = 0,
    mycoplasma: bool = False,
    write_featurefile: bool = True,
    indels: bool = False,
):
    """Full -f pipeline: .features.txt + .motif + .gene.fasta + .gicm."""
    global FORWARD_STOPS
    saved_stops = list(FORWARD_STOPS)
    if mycoplasma:
        FORWARD_STOPS[2] = "XXX"
    try:
        genes = parse_predict(predict_text, seqs)
        hypothetical: dict = {}

        gene_stats = init_stats()
        nongene_stats = init_stats()
        parse_genes(gene_stats, genes, seqs, hypothetical, min_length, max_overlap)
        parse_nongenes(nongene_stats, genes, seqs, min_length, max_overlap)
        destrand_orientations(gene_stats)
        destrand_orientations(nongene_stats)

        if write_featurefile:
            with open(f"{out_prefix}.features.txt", "w") as fh:
                fh.write(format_featurefile(gene_stats, "GENE", max_overlap))
                fh.write(format_featurefile(nongene_stats, "NON", max_overlap))

        # RBS motif
        from . import elph

        upstream = rbs_upstream_sequences(genes, seqs, hypothetical)
        motif_text = elph.motif_counts(upstream, width=6)
        with open(f"{out_prefix}.motif", "w") as fh:
            fh.write(motif_text)

        # gene ICM
        if indels:
            # frame-corrected extraction (train_features.py:787 + extract_aa)
            from .extract_aa import build_icm_indels

            build_icm_indels(list(seqs.items()), predict_text, out_prefix,
                             min_icm_bp=min_icm_bp)
            return gene_stats, nongene_stats

        from ..io.fasta import write_fasta
        from ..models import dna, icm as icm_mod, icm_train

        recs = gene_sequences(genes, seqs, hypothetical)
        write_fasta(f"{out_prefix}.gene.fasta", recs, width=10**9)
        bp = sum(len(s) for _, s in recs)
        if bp >= min_icm_bp and bp > 0:
            strings = icm_train.prepare_training_strings([s for _, s in recs], reverse=True)
            strings = [s for s in strings if len(s) >= 12]
            if strings:
                m = icm_train.train_icm([dna.encode(s) for s in strings])
                icm_mod.write_icm(m, f"{out_prefix}.gicm")
        return gene_stats, nongene_stats
    finally:
        FORWARD_STOPS[:] = saved_stops
