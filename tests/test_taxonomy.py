"""Phymm taxonomy table -> results.01 ranks -> PhyScimm taxlevel seeding.

Covers the chain the reference uses to seed clusters above strain
granularity: scoreReadsGlim.pl:296-340 loads distributionOfTaxa.txt,
writes GENUS..PHYLUM columns into the results table, and physcimm.py picks
a rank column to group reads into initial clusters (glimmer-mg.py:118).
"""

import os

import numpy as np

from glimmer_mg_tpu.parallel import phymm
from glimmer_mg_tpu.pipeline import scimm


def _make_db(tmp_path):
    """genomeData dir + .taxonomyData table: 3 strains, 2 families."""
    icm_dir = tmp_path / "genomeData"
    for strain in ("Aaa_x", "Aab_y", "Bcc_z"):
        (icm_dir / strain).mkdir(parents=True)
        (icm_dir / strain / "NC_1.icm").write_bytes(b"")
    tax_dir = tmp_path / ".taxonomyData" / ".3_parsedTaxData"
    tax_dir.mkdir(parents=True)
    rows = [
        ("genus", "Aegen", "p Aa sp", "Aaa_x"),
        ("family", "Alphaceae", "p Aa sp", "Aaa_x"),
        ("phylum", "Alphabacteria", "p Aa sp", "Aaa_x"),
        ("genus", "Abgen", "p Ab sp", "Aab_y"),
        ("family", "Alphaceae", "p Ab sp", "Aab_y"),
        ("family", "Betaceae", "p Bc sp", "Bcc_z"),
        ("order", "Betales", "p Bc sp", "Bcc_z"),
    ]
    with open(tax_dir / "distributionOfTaxa.txt", "w") as fh:
        for r in rows:
            fh.write("\t".join(r) + "\n")
    return icm_dir


def test_load_taxonomy_and_results_ranks(tmp_path):
    icm_dir = _make_db(tmp_path)
    tax = phymm.load_taxonomy(str(icm_dir))
    assert tax["Aaa_x"] == ("Aegen", "Alphaceae", "", "", "Alphabacteria")
    assert tax["Bcc_z"] == ("", "Betaceae", "Betales", "", "")

    paths = phymm.genome_icm_paths(str(icm_dir))
    assert [phymm.path_to_genome(p).split("|")[0] for p in paths] == [
        "Aaa_x", "Aab_y", "Bcc_z",
    ]
    # reads best-hitting Aaa_x, Aab_y, Bcc_z respectively
    scores = np.array(
        [[0.0, -9.0, -9.0], [-9.0, 0.0, -9.0], [-9.0, -9.0, 0.0],
         [0.0, -9.0, -9.0]],
        np.float64,
    )
    out = tmp_path / "results.01.phymm_reads_fa.txt"
    phymm.write_results_table(str(out), ["r0", "r1", "r2", "r3"], paths,
                              scores, tax)
    lines = out.read_text().splitlines()
    assert lines[0].split("\t")[3:] == ["GENUS", "FAMILY", "ORDER", "CLASS",
                                        "PHYLUM"]
    assert lines[1].split("\t")[4] == "Alphaceae"
    assert lines[3].split("\t")[4] == "Betaceae"

    # family-level seeding (taxlevel_index=1): Aaa_x + Aab_y reads merge
    # into one Alphaceae cluster, Bcc_z seeds Betaceae
    assign, names = scimm.init_clusters_from_results(
        str(out), ["r0", "r1", "r2", "r3"], tax, taxlevel_index=1,
        minbp_pct=0.0,
    )
    assert sorted(names) == ["Alphaceae", "Betaceae"]
    alpha = names.index("Alphaceae")
    np.testing.assert_array_equal(
        assign, [alpha, alpha, 1 - alpha, alpha]
    )
