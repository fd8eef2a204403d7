"""Utility tools vs reference binaries (anomaly, uncovered, window-acgt,
start-codon-distrib, multi-extract)."""

import io
import subprocess
from pathlib import Path

import numpy as np
import pytest

from glimmer_mg_tpu.io.fasta import write_fasta
from glimmer_mg_tpu.pipeline import util_tools as ut

from . import oracle


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    if not oracle.available():
        pytest.skip("reference sources unavailable")
    oracle.ensure_built()
    root = tmp_path_factory.mktemp("ut")
    rng = np.random.default_rng(3)
    seq = "".join(rng.choice(list("acgt"), 15000))
    fna = root / "g.fna"
    write_fasta(fna, [("g", seq)], width=60)
    coords = []
    for i in range(25):
        start = int(rng.integers(1, 14000))
        ln = int(rng.integers(90, 600))
        if rng.random() < 0.5:
            coords.append(f"orf{i:03d} {start} {min(start + ln, 15000)}")
        else:
            coords.append(f"orf{i:03d} {min(start + ln, 15000)} {start}")
    ct = "\n".join(coords) + "\n"
    (root / "coords.txt").write_text(ct)
    return root, seq, ct


def _run(prog, *args, stdin=None):
    res = subprocess.run(
        [str(oracle.BIN / prog), *map(str, args)],
        input=stdin, capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr[-800:]
    return res.stdout


def test_anomaly(data):
    root, seq, ct = data
    want = _run("anomaly", root / "g.fna", root / "coords.txt")
    lines, ok_ct, prob_ct = ut.anomaly(seq, ct)
    assert "\n".join(lines) + ("\n" if lines else "") == want
    assert ok_ct + prob_ct == 25


def test_uncovered(data):
    root, seq, ct = data
    want = _run("uncovered", root / "g.fna", root / "coords.txt")
    buf = io.StringIO()
    write_fasta(buf, ut.uncovered(seq, ct), width=60)
    assert buf.getvalue() == want


@pytest.mark.parametrize("args,kw", [
    (("500", "250"), dict(percents=False)),
    (("-p", "300", "300"), dict(percents=True)),
])
def test_window_acgt(data, args, kw):
    root, seq, ct = data
    fasta_text = (root / "g.fna").read_text()
    want = _run("window-acgt", *args, stdin=fasta_text)
    wl = int(args[-2])
    ws = int(args[-1])
    assert ut.window_acgt(fasta_text, wl, ws, **kw) == want


def test_start_codon_distrib(data):
    root, seq, ct = data
    want = _run("start-codon-distrib", root / "g.fna", root / "coords.txt")
    assert ut.start_codon_distrib(seq, ct) == want
    want3 = _run("start-codon-distrib", "-3", root / "g.fna", root / "coords.txt")
    assert ut.start_codon_distrib(seq, ct, comma3=True) == want3


def test_multi_extract(data, tmp_path):
    root, seq, ct = data
    rng = np.random.default_rng(9)
    recs = [("g", seq), ("h", "".join(rng.choice(list("acgt"), 8000)))]
    fna = tmp_path / "multi.fna"
    write_fasta(fna, recs, width=60)
    mc = []
    for i in range(12):
        tag = "g" if i % 2 else "h"
        n = 15000 if tag == "g" else 8000
        start = int(rng.integers(1, n - 700))
        ln = int(rng.integers(90, 600))
        mc.append(f"gene{i:02d} {tag} {start} {start + ln}")
    mct = "\n".join(mc) + "\n"
    cf = tmp_path / "mcoords.txt"
    cf.write_text(mct)
    for extra, kw in [((), {}), (("-t",), dict(skip_stop=True))]:
        want = _run("multi-extract", *extra, fna, cf)
        buf = io.StringIO()
        write_fasta(buf, ut.multi_extract(recs, mct, **kw), width=60)
        assert buf.getvalue() == want


def test_entropy_score(data):
    root, seq, ct = data
    want = _run("entropy-score", root / "g.fna", root / "coords.txt")
    assert ut.entropy_score(seq, ct) == want


def test_entropy_fasta(data):
    root, seq, ct = data
    genes = "".join(f">gene{i}\n{seq[i*300:(i+1)*300]}\n" for i in range(5))
    want = _run("entropy-fasta", stdin=genes)
    recs = [(f"gene{i}", seq[i*300:(i+1)*300]) for i in range(5)]
    assert ut.entropy_fasta(recs) == want


def test_xlate_tables_match_reference_header():
    """All Genbank translation tables match xlate_tables.hh byte-for-byte."""
    import re

    from glimmer_mg_tpu.models import translate

    src = Path("/root/reference/src/Common/xlate_tables.hh")
    if not src.exists():
        pytest.skip("reference sources unavailable")
    ref = {
        int(m.group(1)): m.group(2)
        for m in re.finditer(
            r'CODON_XLATE_TABLE_(\d+)\s*\[\]\s*=\s*\n?\s*"([A-Z*]+)"',
            src.read_text(),
        )
    }
    ref[11] = ref[1]  # gene.cc:1039: case 11 shares the standard table
    assert set(ref) == set(translate.XLATE_TABLES)
    for code, table in ref.items():
        assert translate.XLATE_TABLES[code] == table, code
    with pytest.raises(ValueError):
        translate.xlate_table(7)


def test_gnu_hash_map_iteration_order(tmp_path):
    """utils/gnuhash reproduces __gnu_cxx::hash_map iteration order, which
    decides glimmer-mg classification-mode .predict record order."""
    import random

    from glimmer_mg_tpu.utils.gnuhash import gnu_hash_order

    if not oracle.available():
        pytest.skip("reference toolchain unavailable")
    src = tmp_path / "order.cc"
    src.write_text(
        "#include <ext/hash_map>\n#include <string>\n#include <cstdio>\n"
        "#include <iostream>\nusing namespace std;\n"
        "namespace __gnu_cxx { template<> struct hash<std::string> {\n"
        "  size_t operator()(const std::string& x) const\n"
        "  { return hash<const char*>()(x.c_str()); } }; }\n"
        "int main() { __gnu_cxx::hash_map<string,int> m; string line;\n"
        "  while (getline(cin, line)) if (!line.empty()) m[line] = 1;\n"
        "  for (__gnu_cxx::hash_map<string,int>::const_iterator it = m.begin();\n"
        "       it != m.end(); ++it) printf(\"%s\\n\", it->first.c_str());\n"
        "  return 0; }\n"
    )
    binary = tmp_path / "order"
    subprocess.run(
        ["g++", "-std=gnu++98", "-O2", "-w", str(src), "-o", str(binary)],
        check=True,
    )
    rng = random.Random(7)
    for n in (5, 193, 194, 600):  # crosses the 193->389->769 resizes
        keys = list(dict.fromkeys(
            f"/db/s{rng.randrange(999)}/NC_{rng.randrange(10**6)}.gicm"
            for _ in range(n)
        ))
        want = subprocess.run(
            [str(binary)], input="\n".join(keys) + "\n",
            capture_output=True, text=True,
        ).stdout.splitlines()
        assert gnu_hash_order(keys) == want, n
