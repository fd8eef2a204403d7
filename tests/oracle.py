"""Build and invoke the reference C++ binaries as correctness oracles.

The reference sources are mounted read-only at /root/reference; we compile
them out-of-tree under /tmp/ref (no reference code enters this repo — the
binaries only produce golden outputs for parity tests). Skips gracefully if
the reference tree is unavailable.
"""

from __future__ import annotations

import os
import subprocess
from pathlib import Path

REF_SRC = Path("/root/reference/src")
BUILD = Path("/tmp/ref/src")
BIN = BUILD / "bin"
OBJ = BUILD / "obj"

_LIB_SOURCES = [
    "Common/delcher.cc",
    "Common/fasta.cc",
    "Common/gene.cc",
    "Common/kelley.cc",
    "ICM/icm.cc",
    "Glimmer/glimmer_base.cc",
]

# program -> (source, needs glimmer_base)
_PROGRAMS = {
    "build-icm": ("ICM/build-icm.cc", False),
    "build-fixed": ("ICM/build-fixed.cc", False),
    "score-fixed": ("ICM/score-fixed.cc", False),
    "glimmer3": ("Glimmer/glimmer3.cc", True),
    "glimmer-mg": ("Glimmer/glimmer-mg.cc", True),
    "long-orfs": ("Glimmer/long-orfs.cc", False),
    "anomaly": ("Glimmer/anomaly.cc", False),
    "extract": ("Util/extract.cc", False),
    "multi-extract": ("Util/multi-extract.cc", False),
    "uncovered": ("Util/uncovered.cc", False),
    "window-acgt": ("Util/window-acgt.cc", False),
    "entropy-profile": ("Util/entropy-profile.cc", False),
    "entropy-fasta": ("Util/entropy-fasta.cc", False),
    "entropy-score": ("Util/entropy-score.cc", False),
    "start-codon-distrib": ("Util/start-codon-distrib.cc", False),
}

_ORACLE_DRIVER = r"""
// Oracle driver: load an ICM and print per-base scores for stdin strings.
// usage: icm_oracle <icm> <frame> [cum|frame|total]
#include "icm.hh"
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
extern int Verbose;
int main(int argc, char** argv) {
  if (argc < 3) { fprintf(stderr, "usage: icm_oracle icm frame [mode]\n"); return 1; }
  ICM_t icm;
  icm.Read(argv[1]);
  int frame = atoi(argv[2]);
  const char* mode = argc > 3 ? argv[3] : "cum";
  static char buf[1 << 22];
  while (fgets(buf, sizeof buf, stdin)) {
    int n = strlen(buf);
    while (n > 0 && (buf[n-1] == '\n' || buf[n-1] == '\r')) buf[--n] = 0;
    if (n == 0) continue;
    std::string s(buf);
    if (!strcmp(mode, "total")) {
      printf("%.17g\n", icm.Score_String(buf, n, frame));
    } else {
      std::vector<double> sc;
      if (!strcmp(mode, "cum")) icm.Cumulative_Score(s, sc, frame);
      else icm.Frame_Score(s, sc, frame);
      for (size_t i = 0; i < sc.size(); i++)
        printf("%.17g%c", sc[i], i + 1 == sc.size() ? '\n' : ' ');
    }
  }
  return 0;
}
"""

_CXX = ["g++", "-std=gnu++98", "-O2", "-w"]
_INC = ["-I", str(BUILD / "Common"), "-I", str(BUILD / "ICM"), "-I", str(BUILD / "Glimmer")]


def available() -> bool:
    return REF_SRC.is_dir()


def ensure_built() -> Path:
    """Build (once) all oracle binaries; return the bin directory."""
    if not available():
        raise RuntimeError("reference sources not available")
    stamp = BIN / ".complete"
    if stamp.exists():
        return BIN
    BIN.mkdir(parents=True, exist_ok=True)
    OBJ.mkdir(parents=True, exist_ok=True)
    # Mirror sources into the build tree (read-only mount can't be built in).
    for sub in ("Common", "ICM", "Glimmer", "Util"):
        dst = BUILD / sub
        dst.mkdir(parents=True, exist_ok=True)
        for f in (REF_SRC / sub).iterdir():
            target = dst / f.name
            if not target.exists():
                target.write_bytes(f.read_bytes())
    objs = []
    for src in _LIB_SOURCES:
        obj = OBJ / (Path(src).stem + ".o")
        objs.append(str(obj))
        if not obj.exists():
            subprocess.run(
                _CXX + _INC + ["-c", str(BUILD / src), "-o", str(obj)], check=True
            )
    base_obj = str(OBJ / "glimmer_base.o")
    lib_objs = [o for o in objs if o != base_obj]
    for prog, (src, needs_base) in _PROGRAMS.items():
        out = BIN / prog
        if out.exists():
            continue
        link = lib_objs + ([base_obj] if needs_base else [])
        subprocess.run(
            _CXX + _INC + [str(BUILD / src)] + link + ["-o", str(out)], check=True
        )
    drv = BUILD / "icm_oracle.cc"
    drv.write_text(_ORACLE_DRIVER)
    if not (BIN / "icm_oracle").exists():
        subprocess.run(
            _CXX + _INC + [str(drv)] + lib_objs + ["-o", str(BIN / "icm_oracle")],
            check=True,
        )
    stamp.write_text("ok")
    return BIN


def run(prog: str, *args, stdin_data: str | None = None, cwd=None) -> str:
    """Run an oracle binary; return stdout."""
    bin_dir = ensure_built()
    res = subprocess.run(
        [str(bin_dir / prog)] + [str(a) for a in args],
        input=stdin_data,
        capture_output=True,
        text=True,
        cwd=cwd,
    )
    if res.returncode != 0:
        raise RuntimeError(f"{prog} failed: {res.stderr[:2000]}")
    return res.stdout


def icm_scores(icm_path, strings, frame: int, mode: str = "cum"):
    """Per-base (or total) scores from the reference ICM implementation."""
    import numpy as np

    out = run("icm_oracle", icm_path, frame, mode, stdin_data="\n".join(strings) + "\n")
    rows = [np.array([float(x) for x in line.split()]) for line in out.splitlines()]
    return rows
