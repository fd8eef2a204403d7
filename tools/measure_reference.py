"""Measure the reference glimmer-mg binary's end-to-end reads/s baseline.

Compiles the reference (out-of-tree, tests/oracle.py) against the synthetic
bench DB and times classification-mode prediction over the 999 sample-run
reads. The best-of-N figure is pinned as bench.REFERENCE_READS_PER_S.

Usage: python tools/measure_reference.py [n_runs]
"""

import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from glimmer_mg_tpu import bench_db  # noqa: E402


def main(n_runs: int = 4) -> None:
    db = Path(__file__).resolve().parent.parent / ".cache" / "bench_db"
    classes, _ = bench_db.build_bench_db(db)
    reads, class_lines = bench_db.bench_reads_and_classes(classes)
    binary = bench_db.build_reference_classes_binary(db)
    best = float("inf")
    with tempfile.TemporaryDirectory() as td:
        cf = Path(td) / "seqs.class.txt"
        cf.write_text("".join(line + "\n" for line in class_lines))
        sf = Path(td) / "seqs.fa"
        sf.write_text("".join(f">{h}\n{s}\n" for h, s in reads))
        for i in range(n_runs):
            t0 = time.time()
            subprocess.run(
                [binary, "-c", str(cf), str(sf), str(Path(td) / "out")],
                check=True, capture_output=True,
            )
            dt = time.time() - t0
            best = min(best, dt)
            print(f"run {i}: {dt:.3f}s = {len(reads) / dt:.0f} reads/s")
    print(f"best: {len(reads) / best:.1f} reads/s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
