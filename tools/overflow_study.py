"""Device-path capacity study (VERDICT r5 task 7).

Measures, on NC_000915-derived fragments at realistic read lengths, the
per-read event-count distribution and the fraction of reads that fall
back to the host engine because of either device capacity limit:
  - MAX_EVENTS (event tensor rows, ops/device_predict.py)
  - WINDOW_ROWS (re-link row window; wovf flag)

Run on CPU:  python tools/overflow_study.py  [n_reads_per_len]
Numbers are recorded in COMPONENTS.md.
"""
import collections
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["GLIMMER_MG_TPU_DEVICE_DP"] = "1"
os.environ["GLIMMER_MG_TPU_NATIVE"] = "0"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from glimmer_mg_tpu.engine import glimmer_mg as mg
from glimmer_mg_tpu.io.fasta import read_fasta
from glimmer_mg_tpu.models import icm as icm_mod
from glimmer_mg_tpu.ops import device_predict as dpk


def main(n_per_len=300):
    (_h, genome), = read_fasta(
        "/root/reference/sample-run/glimmer3/NC_000915.fna")
    genome = genome.lower()
    gicm = icm_mod.read_icm(
        "/root/reference/sample-run/glimmer3/results/NC_000915.icm")
    rng = np.random.default_rng(5)

    # n_events (pre-clip, with wovf folded in as MAX_EVENTS+1) comes back
    # from predict_batch_device; running once with the row window widened
    # to E (wovf impossible) and once normally separates the two causes
    cap = collections.defaultdict(list)
    orig = dpk.predict_batch_device

    def spy(*a, **k):
        outs = orig(*a, **k)
        cap["ne"].append(np.asarray(outs[-1]))
        return outs

    dpk.predict_batch_device = spy
    W0 = dpk.WINDOW_ROWS
    try:
        for rl in (500, 1000, 1500, 2000):
            reads = []
            for i in range(n_per_len):
                st = int(rng.integers(0, len(genome) - rl))
                reads.append((f"frag{i}", genome[st:st + rl]))

            def collect():
                cap["ne"].clear()
                dpk._JIT_CACHE.clear()
                for _ in mg.run_glimmer_mg(reads, gicm,
                                           device_precompute=False):
                    pass
                return np.concatenate(cap["ne"])[:n_per_len]

            dpk.WINDOW_ROWS = dpk.MAX_EVENTS
            ne_true = collect()
            dpk.WINDOW_ROWS = W0
            ne_norm = collect()
            ev_ovf = float((ne_true > dpk.MAX_EVENTS).mean())
            w_ovf = float(((ne_norm > dpk.MAX_EVENTS)
                           & (ne_true <= dpk.MAX_EVENTS)).mean())
            ne = np.minimum(ne_true, 10 * dpk.MAX_EVENTS)
            print(
                f"len {rl:5d}: events/read p50={int(np.median(ne))} "
                f"p90={int(np.percentile(ne, 90))} "
                f"p99={int(np.percentile(ne, 99))} max={int(ne.max())}  "
                f"MAX_EVENTS({dpk.MAX_EVENTS}) ovf={ev_ovf:.3%}  "
                f"WINDOW_ROWS({W0}) ovf={w_ovf:.3%}",
                flush=True,
            )
    finally:
        dpk.predict_batch_device = orig
        dpk.WINDOW_ROWS = W0
        dpk._JIT_CACHE.clear()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
