"""int8 bank-kernel quantization study (VERDICT r3 task 3).

Measures — instead of arguing — what 8-bit prob tables do to the Phymm
classification path on a realistic bank: argmax flip rate vs the exact
walk, top1-top2 margin distribution, and the per-bp drift of the top
score (the quantity that feeds combine_predictions' -0.013/bp
arbitration, scripts/glimmer-mg.py:310-377).

Bank: 256 perturbed copies of the golden trained NC_000915 ICM (same tree
shape and scale as real Phymm models — bench.py's build_inputs recipe).
Reads: the 999 sample-run reads, fwd/rev max like scoreReadsGlim.pl.

Run on CPU (quantization effects are device-independent; the kernels
are bit-exact vs these quantized walks — tests/test_parallel.py and the
pack_tables_int8 interpret check). step_ms on hardware comes from
bench.py's kernel row.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_models=256, n_reads=999, perturb=0.01):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from glimmer_mg_tpu.io.fasta import read_fasta
    from glimmer_mg_tpu.models import icm as icm_mod
    from glimmer_mg_tpu.ops import icm_pallas, icm_score
    from glimmer_mg_tpu.parallel.classify import pad_reads, revcomp_reads

    base = icm_mod.read_icm(
        "/root/reference/sample-run/glimmer3/results/NC_000915.icm"
    )
    rng = np.random.default_rng(0)
    icms = []
    for _ in range(n_models):
        icms.append(icm_mod.ICM(
            base.model_len, base.model_depth, base.periodicity,
            base.mip.copy(),
            (base.probs * (1.0 + perturb * rng.standard_normal(base.probs.shape))
             ).astype(np.float32),
        ))
    mip, probs = icm_score.stack_bank(icms)

    recs = list(read_fasta("/root/reference/sample-run/glimmer-mg/seqs.fa"))
    seqs = [s.lower() for _h, s in recs[:n_reads]]
    reads, lengths = pad_reads(seqs, length=510)
    lengths = np.minimum(lengths, 510)

    def quant(p, scale, lo):
        p = np.maximum(p, np.float32(lo))
        return (np.clip(np.rint(p * scale), -scale * -lo, 0) / scale).astype(
            np.float32
        )

    p16 = quant(probs, icm_pallas.FIXED_SCALE, -32768.0 / icm_pallas.FIXED_SCALE)
    p8 = quant(probs, 8.0, -16.0)

    def score_all(ptab):
        out = np.zeros((len(seqs), n_models), dtype=np.float32)
        bs = 128
        mj = jnp.asarray(mip)
        pj = jnp.asarray(ptab)
        for lo in range(0, len(seqs), bs):
            r = jnp.asarray(reads[lo : lo + bs])
            ln = jnp.asarray(lengths[lo : lo + bs])
            fwd = icm_score.bank_score_reads(mj, pj, r, ln, 12, 7)
            rc = revcomp_reads(r, ln)
            rev = icm_score.bank_score_reads(mj, pj, rc, ln, 12, 7)
            out[lo : lo + bs] = np.asarray(jnp.maximum(fwd, rev))
        return out

    s_exact = score_all(probs)
    s_16 = score_all(p16)
    s_8 = score_all(p8)

    def stats(s, name):
        a_e = np.argmax(s_exact, axis=1)
        a_q = np.argmax(s, axis=1)
        flips = int((a_e != a_q).sum())
        top = np.max(s_exact, axis=1)
        part = np.partition(s_exact, -2, axis=1)
        margin_bp = (top - part[:, -2]) / lengths[: len(top)]
        drift_bp = np.abs(
            np.max(s, axis=1) - top
        ) / lengths[: len(top)]
        return {
            "name": name,
            "argmax_flips": flips,
            "flip_rate": round(flips / len(a_e), 5),
            "top_margin_bp_median": float(np.median(margin_bp)),
            "top_margin_bp_p5": float(np.percentile(margin_bp, 5)),
            "top_score_drift_bp_max": float(drift_bp.max()),
            "top_score_drift_bp_median": float(np.median(drift_bp)),
        }

    out = {
        "n_models": n_models,
        "n_reads": len(seqs),
        "perturb": perturb,
        "fixed16": stats(s_16, "fixed16 (1/256)"),
        "int8": stats(s_8, "int8 (1/8)"),
        "arbitration_threshold_bp": 0.013,
    }
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    # two bank flavors: near-duplicate models (1% jitter — the adversarial
    # case: tiny true margins, flips largely between equivalent models)
    # and a more diverse bank (15% jitter — closer to cross-taxon margins)
    main(perturb=0.01)
    main(perturb=0.15)
