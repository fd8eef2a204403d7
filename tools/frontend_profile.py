"""Stage-level timing of the device-predict frontend on the real chip."""
import os, sys, time

os.environ.pop("JAX_PLATFORMS", None)
os.environ["GLIMMER_MG_TPU_DEVICE_DP_F32"] = "1"
os.environ["GLIMMER_MG_TPU_DEVICE_DP"] = "1"
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jit")
from glimmer_mg_tpu import bench_db
from glimmer_mg_tpu.engine import glimmer_mg as mg
from glimmer_mg_tpu.io.genome_data import GenomeData
from glimmer_mg_tpu.ops import device_predict as dpk

db = os.path.join("/root/repo/.cache", "bench_db")
classes, _ = bench_db.build_bench_db(db)
reads1k, class_lines = bench_db.bench_reads_and_classes(classes)
gd = GenomeData(os.path.join(db, "genomeData"))
cls_map = {l.split()[0]: l.split()[1:] for l in class_lines}

# capture one chunk's inputs
cap = {}
orig = dpk.predict_batch_device
def spy(bank, reads, lengths, groups, gene6, ind6, cache_key=None, f64=None):
    if "bank" not in cap or reads.shape[0] > cap["reads"].shape[0]:
        cap.update(bank=bank, reads=np.asarray(reads),
                   lengths=np.asarray(lengths), groups=np.asarray(groups),
                   gene6=np.asarray(gene6), ind6=np.asarray(ind6))
    return orig(bank, reads, lengths, groups, gene6, ind6,
                cache_key=cache_key, f64=f64)
dpk.predict_batch_device = spy
for _ in mg.run_glimmer_mg_classes(reads1k, gd, cls_map,
                                   device_precompute=False):
    pass
dpk.predict_batch_device = orig
bank = cap["bank"]
reads, lens, grp = cap["reads"], cap["lengths"], cap["groups"]
gene6, ind6 = cap["gene6"], cap["ind6"]
B, L0 = reads.shape
Lp = L0 + (-L0) % 3
print(f"captured chunk: B={B} L0={L0} Lp={Lp}", flush=True)

consts = dict(min_gene_len=bank.min_gene_len, max_olap=bank.max_olap,
              event_threshold=bank.event_threshold,
              start_threshold=bank.start_threshold,
              ws=bank.ribosome_window, W=bank.pwm_w, f64=False)
bj = dpk._bank_jnp(bank)
pad = Lp - L0
reads_p = jnp.pad(jnp.asarray(reads, jnp.int32), ((0, 0), (0, pad)))
g6 = jnp.pad(jnp.asarray(gene6), ((0, 0), (0, 0), (0, pad)))
i6 = jnp.pad(jnp.asarray(ind6), ((0, 0), (0, 0), (0, pad)))
lens_j = jnp.asarray(lens, jnp.int32)
grp_j = jnp.asarray(grp, jnp.int32)

def stage_fn(upto):
    def one(seq, n, gi, g6r, i6r):
        t = dpk._read_tables(seq, n, gi, bj)
        if upto == "tables":
            return sum(jnp.sum(v) for v in t.values() if v.dtype != bool)
        fw = dpk._fwd_orf_slots(t, n, Lp, consts["min_gene_len"])
        rv = dpk._rev_orf_slots(t, n, Lp, consts["min_gene_len"])
        if upto == "orfslots":
            return jnp.sum(fw["lo"]) + jnp.sum(rv["lo"])
        Sf, Sr = dpk._frame_prefix_sums(g6r, i6r, n, Lp)
        pw = dpk._pwm_window_tables(
            dpk._pwm_arrays(seq, n, gi, bj, consts["W"]),
            n, Lp, consts["ws"], consts["W"]) if consts["W"] else None
        if upto == "pwm":
            return jnp.sum(Sf) + jnp.sum(Sr) + (sum(jnp.sum(v) for v in pw.values()) if isinstance(pw, dict) else (jnp.sum(pw[0]) if pw is not None else 0.0))
        std_f, tr_f, braw_f, anyev_f = dpk._start_candidates_fwd(
            t, fw, n, Lp, gi, bj, Sf, pw, consts)
        std_r, tr_r, braw_r, anyev_r = dpk._start_candidates_rev(
            t, rv, n, Lp, gi, bj, Sr, pw, consts)
        if upto == "starts":
            return jnp.sum(std_f["score"]) + jnp.sum(std_r["score"])
        ev, n_events = dpk._frontend_one(seq, n, gi, g6r, i6r, bj, Lp, consts)
        return jnp.sum(ev["score"]) + jnp.sum(n_events)
    def run(reads, lens, grp, g6, i6):
        return one(reads, lens, grp, g6, i6)
    return jax.jit(run)

for name in ["tables", "orfslots", "pwm", "starts", "assemble"]:
    f = stage_fn(name)
    t0 = time.perf_counter()
    jax.block_until_ready(f(reads_p, lens_j, grp_j, g6, i6))
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(reads_p, lens_j, grp_j, g6, i6))
        ts.append(time.perf_counter() - t0)
    print(f"through {name:9s}: {min(ts)*1000:8.1f} ms (compile {tc:.0f}s)",
          flush=True)
