"""Ablation timing of the device DP step on the real chip (r5).

Locates the wall-clock inside the chip-resident path by swapping
_event_dp/_traceback for stubbed variants (NOT correctness-preserving).
Run from /root/repo:  python tools/dp_ablate.py
"""
import os, sys, time

os.environ.pop("JAX_PLATFORMS", None)
os.environ["GLIMMER_MG_TPU_DEVICE_DP_F32"] = "1"
os.environ["GLIMMER_MG_TPU_DEVICE_DP"] = "1"
sys.path.insert(0, "/root/repo")

import numpy as np
import jax

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
print("reads:", len(reads1k), "backend:", jax.default_backend(), flush=True)


def run():
    t0 = time.perf_counter()
    for _ in mg.run_glimmer_mg_classes(reads1k, gd, cls_map,
                                       device_precompute=False):
        pass
    return time.perf_counter() - t0


def timed(tag, n=3):
    dpk._JIT_CACHE.clear()
    t_c = run()  # compile + warm
    ts = sorted(run() for _ in range(n))
    print(f"{tag:28s} median {ts[n // 2]:.3f}s  (compile-run {t_c:.1f}s)",
          flush=True)
    return ts[n // 2]


import jax.numpy as jnp

orig_dp = dpk._event_dp
orig_tb = dpk._traceback


def dp_stub(ev, gi, bank, consts, ne=None):
    E = ev["pos"].shape[0]
    return ev["score"], jnp.full(E, -2, jnp.int32), jnp.full(6, -1, jnp.int32)


def tb_stub(ev, score, bp, best, ne=None):
    z = jnp.zeros(dpk.MAX_GENES, jnp.int32)
    return (z, z, z, z, jnp.zeros(dpk.MAX_GENES, bool),
            jnp.zeros(dpk.MAX_GENES, jnp.float64), jnp.int32(0))


# variant: full DP but walks disabled (copy of _event_dp with walk_set -> noop)
import types, inspect, re

src = inspect.getsource(orig_dp)
src_nowalk = src.replace("def _event_dp(", "def _event_dp_nowalk(")
src_nowalk = src_nowalk.replace(
    "_q, disq, _it = jax.lax.while_loop(\n            cond, body, (q0, disq, jnp.int32(0))\n        )",
    "pass")
assert "while_loop" not in src_nowalk, "walk not stubbed"
ns = vars(dpk).copy()
exec(compile(src_nowalk, "<nowalk>", "exec"), ns)
dp_nowalk = ns["_event_dp_nowalk"]

mode = sys.argv[1] if len(sys.argv) > 1 else "all"

if mode in ("all", "full"):
    timed("full")
if mode in ("all", "nowalk"):
    dpk._event_dp = dp_nowalk
    timed("dp, walks stubbed")
    dpk._event_dp = orig_dp
if mode in ("all", "notb"):
    dpk._traceback = tb_stub
    timed("traceback stubbed")
    dpk._traceback = orig_tb
if mode in ("all", "nodp"):
    dpk._event_dp = dp_stub
    dpk._traceback = tb_stub
    timed("dp+tb stubbed (frontend)")
    dpk._event_dp = orig_dp
    dpk._traceback = orig_tb


def tb_stub_dce_safe(ev, score, bp, best, ne=None):
    # keeps the DP alive (outputs depend on score/bp/best) but replaces the
    # traceback loop with cheap reductions
    z = jnp.zeros(dpk.MAX_GENES, jnp.int32)
    s = (jnp.sum(score) + jnp.sum(bp) + jnp.sum(best)).astype(jnp.float64)
    return (z + bp[0], z, z, z, jnp.zeros(dpk.MAX_GENES, bool),
            jnp.zeros(dpk.MAX_GENES, jnp.float64) + s, jnp.int32(0))


if mode == "dponly":
    dpk._traceback = tb_stub_dce_safe
    timed("DP real, tb dce-safe stub")
    dpk._traceback = orig_tb


def bdp_stub(ev, adj, consts, ne):
    B, E = ev["pos"].shape
    return (ev["score"], jnp.full((B, E), -2, jnp.int32),
            jnp.full((B, 6), -1, jnp.int32))


def btb_stub_dce(ev, score, bp, best, ne):
    B, E = ev["pos"].shape
    zg = jnp.zeros((B, dpk.MAX_GENES), jnp.int32)
    s = (jnp.sum(score, axis=1) + jnp.sum(bp, axis=1)
         + jnp.sum(best, axis=1).astype(score.dtype))
    return (zg, zg, zg, zg, jnp.zeros((B, dpk.MAX_GENES), bool),
            jnp.zeros((B, dpk.MAX_GENES), jnp.float64) + s[:, None],
            jnp.zeros(B, jnp.int32))


orig_bdp = dpk._event_dp_batched
orig_btb = dpk._traceback_batched

if mode == "bfront":
    dpk._event_dp_batched = bdp_stub
    dpk._traceback_batched = btb_stub_dce
    timed("batched: frontend only")
if mode == "bdponly":
    dpk._traceback_batched = btb_stub_dce
    timed("batched: front+DP, tb stub")

# walk-free batched DP
import inspect as _insp
_src = _insp.getsource(orig_bdp)
_src = _src.replace("def _event_dp_batched(", "def _bdp_nowalk(")
_src = _src.replace(
    """        _q, disq, _it = jax.lax.while_loop(
            cond, body, (q0, disq, jnp.int32(0))
        )
        return disq""",
    """        return disq""")
_ns = vars(dpk).copy()
exec(compile(_src, "<bnowalk>", "exec"), _ns)
if mode == "bnowalk":
    dpk._event_dp_batched = _ns["_bdp_nowalk"]
    timed("batched: walks stubbed")
