"""Benchmarks on the real chip. Prints one JSON line per metric; the LAST
line is the primary end-to-end metric:

  {"metric": "glimmer_mg_reads_per_s", "value": N, "unit": "reads/s",
   "vs_baseline": N / <reference glimmer-mg reads/s on this machine>}

glimmer_mg_reads_per_s runs the COMPLETE glimmer-mg classification-mode
prediction pipeline (per-read model parameterization from class calls,
6-frame ICM LLR precompute, ORF/start scoring, event-graph DP, traceback)
over the 999 sample-run reads against a self-trained synthetic genomeData
DB (glimmer_mg_tpu.bench_db), producing byte-identical .predict output to
the reference binary compiled against the same DB. The baseline is that
reference binary's throughput measured on this machine (best of 4 runs,
single core — the reference has no intra-process parallelism).

The secondary metric icm_bank_scoring is the Phymm-classification kernel:
model-megabases scored per second per chip — a read of length L scored
against M models (both strands counted once via the fwd/rev max, matching
Phymm's per-read work unit of 2 strand passes) contributes L * M * 2 / 1e6
model-Mbp. Its baseline is the reference's single-core ICM scoring
throughput measured on this machine: ICM_t::Score_String = 7.43 Mbp/s per
model per core.

Kernel timing methodology: the execution relay to the remote chip both
memoizes repeat calls with identical inputs and adds tens of ms of
per-dispatch latency, so per-call host timing is meaningless. Instead N
classification steps run inside ONE jitted fori_loop, each step re-deriving
its input on device (jnp.roll by the step index) so no two steps see
identical data; a same-structure loop without the classifier measures the
dispatch + loop + fetch overhead, which is subtracted.
"""

import functools
import json
import os
import sys
import time

import numpy as np

REFERENCE_MBP_PER_S = 7.43  # C++ Score_String, single core, this machine
# Reference glimmer3 binary, run1 config (-u -12 -m NC_000915.icm) on the
# 1.67 Mb H. pylori genome, best of 3 on this machine (2026-08-20).
REFERENCE_G3_MBP_PER_S = 0.629
# Reference glimmer-mg binary, classification mode over the 999 sample-run
# reads vs the bench_db genomeData tree, best of 4 on this machine
# (2026-08-19; tools/measure_reference.py reproduces it).
REFERENCE_READS_PER_S = 1016.0

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")

N_MODELS = 16
READ_LEN = 510  # multiple of 3 for the frame-phase split
BATCH = 512
STEPS = 40


def build_inputs(n_models=N_MODELS, batch=BATCH):
    from glimmer_mg_tpu.io.fasta import read_fasta
    from glimmer_mg_tpu.models import icm as icm_mod
    from glimmer_mg_tpu.ops import icm_score
    from glimmer_mg_tpu.parallel.classify import pad_reads

    # Bank: the golden trained ICM plus perturbed copies (same tree shape,
    # jittered probabilities) — scoring cost is identical to real banks.
    base = icm_mod.read_icm(
        "/root/reference/sample-run/glimmer3/results/NC_000915.icm"
    )
    rng = np.random.default_rng(0)
    icms = []
    for i in range(n_models):
        m = icm_mod.ICM(
            base.model_len,
            base.model_depth,
            base.periodicity,
            base.mip.copy(),
            (base.probs * (1.0 + 0.01 * rng.standard_normal(base.probs.shape)))
            .astype(np.float32),
        )
        icms.append(m)
    mip, probs = icm_score.stack_bank(icms)

    recs = list(read_fasta("/root/reference/sample-run/glimmer-mg/seqs.fa"))
    seqs = [s.lower() for _, s in recs]
    while len(seqs) < batch:
        seqs = seqs + seqs
    seqs = seqs[:batch]
    reads, lengths = pad_reads(seqs, length=READ_LEN)
    lengths = np.minimum(lengths, READ_LEN)
    return mip, probs, reads, lengths


def bench_kernel(n_models=N_MODELS, batch=BATCH, steps=STEPS):
    import jax
    import jax.numpy as jnp

    from glimmer_mg_tpu.ops.icm_pallas import pack_tables
    from glimmer_mg_tpu.parallel.classify import classify_step_pallas

    mip, probs, reads, lengths = build_inputs(n_models, batch)
    tabs = pack_tables(mip, probs)
    dev = jax.devices()[0]
    tabs, reads, lengths = jax.device_put((tabs, reads, lengths), dev)

    @functools.partial(jax.jit, static_argnames=("n",))
    def many_steps(level_mip, probs_pk, reads, lengths, k0, n):
        def body(i, acc):
            r = jnp.roll(reads, k0 + i, axis=0)
            scores, best = classify_step_pallas(level_mip, probs_pk, r, lengths, 12, 7)
            return acc + scores.sum()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    @functools.partial(jax.jit, static_argnames=("n",))
    def many_noop(reads, k0, n):
        def body(i, acc):
            return acc + jnp.roll(reads, k0 + i, axis=0).sum()

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    t0 = time.time()
    float(many_steps(*tabs, reads, lengths, 0, steps))
    compile_s = time.time() - t0

    int(many_noop(reads, 0, steps))  # warm the noop loop
    t0 = time.time()
    int(many_noop(reads, 1, steps))
    overhead = time.time() - t0

    runs = []
    for rep in range(3):
        t0 = time.time()
        float(many_steps(*tabs, reads, lengths, 1 + rep, steps))
        runs.append(max(1e-9, (time.time() - t0 - overhead)) / steps)
    dt = min(runs)

    total_bp = int(np.sum(lengths))
    model_mbp = total_bp * n_models * 2 / 1e6  # fwd + revcomp passes
    value = model_mbp / dt

    # Memory + gather-roofline accounting (VERDICT r1 items 5/6). Per kernel
    # instance the VMEM-resident tables are one model+frame's walk levels
    # (lr rows) and packed prob pairs; the select-loops touch every row per
    # (8, 128) position block, so the achieved VPU gather rate is
    # positions * (walk rows + prob rows) elements per second.
    lr_rows = int(tabs[0].shape[2])
    pk_rows = int(tabs[1].shape[2])
    vmem_tables_kb = (lr_rows + pk_rows) * 128 * 4 / 1024.0
    hbm_tables_mb = (tabs[0].nbytes + tabs[1].nbytes) / 1e6
    positions_per_s = total_bp * n_models * 2 / dt
    gathers_per_s = positions_per_s * (lr_rows + pk_rows)
    return {
        "metric": "icm_bank_scoring",
        "value": round(value, 2),
        "unit": "Mbp*models/s",
        "vs_baseline": round(value / REFERENCE_MBP_PER_S, 2),
        "detail": {
            "backend": jax.default_backend(),
            "batch": int(reads.shape[0]),
            "read_len": READ_LEN,
            "models": n_models,
            "step_ms": round(dt * 1e3, 2),
            "step_ms_runs": [round(r * 1e3, 2) for r in runs],
            "steps": steps,
            "overhead_ms": round(overhead * 1e3, 1),
            "compile_s": round(compile_s, 1),
            "vmem_tables_kb_per_instance": round(vmem_tables_kb, 1),
            "hbm_tables_mb": round(hbm_tables_mb, 1),
            "walk_rows": lr_rows,
            "prob_rows": pk_rows,
            "vpu_gather_gelem_per_s": round(gathers_per_s / 1e9, 1),
        },
    }


N_BENCH_READS = 100000  # >= 100x the 999-read fixture; keeps best_s >= 2 s
# (raised 50k->100k in r3: the engine now clears ~26k reads/s, so 50k
# finished in under 2 s and the window was back inside OS-jitter range)


def _timed_runs(fn, n=4):
    times = []
    for _ in range(n):
        t0 = time.time()
        out = fn()
        times.append(time.time() - t0)
    return out, times


def _median(xs):
    a = sorted(xs)
    m = len(a) // 2
    return a[m] if len(a) % 2 else 0.5 * (a[m - 1] + a[m])


def _med_mad(times):
    """Median and median-absolute-deviation (VERDICT r3 task 9: the
    published number is the median; best-of-N and the spread ride in
    detail)."""
    med = _median(times)
    mad = _median([abs(x - med) for x in times])
    return med, mad


def bench_reads_per_s():
    """End-to-end glimmer-mg classification-mode prediction throughput.

    Primary configuration: the native C++ engine (ORF scan, start/error
    scanning, RBS + feature scoring, event DP, traceback) with its own
    6-frame tree walk, over the 999 sample reads tiled to 50k (distinct
    headers, classes replicated) — best-of-4 after one warm pass, spread
    reported.  Output is byte-identical to the reference binary
    (tests/test_native.py, tests/test_glimmer_mg.py).

    The device configuration (native DP + exact-f32 Pallas 6-frame
    precompute, engine "native+device") is measured on the untiled 999
    reads and reported in detail: per-base LLR shipping costs ~12 KB/read
    and this rig's device tunnel moves ~35 MB/s, so recomputing the walk on
    the host (~10 us/read wall on 2 cores after the AVX-512 fused walk) wins here; the device path is the
    right configuration when host<->device bandwidth is PCIe-class.  Its
    output is byte-identical too (the Pallas tables are exact f32).
    """
    from glimmer_mg_tpu import bench_db, native
    from glimmer_mg_tpu.engine import glimmer_mg as mg
    from glimmer_mg_tpu.io.genome_data import GenomeData

    db = os.path.join(CACHE_DIR, "bench_db")
    t0 = time.time()
    classes, _genomes = bench_db.build_bench_db(db)
    db_s = time.time() - t0
    reads1k, class_lines1k = bench_db.bench_reads_and_classes(classes)
    reads, class_lines = bench_db.tile_reads(reads1k, class_lines1k,
                                             N_BENCH_READS)
    gd = GenomeData(os.path.join(db, "genomeData"))
    cls_map = {}
    for line in class_lines:
        parts = line.split()
        cls_map[parts[0]] = parts[1:]

    def run(rd, device):
        return list(
            mg.run_glimmer_mg_classes(rd, gd, cls_map, device_precompute=device)
        )

    t0 = time.time()
    run(reads, False)
    cold_s = time.time() - t0

    results, times = _timed_runs(lambda: run(reads, False), n=5)
    best = min(times)
    med, mad = _med_mad(times)
    n_genes = sum(len(g) for _h, g in results)

    # chunk-size sensitivity (reference streams 500k-read chunks,
    # glimmer-mg.cc:130-131; ours is a pipeline depth knob)
    chunk_s = {}
    for chunk in ("256", "2048"):
        os.environ["GLIMMER_MG_TPU_CHUNK"] = chunk
        _, t = _timed_runs(lambda: run(reads, False), n=1)
        chunk_s[chunk] = round(len(reads) / t[0], 1)
    os.environ.pop("GLIMMER_MG_TPU_CHUNK", None)

    # device configuration on the untiled read set (shipping the tiled
    # reads' LLR tables over this tunnel would measure the tunnel, not the
    # work) — in a child process under a timeout, like the kernel rows
    import subprocess

    dev_timeout = int(os.environ.get("GLIMMER_BENCH_DEVICE_TIMEOUT", "900"))
    try:
        res_d = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--device-config"],
            timeout=dev_timeout,
            capture_output=True, text=True,
        )
        dev_line = [l for l in res_d.stdout.splitlines() if l.startswith("{")]
        dev_detail = (json.loads(dev_line[-1]) if dev_line
                      else {"error": "no output", "stderr": res_d.stderr[-300:]})
    except subprocess.TimeoutExpired:
        dev_detail = {
            "error": f"TPU tunnel hang: no device-config result in {dev_timeout}s"
        }
    except Exception as e:  # pragma: no cover
        dev_detail = {"error": str(e)[:200]}

    # chip-resident configuration (on-device ORF scan + event DP;
    # VERDICT r3 task 1): same child-process isolation
    try:
        res_r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--device-resident"],
            timeout=int(os.environ.get("GLIMMER_BENCH_DEVRES_TIMEOUT", "1800")),
            capture_output=True, text=True,
        )
        res_line = [l for l in res_r.stdout.splitlines() if l.startswith("{")]
        devres_detail = (json.loads(res_line[-1]) if res_line
                         else {"error": "no output",
                               "stderr": res_r.stderr[-300:]})
    except subprocess.TimeoutExpired:
        devres_detail = {"error": "TPU tunnel hang: no device-resident result"}
    except Exception as e:  # pragma: no cover
        devres_detail = {"error": str(e)[:200]}

    # The published value is the MEDIAN of 5 runs (best-of-N on this noisy
    # 2-core rig overstated r3 by ~15%; VERDICT r3 task 9). The reference
    # baseline was measured best-of-4, which favors the reference — so the
    # ratio below is conservative.
    value = len(reads) / med
    out = {
        "metric": "glimmer_mg_reads_per_s",
        "value": round(value, 1),
        "unit": "reads/s",
        "vs_baseline": round(value / REFERENCE_READS_PER_S, 2),
        "detail": {
            "reads": len(reads),
            "genes": n_genes,
            "engine": "native" if native.available() else "python",
            "threads": native.default_threads(),
            "median_s": round(med, 3),
            "mad_s": round(mad, 3),
            "best_s": round(best, 3),
            "reads_per_s_best": round(len(reads) / best, 1),
            "runs_s": [round(x, 3) for x in times],
            "cold_s": round(cold_s, 1),
            "db_build_s": round(db_s, 1),
            "reads_per_s_by_chunk": chunk_s,
            "device_config": dev_detail,
            "device_resident": devres_detail,
            "reference_reads_per_s": REFERENCE_READS_PER_S,
            "note": "r4: value = median of 5 runs (was best-of-4); "
                    "reference baseline remains best-of-4 (conservative)",
        },
    }
    print(json.dumps(out), flush=True)


def bench_glimmer3():
    """Whole-genome glimmer3 (run1 config) on the 1.67 Mb sample genome.

    The full per-sequence pipeline — ORF scan, per-ORF cumulative ICM
    scoring + start scan, event DP, traceback — through the native engine
    (gmg_g3_full), byte-identical to the golden run1 .predict
    (tests/test_glimmer3.py::test_sample_run_golden).  Baseline: the
    reference glimmer3 binary compiled from /root/reference, same config,
    same machine.
    """
    from glimmer_mg_tpu.engine import glimmer3 as g3
    from glimmer_mg_tpu.io.fasta import read_fasta
    from glimmer_mg_tpu.models import icm as icm_mod

    sample = "/root/reference/sample-run/glimmer3"
    recs = list(read_fasta(f"{sample}/NC_000915.fna"))
    m = icm_mod.read_icm(f"{sample}/results/NC_000915.icm")

    def run():
        return g3.format_predict(list(g3.run_glimmer3(recs, m, logodds_fudge=-12)))

    golden_ok = run() == open(f"{sample}/results/NC_000915.run1.predict").read()
    _out, times = _timed_runs(run, n=4)
    best = min(times)
    bp = sum(len(s) for _h, s in recs)
    value = bp / 1e6 / best
    print(json.dumps({
        "metric": "glimmer3_whole_genome",
        "value": round(value, 3),
        "unit": "Mbp/s",
        "vs_baseline": round(value / REFERENCE_G3_MBP_PER_S, 2),
        "detail": {
            "genome_mbp": round(bp / 1e6, 2),
            "best_s": round(best, 3),
            "runs_s": [round(x, 3) for x in times],
            "byte_identical_run1": golden_ok,
            "reference_mbp_per_s": REFERENCE_G3_MBP_PER_S,
            "note": "new row in r3 (native whole-genome path)",
        },
    }), flush=True)


def _setup_jax_cache():
    # Persistent compilation cache: remote TPU compiles are minutes; repeat
    # bench invocations should pay them once.
    import jax

    os.makedirs(CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE_DIR, "jit"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _kernel_rows():
    _setup_jax_cache()
    k16 = bench_kernel()
    # realistic Phymm bank scale (hundreds of ICMs, scoreReadsGlim.pl
    # scores every read against every genome model): same kernel, 256-model
    # grid — summarized inside the primary metric's detail
    k256 = bench_kernel(n_models=256, batch=128, steps=8)
    k16["detail"]["bank256"] = {
        k: k256["detail"][k]
        for k in ("models", "batch", "step_ms", "compile_s", "hbm_tables_mb")
    }
    k16["detail"]["bank256"]["value_mbp_models_per_s"] = k256["value"]
    print(json.dumps(k16), flush=True)


def _device_config_row():
    """Child-process half of the device-configuration measurement.

    Also the REAL-CHIP parity verification (VERDICT r3 task 5): the device
    run's .predict text is byte-diffed against the host-walk run's on this
    hardware (the interpret-mode Pallas tests prove the semantics; this
    proves the Mosaic-compiled tables), and one compiled (non-interpret)
    shard_map Pallas classification runs on a 1-device mesh and is checked
    against the unsharded kernel.
    """
    from glimmer_mg_tpu import bench_db
    from glimmer_mg_tpu.engine import glimmer_mg as mg
    from glimmer_mg_tpu.io.genome_data import GenomeData

    db = os.path.join(CACHE_DIR, "bench_db")
    classes, _genomes = bench_db.build_bench_db(db)
    reads1k, class_lines1k = bench_db.bench_reads_and_classes(classes)
    gd = GenomeData(os.path.join(db, "genomeData"))
    cls_map = {}
    for line in class_lines1k:
        parts = line.split()
        cls_map[parts[0]] = parts[1:]

    def run(device):
        return list(mg.run_glimmer_mg_classes(reads1k, gd, cls_map,
                                              device_precompute=device))

    run(True)  # compile + warm
    res_d, t_d = _timed_runs(lambda: run(True), n=5)
    res_h = run(False)
    parity = (mg.format_predict_mg(res_d) == mg.format_predict_mg(res_h))

    sharded_ok = None
    try:
        import jax
        import jax.numpy as jnp

        from glimmer_mg_tpu.ops.icm_pallas import pack_tables
        from glimmer_mg_tpu.parallel.classify import (
            classify_step_pallas, classify_step_pallas_sharded)

        mip, probs, reads, lengths = build_inputs(n_models=4, batch=64)
        tabs = pack_tables(mip, probs)
        mesh = jax.make_mesh((1, 1), ("data", "model"))
        s_sh, _ = classify_step_pallas_sharded(
            mesh, *tabs, jnp.asarray(reads), jnp.asarray(lengths),
            12, 7, interpret=False)
        s_un, _ = classify_step_pallas(*tabs, jnp.asarray(reads),
                                       jnp.asarray(lengths), 12, 7)
        sharded_ok = bool(
            np.array_equal(np.asarray(jax.device_get(s_sh)),
                           np.asarray(jax.device_get(s_un))))
    except Exception as e:  # pragma: no cover
        sharded_ok = f"error: {str(e)[:160]}"

    med, mad = _med_mad(t_d)
    print(json.dumps({
        "reads": len(reads1k),
        "reads_per_s": round(len(reads1k) / med, 1),
        "median_s": round(med, 3),
        "mad_s": round(mad, 3),
        "runs_s": [round(x, 3) for x in t_d],
        "engine": "native+device",
        "parity": parity,
        "sharded_pallas_compiled": sharded_ok,
        "note": "median of 5; per-base f32 LLR pair ~12KB/read vs ~35MB/s "
                "tunnel; host walk ~10us/read wins on this rig",
    }), flush=True)


def _device_resident_row():
    """Chip-resident prediction (ops.device_predict): 6-frame precompute,
    ORF scan, event DP, and traceback all on the accelerator; only
    ~50-byte gene records cross the host link, so this configuration's
    reads/s multiplies with chip count (dryrun_multichip shards it over
    the data axis). Parity = coordinate-identical to the host native
    engine on the same reads, verified here on hardware."""
    import time as _t

    from glimmer_mg_tpu import bench_db
    from glimmer_mg_tpu.engine import glimmer_mg as mg
    from glimmer_mg_tpu.io.genome_data import GenomeData

    db = os.path.join(CACHE_DIR, "bench_db")
    classes, _genomes = bench_db.build_bench_db(db)
    reads1k, class_lines1k = bench_db.bench_reads_and_classes(classes)
    gd = GenomeData(os.path.join(db, "genomeData"))
    cls_map = {}
    for line in class_lines1k:
        parts = line.split()
        cls_map[parts[0]] = parts[1:]

    def run():
        return {
            h: [(g.id, g.start, g.stop, g.frame) for g in gs]
            for h, gs in mg.run_glimmer_mg_classes(
                reads1k, gd, cls_map, device_precompute=False)
        }

    host = run()
    os.environ["GLIMMER_MG_TPU_DEVICE_DP"] = "1"
    os.environ.setdefault("GLIMMER_MG_TPU_DEVICE_DP_F32", "1")
    run()  # compile + warm
    _res, t_d = _timed_runs(run, n=5)
    dev = run()
    os.environ.pop("GLIMMER_MG_TPU_DEVICE_DP", None)
    parity = sum(1 for h in host if host[h] != dev.get(h)) == 0
    med, mad = _med_mad(t_d)
    print(json.dumps({
        "reads": len(reads1k),
        "reads_per_s": round(len(reads1k) / med, 1),
        "median_s": round(med, 3),
        "mad_s": round(mad, 3),
        "reads_per_s_best": round(len(reads1k) / min(t_d), 1),
        "runs_s": [round(x, 3) for x in t_d],
        "engine": "device_resident (on-chip ORF scan + event DP, f32 carry)",
        "parity": parity,
        "note": "median of 5; ~0.13 MB/1k reads up (2-bit packed), "
                "~50 B/read gene calls down; scales with chips "
                "(dryrun_multichip data-shards it)",
    }), flush=True)


def _accuracy_row():
    """Gene-level accuracy scoreboard (VERDICT r3 task 6): full-pipeline
    sensitivity/precision on NC_000915 fragments vs the reference's own
    golden whole-genome calls (the only reference-endorsed gene-coordinate
    truth that ships — map.txt carries read provenance, not gene coords,
    and the source genomes/annotations are missing blobs). Runs on CPU: a
    correctness row, kept off the flaky device tunnel."""
    from glimmer_mg_tpu.pipeline import accuracy

    wk = os.path.join(CACHE_DIR, "accuracy_wk")
    out = accuracy.simulated_benchmark(
        wk, n_reads=300, read_len=500,
        db_root=os.path.join(CACHE_DIR, "accuracy_db"))
    print(json.dumps({
        "metric": "gene_accuracy",
        "value": out["sensitivity"],
        "unit": "sensitivity",
        "vs_baseline": out["sensitivity"],  # fraction of perfect recall
        "detail": out,
    }), flush=True)


KERNEL_TIMEOUT_S = int(os.environ.get("GLIMMER_BENCH_KERNEL_TIMEOUT", "1500"))


def main():
    # The chip-dependent kernel rows run in a child process under a
    # timeout: the remote-TPU tunnel has been observed to wedge
    # indefinitely mid-dispatch, and a hung kernel bench must not take the
    # (host-side) end-to-end rows down with it.
    import subprocess

    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--kernel"],
            timeout=KERNEL_TIMEOUT_S, capture_output=True, text=True,
        )
        printed = False
        for line in res.stdout.splitlines():
            if line.startswith("{"):
                # compact the kernel row so the driver's tail capture never
                # clips it (BENCH_r04 lost this row's head to truncation)
                try:
                    row = json.loads(line)
                    d = row.get("detail")
                    if isinstance(d, dict):
                        keep = ("walk_us", "step_ms", "compile_s", "models",
                                "batch", "bank256", "value_mbp_models_per_s",
                                "hbm_tables_mb")
                        row["detail"] = {k: d[k] for k in keep if k in d}
                        line = json.dumps(row)
                except Exception:
                    pass
                print(line, flush=True)
                printed = True
        if not printed:
            print(json.dumps({
                "metric": "icm_bank_scoring", "value": 0.0,
                "unit": "Mbp*models/s", "vs_baseline": 0.0,
                "detail": {"error": "kernel bench produced no output",
                           "stderr": res.stderr[-400:]},
            }), flush=True)
    except subprocess.TimeoutExpired:
        print(json.dumps({
            "metric": "icm_bank_scoring", "value": 0.0,
            "unit": "Mbp*models/s", "vs_baseline": 0.0,
            "detail": {"error": f"TPU tunnel hang: no result in "
                                f"{KERNEL_TIMEOUT_S}s (see BENCH_r02.json "
                                f"for the last healthy-tunnel kernel run)"},
        }), flush=True)

    # Accuracy scoreboard in a CPU child process (correctness row; keep it
    # independent of the device tunnel and of this process's JAX state).
    try:
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        res_a = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--accuracy"],
            timeout=int(os.environ.get("GLIMMER_BENCH_ACC_TIMEOUT", "1200")),
            capture_output=True, text=True, env=env,
        )
        printed = False
        for line in res_a.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
                printed = True
        if not printed:
            print(json.dumps({
                "metric": "gene_accuracy", "value": 0.0, "unit": "sensitivity",
                "vs_baseline": 0.0,
                "detail": {"error": "accuracy row produced no output",
                           "stderr": res_a.stderr[-400:]},
            }), flush=True)
    except subprocess.TimeoutExpired:
        print(json.dumps({
            "metric": "gene_accuracy", "value": 0.0, "unit": "sensitivity",
            "vs_baseline": 0.0, "detail": {"error": "accuracy row timed out"},
        }), flush=True)

    _setup_jax_cache()
    bench_glimmer3()
    bench_reads_per_s()


if __name__ == "__main__":
    if "--kernel" in sys.argv:
        _setup_jax_cache()
        sys.exit(_kernel_rows())
    if "--device-config" in sys.argv:
        _setup_jax_cache()
        sys.exit(_device_config_row())
    if "--device-resident" in sys.argv:
        _setup_jax_cache()
        sys.exit(_device_resident_row())
    if "--accuracy" in sys.argv:
        sys.exit(_accuracy_row())
    sys.exit(main())
