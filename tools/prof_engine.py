"""Per-phase native-engine profile over 50k tiled reads (gmg_set_profiling).

Run on a QUIET machine (see memory: the 2-core rig is contention-noisy);
JAX stays on CPU so the TPU tunnel is out of the loop.
"""
import ctypes, os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")  # keep the chip out of it
from glimmer_mg_tpu import bench_db, native
from glimmer_mg_tpu.engine import glimmer_mg as mg
from glimmer_mg_tpu.io.genome_data import GenomeData

CACHE = "/root/repo/.cache/bench_db"
classes, _ = bench_db.build_bench_db(CACHE)
reads1k, cls1k = bench_db.bench_reads_and_classes(classes)
reads, cls_lines = bench_db.tile_reads(reads1k, cls1k, 50000)
gd = GenomeData(os.path.join(CACHE, "genomeData"))
cls_map = {}
for line in cls_lines:
    p = line.split()
    cls_map[p[0]] = p[1:]

def run():
    return list(mg.run_glimmer_mg_classes(reads, gd, cls_map, device_precompute=False))

run()  # warm
lib = native._lib
lib.gmg_set_profiling.argtypes = [ctypes.c_int32]
lib.gmg_get_phase_ns.argtypes = [ctypes.POINTER(ctypes.c_int64)]
lib.gmg_set_profiling(1)
t0 = time.time()
res = run()
wall = time.time() - t0
out = (ctypes.c_int64 * 8)()
lib.gmg_get_phase_ns(out)
lib.gmg_set_profiling(0)
names = ["prep", "orfs", "walk", "stops", "scinit", "score", "dp", "trace"]
tot = sum(out) / 1e9
print(f"wall {wall:.3f}s  reads/s {len(reads)/wall:.0f}  core-time in engine {tot:.3f}s")
for n_, v in zip(names, out):
    print(f"  {n_:6s} {v/1e9:7.3f}s  {100*v/1e9/tot:5.1f}%  {v/1e3/len(reads):6.2f} us/read")
print(f"  engine total {tot/len(reads)*1e6:.1f} us(core)/read; non-engine wall {(wall - tot/2):.3f}s")
