"""Best-of-5 end-to-end reads/s on 50k tiled reads, host engine only."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
from glimmer_mg_tpu import bench_db
from glimmer_mg_tpu.engine import glimmer_mg as mg
from glimmer_mg_tpu.io.genome_data import GenomeData
CACHE = "/root/repo/.cache/bench_db"
classes, _ = bench_db.build_bench_db(CACHE)
reads1k, cls1k = bench_db.bench_reads_and_classes(classes)
reads, cls_lines = bench_db.tile_reads(reads1k, cls1k, 50000)
gd = GenomeData(os.path.join(CACHE, "genomeData"))
cls_map = {}
for line in cls_lines:
    p = line.split(); cls_map[p[0]] = p[1:]
def run():
    return list(mg.run_glimmer_mg_classes(reads, gd, cls_map, device_precompute=False))
run()
ts = []
for _ in range(5):
    t0 = time.time(); run(); ts.append(time.time() - t0)
print("runs", [round(t,3) for t in ts], "best reads/s", round(len(reads)/min(ts)))
