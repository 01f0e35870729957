#!/bin/bash
# Round-5 TPU queue #3: deconfounded perf matrix for the new code
# (row gather + tier-A compaction + Morton spatial sort), chunk=128.
cd /root/repo
exec 2>&1
python3 - <<'PYEOF'
import time, sys
sys.path.insert(0, "/root/repo")
from taichi_3d_gaussian_splatting_tpu.utils import device_lock
while device_lock.holder():
    time.sleep(60)
print("lock free at", time.strftime("%H:%M:%S"), flush=True)
PYEOF
run() {
  echo "=== $(date +%H:%M:%S) $* ==="
  timeout "$1" "${@:2}"
  echo "--- exit $? at $(date +%H:%M:%S) ---"
}
# 430k: defaults / no-spatial / col-gather
run 3600 env BENCH_TRAIN=0 BENCH_ITERS=50 python bench.py
run 3600 env BENCH_TRAIN=0 BENCH_ITERS=50 BENCH_SPATIAL_SORT=0 python bench.py
run 3600 env BENCH_TRAIN=0 BENCH_ITERS=50 BENCH_SLAB_GATHER=col python bench.py
# 2.08M: defaults / no-spatial / col-gather
run 7200 env BENCH_SCENE_KIND=heavy BENCH_POINTS=2080000 BENCH_TRAIN=0 BENCH_ITERS=20 python bench.py
run 7200 env BENCH_SCENE_KIND=heavy BENCH_POINTS=2080000 BENCH_TRAIN=0 BENCH_ITERS=20 BENCH_SPATIAL_SORT=0 python bench.py
run 7200 env BENCH_SCENE_KIND=heavy BENCH_POINTS=2080000 BENCH_TRAIN=0 BENCH_ITERS=20 BENCH_SLAB_GATHER=col python bench.py
# 1.03M defaults (the third reference scale)
run 7200 env BENCH_SCENE_KIND=heavy BENCH_POINTS=1030000 BENCH_TRAIN=0 BENCH_ITERS=30 python bench.py
# round-4 checkpoint inference bench (fixed PYTHONPATH: keep the axon site)
run 3600 env PYTHONPATH=/root/repo:/root/.axon_site python benchmark/inference_benchmark.py --scene /tmp/qb_full/logs/best_scene.parquet --iters 50
echo "QUEUE3 DONE $(date +%H:%M:%S)"
