#!/bin/bash
# Round-5 TPU queue #2: megapoint-gap attribution + A/Bs.
# Launch: nohup scratch/r5_tpu_queue2.sh > /tmp/r5_queue2.log 2>&1 &
#         echo $! > /tmp/r5_queue2.pid
# Never kill the in-flight python (wedge rules, CLAUDE.md).
cd /root/repo
exec 2>&1
python3 - <<'EOF'
import time, sys
sys.path.insert(0, "/root/repo")
from taichi_3d_gaussian_splatting_tpu.utils import device_lock
while device_lock.holder():
    time.sleep(60)
print("lock free at", time.strftime("%H:%M:%S"), flush=True)
EOF
run() {
  echo "=== $(date +%H:%M:%S) $* ==="
  timeout "$1" "${@:2}"
  echo "--- exit $? at $(date +%H:%M:%S) ---"
}
# 1. gather formulation A/B (fixed methodology): the megapoint frame is
#    mostly the (16, MK) slab gather; decides the round-5 kernel change
run 3600 python scratch/perf_gather_ab.py
# 2. per-op trace at 2.08M: exact sort/gather/blend attribution
run 7200 python scratch/perf_trace_heavy.py
# 3. chunk=256 A/B (chunk=64 is Mosaic-infeasible: DMA slices must be
#    128-aligned; 256 amortizes DMA issue + loop overhead at heavy scale)
run 3600 env BENCH_TRAIN=0 BENCH_ITERS=50 BENCH_CHUNK=256 python bench.py
run 7200 env BENCH_SCENE_KIND=heavy BENCH_POINTS=2080000 BENCH_TRAIN=0 BENCH_ITERS=20 BENCH_CHUNK=256 python bench.py
# 4. the round-4 trained checkpoint through the real inference benchmark
#    (VERDICT item 7: close the quality->perf loop)
run 3600 env PYTHONPATH=/root/repo python benchmark/inference_benchmark.py --scene /tmp/qb_full/logs/best_scene.parquet --iters 50
echo "QUEUE2 DONE $(date +%H:%M:%S)"
