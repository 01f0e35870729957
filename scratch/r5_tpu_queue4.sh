#!/bin/bash
# Round-5 TPU queue #4: bisect the 430k regression (74.52 with round-4 code
# this morning -> 71.52 with the round-5 perf commit). Morton is already
# ruled out (neutral at 430k) and now defaults off; prime suspect is tier-A
# compaction (adds a ~290k-index 5-column pool gather to save ~0.5 ms of
# sort at this scale). Then re-measure the heavy scales with the winner.
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
# 430k: tier-A off, row vs col gather (spatial sort now defaults off)
run 3600 env BENCH_TRAIN=0 BENCH_ITERS=50 BENCH_TIER_A=0 python bench.py
run 3600 env BENCH_TRAIN=0 BENCH_ITERS=50 BENCH_TIER_A=0 BENCH_SLAB_GATHER=col python bench.py
# 2.08M: tier-A off, row vs col
run 7200 env BENCH_SCENE_KIND=heavy BENCH_POINTS=2080000 BENCH_TRAIN=0 BENCH_ITERS=20 BENCH_TIER_A=0 python bench.py
run 7200 env BENCH_SCENE_KIND=heavy BENCH_POINTS=2080000 BENCH_TRAIN=0 BENCH_ITERS=20 BENCH_TIER_A=0 BENCH_SLAB_GATHER=col python bench.py
# 1.03M: tier-A off (row)
run 7200 env BENCH_SCENE_KIND=heavy BENCH_POINTS=1030000 BENCH_TRAIN=0 BENCH_ITERS=30 BENCH_TIER_A=0 python bench.py
echo "QUEUE4 DONE $(date +%H:%M:%S)"
