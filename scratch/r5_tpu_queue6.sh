#!/bin/bash
# Round-5 TPU queue #6: packed pool-meta A/Bs (runs after queue5's campaign
# + checkpoint bench + default warm). Hypothesis: with pool_meta='packed'
# (category-sort payloads instead of the 5-column pool gather), tier-A
# compaction becomes profitable again - it removes the dense 2N tier-A
# padding rows from the main key sort without buying a gather.
cd /root/repo
exec 2>&1
if [ -f /tmp/r5_queue5.pid ]; then
  while kill -0 "$(cat /tmp/r5_queue5.pid)" 2>/dev/null; do sleep 60; done
fi
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
# 430k: packed meta x tier-A on (the hypothesis), vs current default
run 3600 env BENCH_TRAIN=0 BENCH_ITERS=50 BENCH_TIER_A=1 python bench.py
run 3600 env BENCH_TRAIN=0 BENCH_ITERS=50 python bench.py
# 2.08M: packed meta x tier-A on
run 7200 env BENCH_SCENE_KIND=heavy BENCH_POINTS=2080000 BENCH_TRAIN=0 BENCH_ITERS=20 BENCH_TIER_A=1 python bench.py
echo "QUEUE6 DONE $(date +%H:%M:%S)"
