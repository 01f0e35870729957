#!/bin/bash
# Round-5 TPU queue #5: rowb gather A/B, then the >=400k-point quality
# campaign (VERDICT item 6), then the trained-checkpoint bench (item 7),
# then the final default-config cache warm for the driver's bench.py.
#
# Campaign sizing: round 4's "plateau at 171k points" was the pool cap
# (30k init x ratio 6 = 180k). 40k init x ratio 14 = 560k pool, detail-3
# texture octaves drive densification into the 400k+ regime.
cd /root/repo
exec 2>&1
# wait for queue4 to fully exit first (lock gaps between its jobs), then
# for the lock
if [ -f /tmp/r5_queue4.pid ]; then
  while kill -0 "$(cat /tmp/r5_queue4.pid)" 2>/dev/null; do sleep 30; done
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
# rowb: barrier AFTER the transpose so the gather reads a materialized
# row-major table (hypothesis: XLA fuses the transpose into the gather in
# mode "row", degrading to strided reads - 12.5 vs 6.6 ns/idx at 2.08M)
run 3600 env BENCH_TRAIN=0 BENCH_ITERS=50 BENCH_SLAB_GATHER=rowb python bench.py
run 7200 env BENCH_SCENE_KIND=heavy BENCH_POINTS=2080000 BENCH_TRAIN=0 BENCH_ITERS=20 BENCH_SLAB_GATHER=rowb python bench.py
# the >=400k campaign (GT views pre-rendered at /tmp/qb_full_r5/images)
run 16200 env QB_OUT=/tmp/qb_full_r5 QB_FULL_DETAIL=3 QB_FULL_POINTS=40000 QB_FULL_RATIO=14 python benchmark/quality_benchmark.py --full
# bench the campaign's trained checkpoint (reference protocol:
# benchmark/inference_benchmark.py on the trained scene)
run 3600 env PYTHONPATH=/root/repo:/root/.axon_site python benchmark/inference_benchmark.py --scene /tmp/qb_full_r5/logs/best_scene.parquet --iters 30
# re-warm the driver's exact default-config cache (BENCH_TRAIN=1)
run 5400 python bench.py
echo "QUEUE5 DONE $(date +%H:%M:%S)"
