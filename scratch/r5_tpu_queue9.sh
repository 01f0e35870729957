#!/bin/bash
# Round-5 TPU queue #9 (post-campaign): re-attribute the packed8 frames +
# bench the new campaign checkpoint + final default warm.
# 1. per-op trace at 2.08M with the packed8 defaults (where does 51.8 ms
#    sit now that the gather is off the cliff?)
# 2. trained-checkpoint inference bench on the r6 campaign's best scene
# 3. default-config bench.py warm (the driver's BENCH_r05 run must be a
#    cache hit)
cd /root/repo
exec 2>&1
run() {
  echo "=== $(date +%H:%M:%S) $* ==="
  timeout "$1" "${@:2}"
  echo "--- exit $? at $(date +%H:%M:%S) ---"
}
run 7200 env BENCH_SCENE_KIND=heavy BENCH_POINTS=2080000 TRACE_DIR=/tmp/heavy_trace_p8 python scratch/perf_r3_trace.py 10
run 1200 python scratch/trace_analysis.py /tmp/heavy_trace_p8 10
if [ -f /tmp/qb_full_r6/logs/best_scene.parquet ]; then
  run 7200 env BENCH_SCENE=/tmp/qb_full_r6/logs/best_scene.parquet BENCH_TRAIN=0 BENCH_ITERS=30 python bench.py
fi
run 7200 env BENCH_ITERS=50 python bench.py
echo "QUEUE9 DONE $(date +%H:%M:%S)"
