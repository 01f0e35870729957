#!/bin/bash
# Round-5 TPU queue #7 (final): packed-meta A/Bs at the two scales.
# 1. 2.08M default (first heavy measurement since pool_meta='packed' landed)
# 2. 430k tier-A x packed (queue6 hypothesis: compaction wins once the
#    5-column pool gather is gone)
# 3. 2.08M tier-A x packed
cd /root/repo
exec 2>&1
run() {
  echo "=== $(date +%H:%M:%S) $* ==="
  timeout "$1" "${@:2}"
  echo "--- exit $? at $(date +%H:%M:%S) ---"
}
run 7200 env BENCH_SCENE_KIND=heavy BENCH_POINTS=2080000 BENCH_TRAIN=0 BENCH_ITERS=20 python bench.py
run 3600 env BENCH_TRAIN=0 BENCH_ITERS=50 BENCH_TIER_A=1 python bench.py
run 7200 env BENCH_SCENE_KIND=heavy BENCH_POINTS=2080000 BENCH_TRAIN=0 BENCH_ITERS=20 BENCH_TIER_A=1 python bench.py
echo "QUEUE7 DONE $(date +%H:%M:%S)"
