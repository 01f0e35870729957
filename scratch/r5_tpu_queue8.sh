#!/bin/bash
# Round-5 TPU queue #8: packed8 slab-format A/Bs.
# 0. tiny Mosaic-lowering probe (fail fast, abort queue on FAIL)
# 1. 2.08M auto (-> packed8): the megapoint headline experiment
# 2. 1.03M auto (-> packed8): the mid-scale point
# 3. 1.03M wide16 (control at the same build, round-4 number was 30.13)
# 4. 430k forced packed8 (below-cliff check; default stays wide16 there)
cd /root/repo
exec 2>&1
run() {
  echo "=== $(date +%H:%M:%S) $* ==="
  timeout "$1" "${@:2}"
  echo "--- exit $? at $(date +%H:%M:%S) ---"
}
echo "=== $(date +%H:%M:%S) probe_packed8_tpu ==="
timeout 1800 python scratch/probe_packed8_tpu.py
rc=$?
echo "--- probe exit $rc at $(date +%H:%M:%S) ---"
if [ $rc -ne 0 ]; then
  echo "QUEUE8 ABORT: packed8 probe failed"
  exit 1
fi
run 7200 env BENCH_SCENE_KIND=heavy BENCH_POINTS=2080000 BENCH_TRAIN=0 BENCH_ITERS=20 python bench.py
run 7200 env BENCH_SCENE_KIND=heavy BENCH_POINTS=1030000 BENCH_TRAIN=0 BENCH_ITERS=30 python bench.py
run 7200 env BENCH_SCENE_KIND=heavy BENCH_POINTS=1030000 BENCH_TRAIN=0 BENCH_ITERS=30 BENCH_SLAB_FORMAT=wide16 python bench.py
run 3600 env BENCH_TRAIN=0 BENCH_ITERS=50 BENCH_SLAB_FORMAT=packed8 python bench.py
echo "QUEUE8 DONE $(date +%H:%M:%S)"
