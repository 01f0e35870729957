#!/bin/bash
# Round-5 TPU queue (prepared at end of round 4 — NOT yet run).
# Launch: nohup scratch/r5_tpu_queue.sh > /tmp/r5_queue.log 2>&1 &
#         echo $! > /tmp/r5_queue.pid
# Stop between jobs by killing the QUEUE bash pid only — never the
# in-flight python (a timeout/kill mid-compile wedges the axon tunnel
# for hours, CLAUDE.md). Keep the chip free near round end: the driver
# runs plain `python bench.py` for BENCH_r05.json.
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
# 1. warm the driver's exact cache first (render + train at 430k)
run 5400 python bench.py
# 2. the missing reference-scale number: 2.08M heavy (bar 15.01 ms);
#    generous timeout — the ~6.6M-row ladder compile has never been timed
run 10800 env BENCH_SCENE_KIND=heavy BENCH_POINTS=2080000 BENCH_TRAIN=0 BENCH_ITERS=30 python bench.py
# 3. A/Bs toward >=1.2x at 430k
run 3600 env BENCH_TRAIN=0 BENCH_ITERS=50 BENCH_CHUNK=64 python bench.py
run 1800 python scratch/perf_exp2_probe.py
run 1800 python scratch/perf_r3_trace.py
echo "QUEUE DONE $(date +%H:%M:%S)"
