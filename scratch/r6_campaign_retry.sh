#!/bin/bash
# Relaunch the 400k-target campaign until it actually steps, riding out
# tunnel outages. Each attempt's backend init blocks while the tunnel is
# down; an UNAVAILABLE error exits the attempt and we back off 10 min.
# GT views are cached in /tmp/qb_full_r6/images so retries are cheap.
# Success test: metrics.jsonl grows.
cd /root/repo
exec 2>&1
for attempt in 1 2 3 4 5 6; do
  echo "=== attempt $attempt at $(date -u +%H:%M:%S) ==="
  QB_OUT=/tmp/qb_full_r6 QB_FULL_POINTS=60000 QB_FULL_DETAIL=4 \
    QB_FULL_DENSIFY_TH=2e-6 QB_FULL_RATIO=12 \
    timeout 21600 python -u benchmark/quality_benchmark.py --full \
    > /tmp/qb_r6_a$attempt.log 2>&1
  rc=$?
  echo "--- attempt $attempt exit $rc at $(date -u +%H:%M:%S) ---"
  if [ -s /tmp/qb_full_r6/logs/metrics.jsonl ] && [ $rc -eq 0 ]; then
    echo "CAMPAIGN OK"
    break
  fi
  if [ -s /tmp/qb_full_r6/logs/metrics.jsonl ]; then
    echo "CAMPAIGN STEPPED BUT FAILED (rc=$rc) - not retrying blindly"
    break
  fi
  echo "no steps recorded; backing off 600s"
  sleep 600
done
echo "RETRY WRAPPER DONE $(date -u +%H:%M:%S)"
