#!/bin/bash
# Round-5 pre-registered 8-pair interleaved scaling matrix
# (BENCH/BASELINE.md "Round 5" declaration). Machine must be idle.
cd /root/repo
LOG=BENCH/scaling_r5_runs.log
echo "=== r5 pre-registered matrix start $(date -u) code $(git rev-parse --short HEAD)" >> $LOG
for p in 1 2 3 4 5 6 7 8; do
  echo "--- pair $p local[2] $(date -u +%H:%M:%S)" >> $LOG
  python tools/scaling_job.py 2 16000000 10000 2>/dev/null | tail -1 >> $LOG
  echo "--- pair $p local[8] $(date -u +%H:%M:%S)" >> $LOG
  python tools/scaling_job.py 8 16000000 10000 2>/dev/null | tail -1 >> $LOG
done
echo "=== r5 matrix done $(date -u)" >> $LOG
