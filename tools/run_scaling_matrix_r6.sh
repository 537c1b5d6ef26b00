#!/bin/bash
# Round-6 pre-registered matrix (declared in BENCH/BASELINE.md at end of
# round 5, before any r6 trial): 8 interleaved local[2]/local[8] pairs,
# tools/scaling_job.py {2|8} 16000000 10000, FINAL r6 code, machine
# otherwise idle; steal_monitor logs the entire window (annotation
# only); one 3-pair scale-8 host_ceiling_calibration adjacent.
cd /root/repo
LOG=BENCH/scaling_r6_runs.log
STEAL=BENCH/steal_r6.jsonl
python tools/steal_monitor.py $STEAL 14000 &
STEAL_PID=$!
echo "=== r6 pre-registered matrix start $(date -u) code $(git rev-parse --short HEAD)" >> $LOG
for p in 1 2 3 4 5 6 7 8; do
  echo "--- pair $p local[2] $(date -u +%H:%M:%S)" >> $LOG
  python tools/scaling_job.py 2 16000000 10000 2>/dev/null | tail -1 >> $LOG
  echo "--- pair $p local[8] $(date -u +%H:%M:%S)" >> $LOG
  python tools/scaling_job.py 8 16000000 10000 2>/dev/null | tail -1 >> $LOG
done
echo "=== r6 matrix done $(date -u)" >> $LOG
echo "=== r6 host ceiling calibration (scale 8) start $(date -u)" >> $LOG
for p in 1 2 3; do
  echo "--- hc pair $p local[2] $(date -u +%H:%M:%S)" >> $LOG
  python tools/host_ceiling_calibration.py 2 8 2>/dev/null | tail -1 >> $LOG
  echo "--- hc pair $p local[8] $(date -u +%H:%M:%S)" >> $LOG
  python tools/host_ceiling_calibration.py 8 8 2>/dev/null | tail -1 >> $LOG
done
echo "=== r6 calibration done $(date -u)" >> $LOG
kill $STEAL_PID 2>/dev/null
