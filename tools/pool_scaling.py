#!/usr/bin/env python
"""Pool a pre-registered scaling matrix log into the headline numbers.

Parses a BENCH/scaling_r*_runs.log written by run_scaling_matrix_r*.sh
(alternating ``--- pair N local[C] HH:MM:SS`` headers and one-line run
JSONs) and prints, per pair: both walls, speedup, efficiency
(speedup / cpu-ratio), and the mean/max steal over each run's window
from the matching steal jsonl. The headline is the POOLED UNADJUSTED
efficiency: (sum of low-cpu walls / sum of high-cpu walls) / ratio —
the same statistic every round's BASELINE.md reports, computed here
instead of by hand so the arithmetic is reviewable.

Usage:
    python tools/pool_scaling.py BENCH/scaling_r6_runs.log \
        [BENCH/steal_r6.jsonl]
"""

from __future__ import annotations

import datetime as dt
import json
import re
import sys


def _load_steal(path: str | None):
    if not path:
        return []
    rows = []
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return rows


def _steal_window(steal, t0: float, t1: float):
    vals = [r["steal"] for r in steal if t0 <= r["t"] <= t1]
    if not vals:
        return None, None
    return sum(vals) / len(vals), max(vals)


def main() -> None:
    log_path = sys.argv[1]
    steal = _load_steal(sys.argv[2] if len(sys.argv) > 2 else None)

    # anchor HH:MM:SS timestamps to the matrix-start date line
    base_date = None
    runs = []  # (pair, cpus, start_epoch, wall_s)
    pending = None
    hdr = re.compile(r"^--- ((?:hc |s\d+ )?pair) (\d+) local\[(\d+)\] "
                     r"(\d\d):(\d\d):(\d\d)")
    for line in open(log_path):
        m = re.match(r"^=== .* start (.+ UTC \d{4})", line)
        if m and base_date is None:
            base_date = dt.datetime.strptime(
                m.group(1), "%a %b %d %H:%M:%S UTC %Y")
        m = hdr.match(line)
        if m:
            kind = m.group(1)
            pair, cpus, hh, mm, ss = (int(g) for g in m.groups()[1:])
            t = None
            if base_date is not None:
                t = base_date.replace(hour=hh, minute=mm, second=ss)
                if t < base_date:  # crossed midnight
                    t += dt.timedelta(days=1)
                t = t.replace(tzinfo=dt.timezone.utc).timestamp()
            pending = (kind, pair, cpus, t)
            continue
        if line.startswith("{") and pending is not None:
            row = json.loads(line)
            kind, pair, cpus, t = pending
            pending = None
            # host-ceiling calibration lines carry per-stage secs, not a
            # job wall — they are annotation, not poolable throughput
            if "wall_s" in row:
                runs.append(((kind, pair), row.get("cpus", cpus), t,
                             float(row["wall_s"])))

    by_pair: dict[tuple, dict[int, tuple]] = {}
    for pair, cpus, t, wall in runs:
        by_pair.setdefault(pair, {})[cpus] = (t, wall)

    lo_cpu = min(c for p in by_pair.values() for c in p)
    hi_cpu = max(c for p in by_pair.values() for c in p)
    ratio = hi_cpu / lo_cpu
    sum_lo = sum_hi = 0.0
    print(f"pair  local[{lo_cpu}]  local[{hi_cpu}]  speedup  eff"
          f"    steal lo(mean/max)  hi(mean/max)")
    for pair in sorted(by_pair):
        p = by_pair[pair]
        label = f"{pair[0]} {pair[1]}"
        if lo_cpu not in p or hi_cpu not in p:
            print(f"{label:>8}  INCOMPLETE ({sorted(p)})")
            continue
        (t_lo, w_lo), (t_hi, w_hi) = p[lo_cpu], p[hi_cpu]
        sum_lo += w_lo
        sum_hi += w_hi
        eff = (w_lo / w_hi) / ratio
        ann = ["-/-", "-/-"]
        for i, (t0, w) in enumerate(((t_lo, w_lo), (t_hi, w_hi))):
            if t0 is not None and steal:
                mean, mx = _steal_window(steal, t0, t0 + w)
                if mean is not None:
                    ann[i] = f"{mean:.2f}%/{mx:.1f}%"
        print(f"{label:>8}  {w_lo:8.2f}  {w_hi:8.2f}  {w_lo / w_hi:6.2f}x"
              f"  {eff:.4f}  {ann[0]:>14}  {ann[1]:>12}")
    if sum_hi:
        pooled = (sum_lo / sum_hi) / ratio
        print(f"\npooled unadjusted: sum[{lo_cpu}]={sum_lo:.1f}s "
              f"sum[{hi_cpu}]={sum_hi:.1f}s speedup={sum_lo / sum_hi:.3f}x "
              f"efficiency={pooled:.4f} (gate >= 0.8: "
              f"{'PASS' if pooled >= 0.8 else 'FAIL'})")


if __name__ == "__main__":
    main()
