#!/usr/bin/env python
"""Sample /proc/stat once per second and log CPU-time shares, steal
included. Run alongside any benchmark to attribute wall-time variance
to host co-tenancy (stolen cycles) instead of guessing: on this
Firecracker VM the hypervisor exposes steal accounting, so a run whose
window shows 15% steal lost those cycles to a co-tenant, not to the
code under test.

Usage: python tools/steal_monitor.py <out.jsonl> [duration_s]
Each line: {"t": unix_s, "user": %, "system": %, "idle": %,
"iowait": %, "steal": %} over the preceding 1 s window. Pure stdlib,
~zero overhead; safe to run during pre-registered matrices.

Summarize a window:
    python tools/steal_monitor.py --summarize <out.jsonl> <t0> <t1>
"""

from __future__ import annotations

import json
import sys
import time

FIELDS = ["user", "nice", "system", "idle", "iowait", "irq",
          "softirq", "steal"]


def _snap() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:9]]


def monitor(out_path: str, duration_s: float) -> None:
    end = time.time() + duration_s
    prev = _snap()
    with open(out_path, "a") as out:
        while time.time() < end:
            time.sleep(1.0)
            cur = _snap()
            d = [b - a for a, b in zip(prev, cur)]
            prev = cur
            tot = sum(d) or 1
            rec = {"t": round(time.time(), 1)}
            for name, v in zip(FIELDS, d):
                if name in ("user", "system", "idle", "iowait", "steal"):
                    rec[name] = round(100.0 * v / tot, 2)
            out.write(json.dumps(rec) + "\n")
            out.flush()


def summarize(path: str, t0: float, t1: float) -> None:
    rows = [json.loads(l) for l in open(path)]
    win = [r for r in rows if t0 <= r["t"] <= t1]
    if not win:
        print(json.dumps({"n": 0}))
        return
    def agg(key):
        vals = sorted(r[key] for r in win)
        return {"mean": round(sum(vals) / len(vals), 2),
                "p50": vals[len(vals) // 2],
                "max": vals[-1]}
    print(json.dumps({"n": len(win), "steal": agg("steal"),
                      "user": agg("user"), "idle": agg("idle")}))


if __name__ == "__main__":
    if sys.argv[1] == "--summarize":
        summarize(sys.argv[2], float(sys.argv[3]), float(sys.argv[4]))
    else:
        monitor(sys.argv[1],
                float(sys.argv[2]) if len(sys.argv) > 2 else 7200.0)
