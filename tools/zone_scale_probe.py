#!/usr/bin/env python
"""Zone-membership scale probe (VERDICT r5 wrong #1 'done' evidence).

Measures the per-batch cost of the streaming geofence membership
kernel — exactly the code zone_membership_udf runs per Arrow batch
(cell encode -> cover-index probe -> bbox prefilter -> ray-cast PIP
over candidates) — against the naive every-zone-every-point loop the
old implementation used, at growing zone counts over a fixed point
batch. The new path's cost must track CANDIDATES (flat for disjoint
zones), not the zone count.

Usage: python tools/zone_scale_probe.py [n_points] [zone_counts...]
Defaults: 200000 points; zones 100 1000 10000 40000.

No Spark session needed: this is the executor hot path, driver-built
index included, probed in-process (the Spark plumbing around it is
pinned by tests/test_package_streaming_errors.py).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tdei_backend_service_spark.core import cells, geom  # noqa: E402
from tdei_backend_service_spark.streaming.zones import (  # noqa: E402
    build_zone_index)


def lattice_zones(n: int) -> list[bytes]:
    """~sqrt(n) x sqrt(n) disjoint rectangles, 0.008 deg in a 0.01 grid."""
    side = int(np.ceil(np.sqrt(n)))
    step, w = 0.01, 0.008
    blobs = []
    for k in range(n):
        x0 = (k % side) * step
        y0 = (k // side) * step
        blobs.append(geom.wkb_polygon([(x0, y0), (x0 + w, y0),
                                       (x0 + w, y0 + w), (x0, y0 + w),
                                       (x0, y0)]))
    return blobs


def batch_indexed(px, py, depth, index, box, g):
    cell = cells.encode(px, py, depth)
    row_idx, cand = index.probe(cell)
    if row_idx.size:
        keep = ((px[row_idx] >= box[cand, 0]) & (px[row_idx] <= box[cand, 2])
                & (py[row_idx] >= box[cand, 1])
                & (py[row_idx] <= box[cand, 3]))
        row_idx, cand = row_idx[keep], cand[keep]
    if row_idx.size:
        inside = geom.point_in_polygon(px[row_idx], py[row_idx], cand, g)
        row_idx, cand = row_idx[inside], cand[inside]
    return row_idx, cand


def batch_naive(px, py, n_zones, g):
    hits = 0
    for j in range(n_zones):
        idx = np.full(px.size, j, dtype=np.int64)
        hits += int(geom.point_in_polygon(px, py, idx, g).sum())
    return hits


def main() -> None:
    n_pts = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    zone_counts = ([int(a) for a in sys.argv[2:]]
                   or [100, 1_000, 10_000, 40_000])
    rng = np.random.default_rng(3)
    rows = []
    for nz in zone_counts:
        blobs = lattice_zones(nz)
        t0 = time.time()
        g, box, depth, index = build_zone_index(blobs)
        t_build = time.time() - t0
        side = int(np.ceil(np.sqrt(nz)))
        px = rng.uniform(0, side * 0.01, n_pts)
        py = rng.uniform(0, side * 0.01, n_pts)
        t0 = time.time()
        row_idx, cand = batch_indexed(px, py, depth, index, box, g)
        t_idx = time.time() - t0
        naive_s = None
        if nz <= 1_000:  # the old path is already minutes-scale past this
            t0 = time.time()
            n_naive = batch_naive(px, py, nz, g)
            naive_s = round(time.time() - t0, 3)
            assert n_naive == row_idx.size, (n_naive, row_idx.size)
        rows.append({"zones": nz, "points": n_pts, "depth": depth,
                     "index_build_s": round(t_build, 3),
                     "batch_indexed_s": round(t_idx, 3),
                     "batch_naive_s": naive_s,
                     "members": int(row_idx.size)})
        print(json.dumps(rows[-1]))
    print(json.dumps({"probe": "zone_membership", "rows": rows}))


if __name__ == "__main__":
    main()
