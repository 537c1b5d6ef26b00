"""Rendered-tile layout: the image-payload OUTPUT store of the engine.

BASELINE.json's north_star makes tiles the serving layout for the
image corpus ("raster<->vector tiling assigns each image to map tiles
with deterministic tile IDs") and requires per-partition lineage +
row/byte metrics on every written stage. This module composes the two:
rendered tile rows (operators/raster.py) land as parquet partitioned
by ``(z, xs)`` — zoom plus an x-STRIPE ``xs = tile_x DIV stripe`` —
through the checkpoint Manifest (core/manifest.py), so

* every partition carries a commit record (rows, bytes, wall) and a
  killed write resumes by recomputing only uncommitted stripes;
* a viewport read prunes at the DIRECTORY level on (z, xs) before any
  file opens — ``PartitionFilters`` in the scan, verified by
  tests/test_tile_store.py — then row-group prunes on tile_x/tile_y
  min-max stats inside the surviving stripes.

Why stripes and not raw tile_x: a z15 world layer has up to 2^15
distinct x values per zoom — 32k directories per zoom is fine, but at
z20+ raw-x layouts explode into millions of dirs whose LISTing
dominates reads. A stripe of 64 caps directory counts while keeping
pruning selectivity (a viewport touches ceil(width/64)+1 stripes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.manifest import Manifest, read_stage

DEFAULT_STRIPE = 64
STAGE = "tiles"


def write_tile_layout(tiles: DataFrame, run_dir: str,
                      stripe: int = DEFAULT_STRIPE,
                      stage: str = STAGE) -> dict:
    """Write rendered tile rows under ``run_dir`` partitioned by
    (z, xs) with per-partition lineage; idempotent resume via the
    manifest (already-committed stripes are skipped)."""
    if stripe <= 0:
        raise ValueError("stripe must be positive")
    striped = tiles.withColumn(
        "xs", (F.col("tile_x") / stripe).cast("int"))
    return Manifest(run_dir).run_stage(stage, striped, keys=["z", "xs"])


def read_viewport(spark: SparkSession, run_dir: str, z: int,
                  x0: int, x1: int, y0: int, y1: int,
                  stripe: int = DEFAULT_STRIPE,
                  stage: str = STAGE) -> DataFrame:
    """Tiles of the inclusive viewport [x0..x1] x [y0..y1] at zoom
    ``z``. The (z, xs) predicates are directory-level PartitionFilters
    — unrelated zooms and stripes never open a file; tile_x/tile_y
    range predicates then row-group prune inside surviving stripes."""
    df = read_stage(spark, run_dir, stage)
    xs0, xs1 = x0 // stripe, x1 // stripe
    return (df.filter((F.col("z") == str(z))
                      & F.col("xs").isin([str(s) for s in
                                          range(xs0, xs1 + 1)])
                      & F.col("tile_x").between(x0, x1)
                      & F.col("tile_y").between(y0, y1))
            .drop("xs"))
