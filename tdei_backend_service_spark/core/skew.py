"""Skew machinery: cell histograms, salted repartitioning, adaptive
cell-splitting.

Geotagged data is brutally skewed — a city core packs orders of
magnitude more images into one cell than the countryside (the datagen's
dense-cluster fixture reproduces this, FIXTURES.md T4). Three layers of
defense, composable per job:

1. **AQE skew-join splitting** (session default,
   ``spark.sql.adaptive.skewJoin.enabled``) — handles oversized shuffle
   partitions inside joins with zero code.
2. **Salted repartitioning** (``salted_repartition``) — for non-join
   repartitions/aggregations keyed by cell: hot cells get their rows
   spread over ``factor`` salt buckets; map-side partial aggregation
   still combines within each bucket, and a second tiny reduce merges
   bucket partials.
3. **Adaptive cell-splitting** (``split_hot_cells``) — re-encodes rows
   in hot cells at a deeper resolution (res+k), which preserves spatial
   locality (children of a Z-order cell are contiguous) while bounding
   per-cell row counts. This is the write-time fix: partition layouts
   built from split cells stay balanced for every later query.

The histogram itself is one map-side-combined groupBy — cheap enough to
run per ingest batch and feed thresholds from real counts, not guesses.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from . import cells


def cell_histogram(df: DataFrame, cell_col: str = "cell_r8") -> DataFrame:
    """(cell, n_rows) — the skew profile for threshold decisions."""
    return df.groupBy(F.col(cell_col).alias("cell")).agg(
        F.count(F.lit(1)).alias("n_rows"))


def hot_cells(df: DataFrame, cell_col: str = "cell_r8",
              threshold_rows: int = 100_000) -> list[int]:
    """Cells whose row count exceeds the threshold (collected — the hot
    set is by construction tiny)."""
    rows = (cell_histogram(df, cell_col)
            .filter(F.col("n_rows") > threshold_rows).collect())
    return [r["cell"] for r in rows]


def salted_repartition(df: DataFrame, cell_col: str, hot: list[int],
                       factor: int = 8,
                       salt_cols: list[str] | None = None) -> DataFrame:
    """Repartition by (cell, salt) where only hot cells fan out over
    ``factor`` buckets (cold cells keep salt 0 — no extra shuffle width).
    Deterministic: the salt hashes the row's own key columns, not a
    random number, so retries land in the same partition (manifest
    idempotency).

    ``salt_cols`` names the columns the salt hashes — pass the row pk
    for the cheapest high-entropy salt. Default: every non-cell column,
    so low-cardinality leading columns (dataset_id, flags) can never
    collapse all hot rows into one bucket (ADVICE r1, skew.py:62)."""
    if not hot:
        return df.repartition(F.col(cell_col))
    if salt_cols is None:
        salt_cols = [c for c in df.columns if c != cell_col]
    hot_arr = F.array(*[F.lit(int(c)) for c in hot])
    salt = F.when(F.array_contains(hot_arr, F.col(cell_col)),
                  F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]),
                         F.lit(factor))) \
            .otherwise(F.lit(0))
    return (df.withColumn("_salt", salt)
              .repartition(F.col(cell_col), F.col("_salt"))
              .drop("_salt"))


def split_hot_cells(df: DataFrame, hot: list[int],
                    cell_col: str = "cell_r8", extra_depth: int = 2,
                    lon_col: str = "lon", lat_col: str = "lat",
                    out_col: str | None = None) -> DataFrame:
    """Adaptive cell-splitting: rows in hot cells are re-encoded
    ``extra_depth`` levels deeper (4^extra_depth children); cold rows
    keep their cell. Z-order children stay numerically adjacent to the
    parent, so range-based partition pruning still works."""
    out_col = out_col or cell_col
    if not hot:
        return df if out_col == cell_col else df.withColumn(out_col, F.col(cell_col))
    hot_set = set(int(c) for c in hot)
    depths = cells.cell_depth(np.asarray(sorted(hot_set), dtype=np.int64))
    base_depth = int(depths[0]) if depths.size else 0
    deeper = min(base_depth + extra_depth, cells.MAX_DEPTH)

    @F.pandas_udf(T.LongType())
    def _split(cell: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
        c = cell.to_numpy(np.int64)
        is_hot = np.isin(c, np.asarray(sorted(hot_set), dtype=np.int64))
        out = c.copy()
        if is_hot.any():
            out[is_hot] = cells.encode(lon.to_numpy(np.float64)[is_hot],
                                       lat.to_numpy(np.float64)[is_hot], deeper)
        return pd.Series(out)

    return df.withColumn(out_col, _split(F.col(cell_col), F.col(lon_col),
                                         F.col(lat_col)))


def balance_report(df: DataFrame, cell_col: str) -> dict:
    """Max/mean/p99 rows per cell — the before/after evidence for the
    lineage manifest and the bench report."""
    stats = (cell_histogram(df, cell_col)
             .agg(F.max("n_rows").alias("max"),
                  F.avg("n_rows").alias("mean"),
                  F.expr("percentile_approx(n_rows, 0.99)").alias("p99"),
                  F.count(F.lit(1)).alias("n_cells"))
             .first())
    return {"max": stats["max"], "mean": round(float(stats["mean"]), 1),
            "p99": stats["p99"], "n_cells": stats["n_cells"]}
