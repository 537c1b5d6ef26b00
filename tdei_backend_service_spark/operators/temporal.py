"""Temporal operators: batch sessionization and as-of joins.

The reference service has no temporal tier (its event handling is the
queue ingress in src/services — orchestration, not analytics); these
operators extend the engine for event-stream curation at 100 TB scale:

* ``sessionize`` — gap-based session assignment (the standard batch
  analogue of the streaming session window), used to group behavioral
  logs before per-session curation.
* ``asof_join`` — align each left row with the most recent right row
  at or before its timestamp (per key, optional tolerance), e.g.
  geotagged images to the last preceding GPS fix, metrics to the last
  config change.

Scale shape: both are ONE hash exchange on the key column plus a sort
— no range join, no per-key collect, no Python in the hot path. The
as-of join uses the union-tag trick (tag both sides, one running
``last(payload, ignorenulls=True)`` window) so the right side is never
re-scanned per left row; a merge-style range join would shuffle both
sides anyway, and the union keeps it to exactly one WindowExec.
Timestamps compare as integer microseconds (``unix_micros``) so the
gap/tolerance arithmetic is exact and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["sessionize", "session_stats", "asof_join"]


def _us(df: DataFrame, col: str) -> Column:
    """Exact integer microseconds since epoch for a timestamp column.
    TIMESTAMP_NTZ (what parquet naive timestamps load as) diffs
    against an NTZ epoch literal — timezone-independent, so it agrees
    bit-for-bit with DuckDB's epoch_us; TIMESTAMP_LTZ uses
    unix_micros on the instant directly."""
    c = F.col(col)
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        return F.timestamp_diff("MICROSECOND", epoch, c)
    return F.unix_micros(c)


def sessionize(df: DataFrame, key_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               gap_s: int = 21600,
               out_col: str = "session_seq") -> DataFrame:
    """Assign a per-key session sequence number: a new session starts
    when the gap to the previous event (ordered by timestamp, then
    ``id_col`` for determinism on timestamp ties) exceeds ``gap_s``
    seconds. Sessions are numbered 1..n per key in time order.

    The lag test and the running sum share one window spec, so the
    plan is a single Exchange(key) + Sort + WindowExec — partitioning
    by key bounds per-task state at the largest single key, the same
    envelope any engine needs for this operator.
    """
    us = _us(df, ts_col)
    order = [us.asc(), F.col(id_col).asc()]
    w = Window.partitionBy(key_col).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull() | ((us - prev) > gap_s * 1_000_000),
                    F.lit(1)).otherwise(F.lit(0))
    return (df.withColumn("_new", is_new)
            .withColumn(out_col, F.sum("_new").over(run).cast("long"))
            .drop("_new"))


def session_stats(df: DataFrame, key_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  gap_s: int = 21600) -> DataFrame:
    """Per-session rollup over ``sessionize``: event count, first
    event id, and exact microsecond span. The groupBy keys are a
    superset of the window's partition key, so rows are already
    co-located and Catalyst satisfies the aggregation's required
    distribution without a second exchange."""
    s = sessionize(df, key_col, ts_col, id_col, gap_s)
    us = _us(df, ts_col)
    return s.groupBy(key_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(id_col).alias("first_event"),
        (F.max(us) - F.min(us)).cast("long").alias("span_us"))


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_id: str = "event_id",
              carry: list[str] | None = None,
              tolerance_s: int | None = None,
              prefix: str = "asof_") -> DataFrame:
    """Backward as-of join: every ``left`` row gains the most recent
    ``right`` row with the same ``on`` key and ``right_ts <= left_ts``
    (inclusive), optionally only if within ``tolerance_s`` seconds;
    otherwise the attached columns are NULL. Output = all left columns
    plus ``{prefix}{right_id}`` and ``{prefix}{c}`` for each carried
    right column.

    Determinism: among right rows sharing a timestamp the largest
    ``right_id`` wins (they sort ascending inside the frame and the
    running ``last`` takes the final one) — a total order, so results
    are identical across partitionings and engines.

    Plan: union-tag both sides (right rows tag 0 sort before left
    rows tag 1 at equal timestamps, making the join inclusive), then
    ONE window ``last(payload, ignorenulls=True)`` carries the right
    payload struct forward — a single exchange on ``on`` + sort, no
    range join, right side scanned once regardless of left fan-in.
    """
    carry = list(carry or [])
    pl = F.struct(F.col(right_id).alias("rid"),
                  _us(right, right_ts).alias("rus"),
                  *[F.col(c).alias(c) for c in carry])
    pl_type = right.select(pl.alias("_pl")).schema["_pl"].dataType
    lrow = F.struct(*[F.col(c) for c in left.columns])
    lrow_type = left.select(lrow.alias("_lrow")).schema["_lrow"].dataType

    r = right.select(F.col(on).alias("_k"),
                     _us(right, right_ts).alias("_us"),
                     F.lit(0).alias("_tag"), pl.alias("_pl"),
                     F.lit(None).cast(lrow_type).alias("_lrow"))
    l = left.select(F.col(on).alias("_k"),
                    _us(left, left_ts).alias("_us"),
                    F.lit(1).alias("_tag"),
                    F.lit(None).cast(pl_type).alias("_pl"),
                    lrow.alias("_lrow"))
    w = (Window.partitionBy("_k")
         .orderBy(F.col("_us").asc(), F.col("_tag").asc(),
                  F.col("_pl.rid").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (r.unionByName(l)
               .withColumn("_m", F.last("_pl", ignorenulls=True).over(w))
               .filter(F.col("_tag") == 1))
    ok = F.col("_m").isNotNull()
    if tolerance_s is not None:
        ok = ok & ((F.col("_us") - F.col("_m.rus"))
                   <= tolerance_s * 1_000_000)
    m = F.when(ok, F.col("_m"))
    out = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    out.append(m.getField("rid").alias(f"{prefix}{right_id}"))
    out += [m.getField(c).alias(f"{prefix}{c}") for c in carry]
    return matched.select(*out)
