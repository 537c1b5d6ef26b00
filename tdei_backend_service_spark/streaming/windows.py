"""Watermarked windowed aggregation — the Structured Streaming pattern
for event-time rollups with late data.

``windowed_event_counts`` declares the canonical plan: event stream ->
``withWatermark(ts, delay)`` -> fixed ``window(ts, size)`` groupBy ->
counts, emitted in APPEND mode, so a window materializes exactly once,
when the watermark (max event time seen in prior batches minus the
delay) passes its end. Late rows inside the delay still land in their
window before it seals; rows later than the delay are dropped by the
engine and the window is never revised — the exactly-once contract a
downstream table needs.

Scale shape: state is one count cell per (window, key) partitioned by
hash, pruned automatically as the watermark passes — bounded by
(active windows x keys), independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(stream: DataFrame, window_size: str = "1 hour",
                          watermark_delay: str = "30 minutes",
                          ts_col: str = "ts",
                          key_col: str = "event_type") -> DataFrame:
    """(window_start, window_end, <key>, n) per sealed window."""
    return (stream.withWatermark(ts_col, watermark_delay)
            .groupBy(F.window(F.col(ts_col), window_size), F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"),
                    key_col, "n"))


def run_windowed_counts(spark, landing_dir: str, out_dir: str,
                        checkpoint_dir: str, schema,
                        window_size: str = "1 hour",
                        watermark_delay: str = "30 minutes",
                        timeout_s: int = 120) -> None:
    """Drive the windowed aggregation over available files to a parquet
    sink (append mode: only watermark-sealed windows land)."""
    stream = spark.readStream.schema(schema).parquet(landing_dir)
    q = (windowed_event_counts(stream, window_size, watermark_delay)
         .writeStream.outputMode("append").format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination(timeout_s)
    if q.isActive:
        # an availableNow run that has not drained by the deadline means
        # the sink is INCOMPLETE — stopping silently would surface as an
        # under-count downstream, so fail loudly (ADVICE r3 low #4)
        q.stop()
        raise TimeoutError(
            f"windowed aggregation still active after {timeout_s}s — "
            f"sink at {out_dir} is partial; raise timeout_s for this "
            f"input size")
