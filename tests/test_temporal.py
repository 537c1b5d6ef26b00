"""Sessionization + as-of join (operators/temporal.py): semantics on
hand-built frames (tie-breaks, tolerance, inclusivity) and the
one-exchange plan shape both operators promise."""

import datetime as dt

import pytest
from pyspark.sql import functions as F, types as T

from tdei_backend_service_spark.operators import temporal as TP


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 0, minute, second, micro)


_EV_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampNTZType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("value", T.DoubleType()),
])


def _events(spark, rows):
    return spark.createDataFrame(rows, _EV_SCHEMA)


def test_sessionize_gap_boundaries(spark):
    # gaps: 59s (same session), 61s (new), exactly 60s (same: rule is
    # strictly-greater), plus a second user interleaved
    rows = [
        (1, _ts(0), 10, 0.0),
        (1, _ts(0, 59), 11, 0.0),
        (1, _ts(2, 0), 12, 0.0),     # 61 s after 11 -> new session
        (1, _ts(3, 0), 13, 0.0),     # exactly 60 s after 12 -> same
        (2, _ts(0), 20, 0.0),
    ]
    out = {r["event_id"]: r["session_seq"]
           for r in TP.sessionize(_events(spark, rows), gap_s=60).collect()}
    assert out == {10: 1, 11: 1, 12: 2, 13: 2, 20: 1}


def test_sessionize_ts_tie_breaks_by_id(spark):
    # identical timestamps order by event_id; a later gap still splits
    rows = [(1, _ts(0), 5, 0.0), (1, _ts(0), 3, 0.0), (1, _ts(5), 9, 0.0)]
    out = TP.session_stats(_events(spark, rows), gap_s=60).collect()
    by_seq = {r["session_seq"]: r for r in out}
    assert by_seq[1]["n_events"] == 2 and by_seq[1]["first_event"] == 3
    assert by_seq[1]["span_us"] == 0
    assert by_seq[2]["n_events"] == 1 and by_seq[2]["first_event"] == 9


def test_asof_join_semantics(spark):
    left = _events(spark, [
        (1, _ts(10), 100, 0.0),   # matches rid 2 (latest <= ts)
        (1, _ts(5), 101, 0.0),    # equal-ts inclusive -> rid 2
        (1, _ts(1), 102, 0.0),    # before any right row -> NULL
        (2, _ts(10), 200, 0.0),   # other key has no right rows -> NULL
    ])
    right = _events(spark, [
        (1, _ts(3), 1, 1.5),
        (1, _ts(5), 2, 2.5),
    ])
    got = {r["event_id"]: (r["asof_event_id"], r["asof_value"])
           for r in TP.asof_join(left, right, on="user_id",
                                 carry=["value"]).collect()}
    assert got == {100: (2, 2.5), 101: (2, 2.5),
                   102: (None, None), 200: (None, None)}


def test_asof_join_right_ts_tie_largest_id_wins(spark):
    left = _events(spark, [(1, _ts(9), 100, 0.0)])
    right = _events(spark, [(1, _ts(5), 7, 7.0), (1, _ts(5), 4, 4.0)])
    row = TP.asof_join(left, right, on="user_id", carry=["value"]).first()
    assert (row["asof_event_id"], row["asof_value"]) == (7, 7.0)


def test_asof_join_tolerance(spark):
    left = _events(spark, [(1, _ts(10), 100, 0.0), (1, _ts(2), 101, 0.0)])
    right = _events(spark, [(1, _ts(1), 1, 1.0)])
    got = {r["event_id"]: r["asof_event_id"]
           for r in TP.asof_join(left, right, on="user_id",
                                 tolerance_s=120).collect()}
    # 101 is 60 s after the fix (within 120 s); 100 is 540 s after
    assert got == {101: 1, 100: None}


def test_asof_join_preserves_left_columns(spark):
    left = _events(spark, [(1, _ts(10), 100, 9.25)])
    right = _events(spark, [(1, _ts(1), 1, 1.0)])
    out = TP.asof_join(left, right, on="user_id")
    assert out.columns == ["user_id", "ts", "event_id", "value",
                           "asof_event_id"]
    assert out.first()["value"] == 9.25


@pytest.mark.parametrize("build", [
    lambda df: TP.session_stats(df, gap_s=60),
    lambda df: TP.asof_join(
        df.filter(F.col("event_id") % 2 == 0),
        df.filter(F.col("event_id") % 2 == 1), on="user_id",
        carry=["value"]),
])
def test_one_exchange_plan(spark, build):
    # both operators promise exactly ONE hash exchange on the key:
    # the session rollup reuses the window's partitioning, the as-of
    # join unions before its single window
    rows = [(i % 3, _ts(i % 50), i, float(i)) for i in range(200)]
    plan = build(_events(spark, rows))._jdf.queryExecution() \
        .executedPlan().toString()
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles == 1, plan
