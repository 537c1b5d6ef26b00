#!/usr/bin/env python
"""Trajectory-tier scale probe: run the speed raster, dwell detection,
and the space-time co-location join over a synthetic metro-scale ping
corpus at 50-100x the contract-query scale, verifying EXACT parity
against independent DuckDB replicas (full-frame compare where the
output is bounded; integer-checksum fingerprints for the pair join).

The corpus is fully MATERIALIZED to parquet once (event_id, user_id,
us, lon, lat) and read by both engines, so every float input is
bit-identical and no derivation has to agree across engines. Positions
are home-biased (70% of a user's pings jitter within ~110 m of a
per-user home, the rest roam the 0.5-degree box) so dwells and
encounters actually occur — xxhash64 scrambles everywhere; the affine
scrambles of the small fixtures correlate time with space at this
density and would plant zero pairs.

Usage: python tools/trajectory_scale_probe.py [n_pings] [cpus]
       (default 5000000 32)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/tmp/traj_probe"
SPAN_S = 2_592_000            # 30 days
RAD_MM = 200_000              # co-location radius 200 m
W_US = 600 * 1_000_000        # co-location window 600 s
STAY_MM = 3_000_000           # dwell link radius 3 km
STAY_DUR_US = 43_200 * 1_000_000


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import duckdb
    from pyspark.sql import functions as F

    from tdei_backend_service_spark.operators import trajectory as TJ
    from tdei_backend_service_spark.session import get_spark

    spark = get_spark("traj-scale", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {"n_pings": n, "cpus": cpus}

    # --- corpus: ~100 pings/user, 70% within ~110 m of a per-user home
    shutil.rmtree(WORK, ignore_errors=True)
    users = max(n // 100, 1)

    def h(seed: int, mod: int, col="id"):
        return F.pmod(F.xxhash64(F.col(col), F.lit(seed)), F.lit(mod))

    user = h(1, users)
    home_lon = F.lit(-122.60) + F.pmod(
        F.xxhash64(user, F.lit(11)), F.lit(500_000)) / 1e6
    home_lat = F.lit(47.30) + F.pmod(
        F.xxhash64(user, F.lit(12)), F.lit(500_000)) / 1e6
    roam_lon = F.lit(-122.60) + h(4, 500_000) / 1e6
    roam_lat = F.lit(47.30) + h(5, 500_000) / 1e6
    at_home = h(3, 10) < 7
    jlon = (h(6, 2001) - 1000) / 1e6
    jlat = (h(7, 2001) - 1000) / 1e6
    (spark.range(0, n)
     .select(F.col("id").alias("event_id"),
             user.alias("user_id"),
             (F.lit(1_704_067_200_000_000)
              + h(2, SPAN_S) * F.lit(1_000_000)).alias("us"),
             F.when(at_home, home_lon + jlon).otherwise(roam_lon)
             .alias("lon"),
             F.when(at_home, home_lat + jlat).otherwise(roam_lat)
             .alias("lat"))
     .repartition(cpus)
     .write.mode("overwrite").parquet(f"{WORK}/pings.parquet"))
    base = spark.read.parquet(f"{WORK}/pings.parquet")
    pings = base.select("event_id", "user_id", "lon", "lat",
                        F.timestamp_micros(F.col("us")).alias("ts"))

    con = duckdb.connect()
    con.execute(f"SET threads TO {cpus}")
    P = f"SELECT * FROM read_parquet('{WORK}/pings.parquet/*.parquet')"

    def compare(name, sdf, sql, keys):
        pa = sdf.toPandas().sort_values(keys).reset_index(drop=True)
        pb = con.execute(sql).df().sort_values(keys).reset_index(drop=True)
        pa, pb = pa[sorted(pa.columns)], pb[sorted(pb.columns)]
        assert len(pa) == len(pb), (name, len(pa), len(pb))
        for c in pa.columns:
            bv = pb[c].astype(pa[c].dtype)
            assert (pa[c] == bv).all(), (name, c)
        print(f"  {name}: {len(pa)} rows EXACT")
        return len(pa)

    # --- 1. speed raster (z13/16px -> zoom-17 lattice) ---
    t0 = time.time()
    sp = TJ.speed_pixels(pings, 13, 16)
    n_pix = sp.count()
    report["speed_raster"] = {
        "pixels": n_pix, "wall_s": round(time.time() - t0, 1),
        "pings_per_s": round(n / (time.time() - t0)),
    }
    print(f"speed_pixels: {n_pix} px in {report['speed_raster']['wall_s']}s "
          f"({report['speed_raster']['pings_per_s']} pings/s)")
    NSEG = 1 << 17
    compare("speed_raster", sp, f"""
        WITH p AS ({P}),
        t AS (SELECT *, LAG(us) OVER w AS prev_us,
                     LAG(lon) OVER w AS lon0, LAG(lat) OVER w AS lat0
              FROM p WINDOW w AS (PARTITION BY user_id
                                  ORDER BY us, event_id)),
        s AS (SELECT *, SUM(CASE WHEN prev_us IS NULL
                                   OR us - prev_us > 21600000000
                                 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_seq
              FROM t),
        seg AS (SELECT lon0, lat0, lon AS lon1, lat AS lat1,
                       us - prev_us AS dt_us
                FROM s WHERE prev_us IS NOT NULL
                  AND us - prev_us <= 21600000000 AND us - prev_us > 0),
        g AS (SELECT
                CAST(FLOOR((lon1 + 180.0) / 360.0 * {NSEG}) AS BIGINT) AS gx,
                CAST(FLOOR((1.0 - ln(tan(radians(lat1))
                    + 1.0 / cos(radians(lat1))) / pi()) / 2.0 * {NSEG})
                  AS BIGINT) AS gy,
                CAST(FLOOR(CAST(FLOOR(SQRT(
                  (lon1 - lon0) * 111320.0 * ((lon1 - lon0) * 111320.0)
                  + (lat1 - lat0) * 110540.0 * ((lat1 - lat0) * 110540.0)
                ) * 1000.0) AS BIGINT) * 1000000.0 / dt_us) AS BIGINT) AS mmps
              FROM seg),
        pix AS (SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS n_steps,
                       CAST(SUM(mmps) AS BIGINT) AS sum_mmps
                FROM g GROUP BY 1, 2)
        SELECT CAST(13 AS INT) AS z, CAST(gx // 16 AS INT) AS tile_x,
               CAST(gy // 16 AS INT) AS tile_y, gx, gy,
               CAST(gx % 16 AS INT) AS px_x, CAST(gy % 16 AS INT) AS px_y,
               n_steps, sum_mmps,
               LEAST(CAST(255 AS BIGINT), sum_mmps // n_steps) AS n
        FROM pix""", ["gx", "gy"])

    # --- 2. dwell detection ---
    t0 = time.time()
    st = TJ.stay_points(pings, radius_m=STAY_MM / 1000.0,
                        min_duration_s=STAY_DUR_US // 1_000_000)
    n_dwell = st.count()
    report["stay_points"] = {
        "dwells": n_dwell, "wall_s": round(time.time() - t0, 1),
        "pings_per_s": round(n / (time.time() - t0)),
    }
    print(f"stay_points: {n_dwell} dwells in "
          f"{report['stay_points']['wall_s']}s")
    compare("stay_points", st, f"""
        WITH p AS ({P}),
        t AS (SELECT *, LAG(us) OVER w AS prev_us,
                     LAG(lon) OVER w AS lon0, LAG(lat) OVER w AS lat0
              FROM p WINDOW w AS (PARTITION BY user_id
                                  ORDER BY us, event_id)),
        m AS (SELECT *, SUM(CASE WHEN prev_us IS NULL
                OR CAST(FLOOR(SQRT(
                     (lon - lon0) * 111320.0 * ((lon - lon0) * 111320.0)
                     + (lat - lat0) * 110540.0 * ((lat - lat0) * 110540.0)
                   ) * 1000.0) AS BIGINT) > {STAY_MM}
                THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY us, event_id
                      ROWS UNBOUNDED PRECEDING) AS dwell_seq
              FROM t)
        SELECT user_id, CAST(dwell_seq AS BIGINT) AS dwell_seq,
               COUNT(*) AS n_pings, CAST(MIN(us) AS BIGINT) AS start_us,
               CAST(MAX(us) AS BIGINT) AS end_us,
               CAST(MAX(us) - MIN(us) AS BIGINT) AS span_us,
               MIN(event_id) AS anchor_id,
               arg_min(lon, event_id) AS lon, arg_min(lat, event_id) AS lat
        FROM m GROUP BY 1, 2
        HAVING MAX(us) - MIN(us) >= {STAY_DUR_US}""",
        ["user_id", "dwell_seq"])

    # --- 3. co-location join (fingerprint compare: output can be wide) ---
    t0 = time.time()
    cl = TJ.co_location(pings, radius_m=RAD_MM / 1000.0,
                        window_s=W_US // 1_000_000)
    z = F.lit(0).cast("long")
    fp = cl.agg(
        F.count(F.lit(1)).alias("rows"),
        F.coalesce(F.sum("n_encounters"), z).alias("enc"),
        F.coalesce(F.sum(F.col("user_a") * F.lit(1_000_003)
                         + F.col("user_b")), z).alias("key_sum"),
        F.coalesce(F.sum(F.col("first_us") % F.lit(1_000_000_007)), z)
        .alias("fu"),
        F.coalesce(F.sum(F.col("last_us") % F.lit(1_000_000_007)), z)
        .alias("lu"),
    ).collect()[0].asDict()
    wall = time.time() - t0
    report["co_location"] = {"pairs": fp["rows"], "encounters": int(fp["enc"]),
                             "wall_s": round(wall, 1),
                             "pings_per_s": round(n / wall)}
    print(f"co_location: {fp['rows']} user pairs / {fp['enc']} encounters "
          f"in {report['co_location']['wall_s']}s")
    lat_b = 0.03  # lattice >= 200 m in degrees on both axes
    dfp = con.execute(f"""
        WITH p0 AS ({P}),
        p AS (SELECT *, CAST(FLOOR(lon / {lat_b}) AS BIGINT) AS bx,
                     CAST(FLOOR(lat / {lat_b}) AS BIGINT) AS by2,
                     us // {W_US} AS bt FROM p0),
        a AS (SELECT p.*, bx + dx.d AS jbx, by2 + dy.d AS jby,
                     bt + dt.d AS jbt
              FROM p, UNNEST([-1,0,1]) dx(d), UNNEST([-1,0,1]) dy(d),
                   UNNEST([-1,0,1]) dt(d)),
        pr AS (SELECT a.user_id AS user_a, b.user_id AS user_b,
                      a.us AS usa, b.us AS usb
               FROM a JOIN p b ON a.jbx = b.bx AND a.jby = b.by2
                              AND a.jbt = b.bt
               WHERE a.user_id < b.user_id AND ABS(a.us - b.us) <= {W_US}
                 AND CAST(FLOOR(SQRT(
                       (b.lon - a.lon) * 111320.0
                         * ((b.lon - a.lon) * 111320.0)
                       + (b.lat - a.lat) * 110540.0
                         * ((b.lat - a.lat) * 110540.0)
                     ) * 1000.0) AS BIGINT) <= {RAD_MM}),
        g AS (SELECT user_a, user_b,
                     CAST(COUNT(*) AS BIGINT) AS n_encounters,
                     CAST(MIN(LEAST(usa, usb)) AS BIGINT) AS first_us,
                     CAST(MAX(GREATEST(usa, usb)) AS BIGINT) AS last_us
              FROM pr GROUP BY 1, 2)
        SELECT CAST(COUNT(*) AS BIGINT) AS rows,
               COALESCE(CAST(SUM(n_encounters) AS BIGINT), 0) AS enc,
               COALESCE(CAST(SUM(user_a * 1000003 + user_b) AS BIGINT), 0)
                 AS key_sum,
               COALESCE(CAST(SUM(first_us % 1000000007) AS BIGINT), 0) AS fu,
               COALESCE(CAST(SUM(last_us % 1000000007) AS BIGINT), 0) AS lu
        FROM g""").df().iloc[0].to_dict()
    for k in ("rows", "enc", "key_sum", "fu", "lu"):
        assert int(fp[k]) == int(dfp[k]), (k, fp[k], dfp[k])
    print("  co_location fingerprint EXACT")

    # --- 4. co-traveler similarity (fingerprint compare) ---
    t0 = time.time()
    from tdei_backend_service_spark.operators.trajectory import co_travelers
    ct = co_travelers(pings, 17, min_common=2)
    fp = ct.agg(
        F.count(F.lit(1)).alias("rows"),
        F.coalesce(F.sum("n_common"), z).alias("nc"),
        F.coalesce(F.sum(F.col("user_a") * F.lit(1_000_003)
                         + F.col("user_b")), z).alias("key_sum"),
        F.coalesce(F.sum("jaccard_pm"), z).alias("jp"),
    ).collect()[0].asDict()
    wall = time.time() - t0
    report["co_travelers"] = {"pairs": fp["rows"],
                              "wall_s": round(wall, 1),
                              "pings_per_s": round(n / wall)}
    print(f"co_travelers: {fp['rows']} pairs in "
          f"{report['co_travelers']['wall_s']}s")
    NT = 1 << 17
    dfp = con.execute(f"""
        WITH p AS ({P}),
        v AS (SELECT DISTINCT user_id,
                CAST(FLOOR((lon + 180.0) / 360.0 * {NT}) AS BIGINT) AS gx,
                CAST(FLOOR((1.0 - ln(tan(radians(lat))
                    + 1.0 / cos(radians(lat))) / pi()) / 2.0 * {NT})
                  AS BIGINT) AS gy
              FROM p),
        cnt AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS nc
                FROM v GROUP BY 1),
        inter AS (SELECT a.user_id AS user_a, b.user_id AS user_b,
                         CAST(COUNT(*) AS BIGINT) AS n_common
                  FROM v a JOIN v b ON a.gx = b.gx AND a.gy = b.gy
                                   AND a.user_id < b.user_id
                  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        g AS (SELECT user_a, user_b, n_common,
                     (n_common * 1000) // (ca.nc + cb.nc - n_common)
                       AS jaccard_pm
              FROM inter JOIN cnt ca ON ca.user_id = user_a
                         JOIN cnt cb ON cb.user_id = user_b)
        SELECT CAST(COUNT(*) AS BIGINT) AS rows,
               COALESCE(CAST(SUM(n_common) AS BIGINT), 0) AS nc,
               COALESCE(CAST(SUM(user_a * 1000003 + user_b) AS BIGINT), 0)
                 AS key_sum,
               COALESCE(CAST(SUM(jaccard_pm) AS BIGINT), 0) AS jp
        FROM g""").df().iloc[0].to_dict()
    for k in ("rows", "nc", "key_sum", "jp"):
        assert int(fp[k]) == int(dfp[k]), (k, fp[k], dfp[k])
    print("  co_travelers fingerprint EXACT")

    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
