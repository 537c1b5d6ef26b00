"""Deterministic geo/image fixtures derived from the driver's TPC-H-ish
parquet — the bridge between the engine's spatial operators and the
DuckDB correctness oracle.

The driver's oracle (see /root/repo/__spark_entry__.py) can only run
ANSI SQL over the fixed tables (orders, customer, documents, ...), so
spatial inputs are DERIVED from integer keys with exact int64 arithmetic
plus one double division — bit-identical in Spark and DuckDB:

    lon = -122.35 + ((key * 2654435761) % 100000) / 1000000.0
    lat =   47.60 + ((key * 40503 + 12345) % 100000) / 1000000.0

Edge fixtures are ten horizontal lines at lat 47.605 + k*0.01 spanning
the full lon range, so nearest-edge distance has the closed form
|lat - line_k| * 110540 and every spatial answer is expressible in SQL.
The engine side does NOT use the closed form — it runs the real
operators (cell covers, two-phase join, ring-expansion kNN) against
these rows; the SQL oracle checks the output.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .core import geom
from .core.schema import EDGES_SCHEMA

LON0, LAT0 = -122.35, 47.60
EDGE_LAT0, EDGE_SPACING, N_EDGES = 47.605, 0.01, 10
M_LAT = geom.M_PER_DEG_LAT  # 110540.0

# SQL fragments for the same derivation (DuckDB)
SQL_LON = "(-122.35 + ((({k}) * 2654435761) % 100000) / 1000000.0)"
SQL_LAT = "(47.60 + ((({k}) * 40503 + 12345) % 100000) / 1000000.0)"


def derive_lonlat(df: DataFrame, key: str) -> DataFrame:
    lon = F.lit(LON0) + (F.col(key) * F.lit(2654435761)) % 100000 / F.lit(1000000.0)
    lat = F.lit(LAT0) + (F.col(key) * F.lit(40503) + F.lit(12345)) % 100000 / F.lit(1000000.0)
    return df.withColumn("lon", lon).withColumn("lat", lat)


def orders_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> point-feature table (pk o_orderkey)."""
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    df = derive_lonlat(df, "o_orderkey")
    return (df.select("o_orderkey", "lon", "lat", "o_orderstatus")
            .withColumn("image_id", F.col("o_orderkey").cast("string"))
            .withColumn("props", F.create_map(F.lit("status"),
                                              F.col("o_orderstatus")))
            .withColumn("dataset_id", F.lit("tpch")))


def grid_edges(spark: SparkSession, dataset_id: str = "tpch-edges") -> DataFrame:
    """Ten full-width horizontal edges at lat 47.605 + k*0.01."""
    rows = []
    for k in range(N_EDGES):
        la = EDGE_LAT0 + k * EDGE_SPACING
        rows.append({
            "edge_id": k, "orig_node_id": 2 * k, "dest_node_id": 2 * k + 1,
            "geometry": geom.wkb_linestring([(LON0, la), (LON0 + 0.1, la)]),
            "props": {"highway": "footway" if k % 2 == 0 else "residential"},
            "dataset_id": dataset_id,
        })
    return spark.createDataFrame(pd.DataFrame(rows), schema=EDGES_SCHEMA)


def customer_images(spark: SparkSession, sf_dir: str, side: str,
                    n_dups: int = 300) -> DataFrame:
    """customer -> image-like point records for the union fixture.

    Side 'A': one record per customer, phash = c_custkey,
    caption 'c<custkey>'. Side 'B': same customers where
    c_custkey < n_dups are content-duplicates of A (same phash/caption,
    lat shifted +2e-6 deg ~ 0.22 m < proximity 0.5 m); the rest carry a
    distinct phash (offset by 10^7) so they never merge.
    """
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    df = derive_lonlat(df, "c_custkey")
    if side == "A":
        out = (df.withColumn("image_id", F.concat(F.lit("A-"), F.col("c_custkey")))
               .withColumn("phash", F.col("c_custkey").cast("long"))
               .withColumn("dataset_id", F.lit("ds-A")))
    else:
        dup = F.col("c_custkey") < n_dups
        out = (df.withColumn("image_id", F.concat(F.lit("B-"), F.col("c_custkey")))
               .withColumn("phash", F.when(dup, F.col("c_custkey"))
                           .otherwise(F.col("c_custkey") + 10_000_000).cast("long"))
               .withColumn("lat", F.col("lat") + F.lit(2e-6))
               .withColumn("dataset_id", F.lit("ds-B")))
    return (out.withColumn("caption", F.concat(F.lit("c"), F.col("c_custkey")))
            .withColumn("bytes", F.lit(None).cast("binary"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("png"))
            .withColumn("props", F.create_map().cast("map<string,string>"))
            .select("image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                    "lon", "lat", "props", "dataset_id"))
