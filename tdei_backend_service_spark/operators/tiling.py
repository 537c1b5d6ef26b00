"""Raster<->vector tiling: deterministic tile assignment + per-tile stats.

Part of the benchmark metric (BASELINE.json: "spatial-join +
tile-assignment rows/sec"). Every image is assigned the slippy-map tile
(z/x/y, Web-Mercator) containing it, with the deterministic half-open
convention (west/north edges inclusive — FIXTURES.md T4 tiling fixture).
Tile keys pack (z, x, y) into one int64 (Morton), so downstream
aggregation/joins run on a single long column.

The reference has no tiling operator (tiles are this engine's output
layout for the image payload, per BASELINE.json north_star); cell math
lives in core/cells.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..core import cells


def assign_tiles(df: DataFrame, z: int, lon_col: str = "lon",
                 lat_col: str = "lat") -> DataFrame:
    """Add tile_z/tile_x/tile_y/tile_key at zoom ``z`` (recomputing even if
    ingest already encoded a different zoom). Pure Catalyst
    (cells.tile_expr) — tile assignment over the full corpus stays in
    whole-stage codegen with no Python."""
    tx, ty, tkey = cells.tile_expr(F.col(lon_col), F.col(lat_col), z)
    return (df.withColumn("tile_z", F.lit(z).cast("int"))
              .withColumn("tile_x", tx.cast("int"))
              .withColumn("tile_y", ty.cast("int"))
              .withColumn("tile_key", tkey))


def tile_stats(df: DataFrame, z: int | None = None) -> DataFrame:
    """Rows/bytes per tile — the per-partition metrics feed for the
    lineage manifest and the skew histogram (hot tiles -> salting input).
    Map-side partial aggregation makes this one narrow shuffle."""
    d = assign_tiles(df, z) if z is not None else df
    size_col = (F.sum(F.length(F.col("bytes"))) if "bytes" in d.columns
                else F.lit(None).cast("long"))
    return (d.groupBy("tile_z", "tile_x", "tile_y", "tile_key")
             .agg(F.count(F.lit(1)).alias("n_rows"),
                  size_col.alias("n_bytes")))


def hot_tiles(df: DataFrame, top_k: int = 20) -> DataFrame:
    """Densest tiles (skew histogram) — input to salting decisions."""
    return tile_stats(df).orderBy(F.desc("n_rows")).limit(top_k)


def tile_pyramid(df: DataFrame, z_base: int, z_min: int,
                 lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Multi-zoom rollup: per-tile row counts at every zoom in
    ``[z_min, z_base]`` as (z, tile_x, tile_y, n) — the tile-pyramid
    aggregation a map-serving layout needs.

    The corpus is scanned and aggregated ONCE (at z_base, map-side
    partial combine); every coarser level aggregates the PREVIOUS
    level's already-tiny tile table by integer-halving tile coords
    (parent x = x // 2 — exact, and equal to recomputing the tile
    formula at the coarser zoom since floor nests). At 10^12 rows this
    is one full shuffle + (z_base - z_min) shuffles over at most 4^z
    tile rows each; re-scanning the corpus per level would cost the
    full pass times the level count."""
    if z_min > z_base:
        raise ValueError("z_min must be <= z_base")
    base = (assign_tiles(df, z_base, lon_col, lat_col)
            .groupBy("tile_x", "tile_y")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("z", F.lit(z_base).cast("int")))
    levels = [base]
    cur = base
    for z in range(z_base - 1, z_min - 1, -1):
        cur = (cur.groupBy((F.col("tile_x") / 2).cast("int").alias("tile_x"),
                           (F.col("tile_y") / 2).cast("int").alias("tile_y"))
               .agg(F.sum("n").alias("n"))
               .withColumn("z", F.lit(z).cast("int")))
        levels.append(cur)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select("z", "tile_x", "tile_y", "n")


def incremental_tile_counts(committed: DataFrame, drop: DataFrame,
                            z: int, lon_col: str = "lon",
                            lat_col: str = "lat") -> DataFrame:
    """Additive maintenance of a committed per-tile count table
    (tile_x, tile_y, n) when a new drop lands: aggregate ONLY the drop
    at zoom ``z`` and monoid-sum it into the committed rows. Counts are
    a commutative monoid, so the merged table equals the recompute
    over corpus+drop (oracle-pinned) at the cost of one pass over the
    DROP plus a shuffle over tile rows (bounded by 4^z) — never a
    corpus rescan; at 10^12 committed images that difference is the
    whole feasibility of keeping a live tile layer. Coarser pyramid
    levels rebuild from this base via tile_pyramid's integer-halving
    chain over the already-tiny tile table."""
    d = (assign_tiles(drop, z, lon_col, lat_col)
         .groupBy("tile_x", "tile_y")
         .agg(F.count(F.lit(1)).alias("n")))
    return (committed.select("tile_x", "tile_y", "n").unionByName(d)
            .groupBy("tile_x", "tile_y")
            .agg(F.sum("n").cast("long").alias("n")))


def tile_top_terms(df: DataFrame, z: int, *, caption_col: str = "caption",
                   lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Label the map: per zoom-``z`` tile the dominant caption term —
    lowercased alnum tokens, count per (tile, term), most frequent wins,
    ties to the lexicographically smallest term (a deterministic total
    order, so the layer carries a full oracle). The caption-side
    summarization a browse map serves next to tile_gallery's thumbnails
    (the north-rule input is image + caption pairs; this is the
    caption analogue of the density/brightness layers).

    Plan, all JVM: split/filter/explode map-side, ONE partial-combined
    exchange on (tile, term), then the top-1 window on the tile key —
    the (tile, term) relation entering the window is already bounded by
    the vocabulary x occupied tiles, never the corpus. Output:
    (z, tile_x, tile_y, term, n_term, n_total_terms)."""
    from pyspark.sql.window import Window
    tx, ty, _ = cells.tile_expr(F.col(lon_col), F.col(lat_col), z)
    toks = (df.select(tx.cast("long").alias("tile_x"),
                      ty.cast("long").alias("tile_y"),
                      F.explode(F.filter(
                          F.split(F.lower(F.col(caption_col)),
                                  "[^a-z0-9]+"),
                          lambda t: t != "")).alias("term")))
    counts = (toks.groupBy("tile_x", "tile_y", "term")
              .agg(F.count(F.lit(1)).alias("n_term")))
    w = Window.partitionBy("tile_x", "tile_y") \
        .orderBy(F.desc("n_term"), F.asc("term"))
    return (counts
            .withColumn("_rk", F.row_number().over(w))
            .withColumn("n_total_terms",
                        F.sum("n_term").over(
                            Window.partitionBy("tile_x", "tile_y")))
            .filter(F.col("_rk") == 1)
            .select(F.lit(z).cast("int").alias("z"),
                    F.col("tile_x").cast("long").alias("tile_x"),
                    F.col("tile_y").cast("long").alias("tile_y"),
                    "term",
                    F.col("n_term").cast("long").alias("n_term"),
                    F.col("n_total_terms").cast("long")
                    .alias("n_total_terms")))
