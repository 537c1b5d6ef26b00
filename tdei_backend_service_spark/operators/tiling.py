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


def tile_term_counts(df: DataFrame, z: int, *,
                     caption_col: str = "caption",
                     lon_col: str = "lon",
                     lat_col: str = "lat") -> DataFrame:
    """The MERGEABLE form of the caption layer: (tile_x, tile_y, term,
    n_term) — lowercased alnum token counts per tile. Counts are a
    monoid under addition (``merge_term_counts``), so the layer is
    live-maintainable; the top-1 selection happens at render
    (``top_terms_from_counts``). All JVM: split/filter/explode
    map-side + ONE partial-combined exchange."""
    tx, ty, _ = cells.tile_expr(F.col(lon_col), F.col(lat_col), z)
    toks = (df.select(tx.cast("long").alias("tile_x"),
                      ty.cast("long").alias("tile_y"),
                      F.explode(F.filter(
                          F.split(F.lower(F.col(caption_col)),
                                  "[^a-z0-9]+"),
                          lambda t: t != "")).alias("term")))
    return (toks.groupBy("tile_x", "tile_y", "term")
            .agg(F.count(F.lit(1)).cast("long").alias("n_term")))


def merge_term_counts(a: DataFrame, b: DataFrame) -> DataFrame:
    """Per-(tile, term) add of two count relations — full-outer over
    the two nonzero relations, missing side counts 0."""
    key = ["tile_x", "tile_y", "term"]
    z = F.lit(0).cast("long")
    ja = a.select(*key, F.col("n_term").alias("_a"))
    jb = b.select(*key, F.col("n_term").alias("_b"))
    return (ja.join(jb, key, "full_outer")
            .select(*key, (F.coalesce("_a", z) + F.coalesce("_b", z))
                    .cast("long").alias("n_term")))


def top_terms_from_counts(counts: DataFrame, z: int) -> DataFrame:
    """(tile, term, n_term) -> the dominant term per tile (most
    frequent; ties to the lexicographically smallest term — a
    deterministic total order) plus the tile's total term count.
    One window pass over the bounded term relation."""
    from pyspark.sql.window import Window
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


def tile_top_terms(df: DataFrame, z: int, *, caption_col: str = "caption",
                   lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Label the map: per zoom-``z`` tile the dominant caption term —
    the caption-side summarization a browse map serves next to
    tile_gallery's thumbnails (the north-rule input is image + caption
    pairs; this is the caption analogue of the density/brightness
    layers). tile_term_counts + top_terms_from_counts; the (tile,
    term) relation entering the window is bounded by the vocabulary x
    occupied tiles, never the corpus. Output: (z, tile_x, tile_y,
    term, n_term, n_total_terms)."""
    return top_terms_from_counts(
        tile_term_counts(df, z, caption_col=caption_col,
                         lon_col=lon_col, lat_col=lat_col), z)


def incremental_tile_terms(drop: DataFrame, committed_counts: DataFrame,
                           committed_top: DataFrame, z: int, *,
                           caption_col: str = "caption",
                           lon_col: str = "lon",
                           lat_col: str = "lat") -> DataFrame:
    """Maintain the caption layer when an image drop lands: tokenize
    ONLY the drop, merge its counts into the committed (tile, term)
    relation, and recompute the top-1 window ONLY over drop-touched
    tiles — untouched tiles keep their committed rows via anti-join.
    Work is proportional to the drop's tile footprint, yet the result
    equals a full recompute (counts are a monoid, oracle-pinned)."""
    dcnt = tile_term_counts(drop, z, caption_col=caption_col,
                            lon_col=lon_col, lat_col=lat_col)
    affected = dcnt.select("tile_x", "tile_y").distinct()
    ccnt_aff = committed_counts.join(affected, ["tile_x", "tile_y"],
                                     "left_semi")
    merged_aff = merge_term_counts(ccnt_aff, dcnt)
    new_rows = top_terms_from_counts(merged_aff, z)
    untouched = committed_top.join(affected, ["tile_x", "tile_y"],
                                   "left_anti")
    return untouched.unionByName(new_rows)
