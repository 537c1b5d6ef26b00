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


def quad_zones(spark: SparkSession, side: int = 4,
               dataset_id: str = "tpch-z") -> DataFrame:
    """``side x side`` axis-aligned zones tiling the derived-point
    lattice, with every boundary offset by -0.5e-6 deg (half a lattice
    step), so no derived point can ever sit on a zone edge. The zone of
    a point is then pure integer arithmetic on the key hash —
    zone_id = (lat_hash // step) * side + (lon_hash // step) — which is
    what makes zone_pip_count a full SQL oracle instead of rows-only
    (PIP boundary conventions can't disagree when nothing is on a
    boundary). The Spark side still runs the real polygon PIP path."""
    from .core.schema import ZONES_SCHEMA
    step = 100000 // side
    rows = []
    for zid in range(side * side):
        ix, iy = zid % side, zid // side
        x0 = LON0 + (ix * step - 0.5) / 1e6
        x1 = LON0 + ((ix + 1) * step - 0.5) / 1e6
        y0 = LAT0 + (iy * step - 0.5) / 1e6
        y1 = LAT0 + ((iy + 1) * step - 0.5) / 1e6
        rows.append({
            "zone_id": zid,
            "node_ids": [zid * 4, zid * 4 + 1, zid * 4 + 2, zid * 4 + 3],
            "geometry": geom.wkb_polygon(
                [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]),
            "props": {"zone_type": "quad"},
            "dataset_id": dataset_id,
        })
    return spark.createDataFrame(pd.DataFrame(rows), schema=ZONES_SCHEMA)


def vgrid_edges(spark: SparkSession,
                dataset_id: str = "tpch-vedges") -> DataFrame:
    """Ten full-height VERTICAL edges at lon LON0 + k*0.01 — the
    local-metric fixture: every point's lat falls inside the edge span,
    so point-edge distance is purely longitudinal, |dlon| * 111320 *
    cos(lat) under the opt-in local metric (one cos factor, closed
    form; horizontal grid_edges distances are purely latitudinal and
    would not see the metric at all)."""
    rows = []
    for k in range(N_EDGES):
        lo = LON0 + k * EDGE_SPACING
        rows.append({
            "edge_id": k, "orig_node_id": 2 * k, "dest_node_id": 2 * k + 1,
            "geometry": geom.wkb_linestring([(lo, LAT0), (lo, LAT0 + 0.1)]),
            "props": {"highway": "footway"},
            "dataset_id": dataset_id,
        })
    return spark.createDataFrame(pd.DataFrame(rows), schema=EDGES_SCHEMA)


def supplier_edges(spark: SparkSession, sf_dir: str,
                   dataset_id: str = "tpch-sedges") -> DataFrame:
    """supplier -> one horizontal 0.01-deg WKB segment per s_suppkey
    starting at the derived point. Used by the bbox_edges contract query:
    with bbox bounds on half-lattice offsets, 'segment intersects bbox'
    reduces to integer range tests on the key hash, giving the line-
    refine path (envelope prefilter + exact segment clip) a full SQL
    oracle."""
    from pyspark.sql import types as T
    df = derive_lonlat(spark.read.parquet(f"{sf_dir}/supplier.parquet"),
                       "s_suppkey")

    @F.pandas_udf(T.BinaryType())
    def _wkb(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series([geom.wkb_linestring([(lo, la), (lo + 0.01, la)])
                          for lo, la in zip(lon, lat)])

    from .core.ingest import encode_geom_meta
    out = df.select(F.col("s_suppkey").alias("edge_id"),
                    _wkb.asNondeterministic()(F.col("lon"), F.col("lat"))
                    .alias("geometry"),
                    F.lit(dataset_id).alias("dataset_id"))
    return encode_geom_meta(out)


def supplier_edges_oriented(spark: SparkSession, sf_dir: str,
                            dataset_id: str = "tpch-soedges") -> DataFrame:
    """supplier -> one 0.01-deg WKB segment per s_suppkey whose
    orientation cycles with ``s_suppkey % 3``: 0 -> horizontal (0 deg),
    1 -> diagonal (45 deg), 2 -> vertical (90 deg). Against the
    horizontal grid_edges targets the acute angle between orientations
    is exactly 0/45/90, all far from the reference's 30-deg threshold
    (degrees(ST_Angle(...)) < 30, spatial-query.test.ts:111), so the
    angle predicate has a closed-form integer oracle: match iff
    s_suppkey % 3 = 0."""
    from pyspark.sql import types as T
    df = derive_lonlat(spark.read.parquet(f"{sf_dir}/supplier.parquet"),
                       "s_suppkey")

    @F.pandas_udf(T.BinaryType())
    def _wkb(key: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
        out = []
        for k, lo, la in zip(key, lon, lat):
            m = k % 3
            dx = 0.01 if m in (0, 1) else 0.0
            dy = 0.01 if m in (1, 2) else 0.0
            out.append(geom.wkb_linestring([(lo, la), (lo + dx, la + dy)]))
        return pd.Series(out)

    from .core.ingest import encode_geom_meta
    out = df.select(F.col("s_suppkey").alias("edge_id"),
                    _wkb.asNondeterministic()(F.col("s_suppkey"), F.col("lon"),
                                              F.col("lat")).alias("geometry"),
                    F.lit(dataset_id).alias("dataset_id"))
    return encode_geom_meta(out)


def supplier_ways(spark: SparkSession, sf_dir: str,
                  dataset_id: str = "tpch-ways") -> DataFrame:
    """supplier -> an edges frame shaped for the OSM XML way builder
    (io/osm_xml.py way_lines): edge_id = s_suppkey, node ids 2k/2k+1,
    and a props bag whose second value carries &, < and " so the XML
    escape path is exercised under the oracle. Every field is integer/
    string-derived, so the emitted <way> line is exactly reproducible
    in SQL."""
    df = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    highway = F.when(F.col("s_suppkey") % 2 == 0,
                     F.lit("footway")).otherwise(F.lit("residential"))
    name = F.concat(F.lit('s<'), F.col("s_suppkey").cast("string"),
                    F.lit('> & "co"'))
    return df.select(
        F.col("s_suppkey").alias("edge_id"),
        (F.col("s_suppkey") * 2).alias("orig_node_id"),
        (F.col("s_suppkey") * 2 + 1).alias("dest_node_id"),
        F.create_map(F.lit("highway"), highway,
                     F.lit("name"), name).alias("props"),
        F.lit(dataset_id).alias("dataset_id"))


def tri_zones(spark: SparkSession, dataset_id: str = "tpch-tri") -> DataFrame:
    """Two triangles splitting the point lattice along the anti-diagonal
    u + v = 99999.5 (lattice units; all boundaries at half-lattice
    offsets, so no derived point touches an edge). Zone of a point is
    closed-form: 0 if u + v <= 99999 else 1 — a full SQL oracle for
    NON-axis-aligned polygon PIP (the quad_zones oracle only covers
    rectangles)."""
    from .core.schema import ZONES_SCHEMA

    def xy(u: float, v: float) -> tuple[float, float]:
        return (LON0 + u / 1e6, LAT0 + v / 1e6)

    lower = [xy(-0.5, -0.5), xy(100000.0, -0.5), xy(-0.5, 100000.0),
             xy(-0.5, -0.5)]
    upper = [xy(100000.0, -0.5), xy(100000.0, 100000.0), xy(-0.5, 100000.0),
             xy(100000.0, -0.5)]
    rows = [{"zone_id": 0, "node_ids": [0, 1, 2],
             "geometry": geom.wkb_polygon(lower),
             "props": {"zone_type": "tri"}, "dataset_id": dataset_id},
            {"zone_id": 1, "node_ids": [3, 4, 5],
             "geometry": geom.wkb_polygon(upper),
             "props": {"zone_type": "tri"}, "dataset_id": dataset_id}]
    return spark.createDataFrame(pd.DataFrame(rows), schema=ZONES_SCHEMA)


# Planted near-dup corpora: id offsets for the injected rows.
PLANT_COPY_OFFSET = 1_000_000   # exact duplicates -> MUST be deduped
PLANT_NEAR_OFFSET = 2_000_000   # sub-threshold near-misses -> MUST survive


def planted_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, text) corpus with a closed-form near-dedup
    survivor set, making the LSH dedup paths (minhash_dedup,
    simhash_dedup) fully oracle-checkable:

    * base docs: 8 md5-derived 32-hex tokens per doc_id — token sets are
      pseudorandom and disjoint across docs, so pairwise char-shingle
      Jaccard is ~0 and pairwise simhash hamming is ~32 (verified
      empirically at sf0.001/0.01/0.1; the corpus is deterministic, so
      what holds locally holds at driver time);
    * for doc_id % 5 == 0: an EXACT copy at doc_id + PLANT_COPY_OFFSET.
      Identical text -> identical minhash/simhash signature -> collides
      in every LSH band -> guaranteed candidate -> exact verify passes
      (Jaccard 1 / hamming 0) -> the larger id is dropped. Removal is
      thus *guaranteed*, not probabilistic — the one case where LSH
      recall is certain;
    * for doc_id % 7 == 3: a near-miss at doc_id + PLANT_NEAR_OFFSET
      sharing the first 4 of 8 tokens (char-5-gram Jaccard ~0.33 << 0.8
      threshold). It may or may not band-collide, but the exact verify
      step deterministically rejects it, so survival is guaranteed.

    Survivors = all base docs + all near-misses:
        SELECT doc_id FROM documents UNION ALL
        SELECT doc_id + 2000000 FROM documents WHERE doc_id % 7 = 3
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    base_text, near_text = _planted_text_exprs()
    base = docs.select("doc_id", base_text.alias("text"))
    copies = (docs.filter(F.col("doc_id") % 5 == 0)
              .select((F.col("doc_id") + PLANT_COPY_OFFSET).alias("doc_id"),
                      base_text.alias("text")))
    near = (docs.filter(F.col("doc_id") % 7 == 3)
            .select((F.col("doc_id") + PLANT_NEAR_OFFSET).alias("doc_id"),
                    near_text.alias("text")))
    return base.unionByName(copies).unionByName(near)


def _planted_text_exprs():
    """(base_text, near_text) column expressions over a ``doc_id``
    column: 8 md5-derived 32-hex tokens per doc (pairwise-disjoint
    token sets across docs), and a near-miss sharing the first 4 of 8
    tokens (char-5-gram Jaccard ~0.33 << the 0.8 dedup threshold)."""
    def tok(prefix: str, j: int):
        return F.md5(F.concat(F.lit(prefix), F.col("doc_id").cast("string"),
                              F.lit(f"-{j}")))

    base_text = F.concat_ws(" ", *[tok("", j) for j in range(8)])
    near_text = F.concat_ws(" ", *[tok("", j) for j in range(4)],
                            *[tok("nm", j) for j in range(4)])
    return base_text, near_text


def planted_document_batch(spark: SparkSession, sf_dir: str):
    """(corpus, batch) for incremental_minhash_dedup with a closed-form
    batch survivor set. corpus = the base planted-doc texts (the
    committed survivors; the contract query stores only their MinHash
    signatures). Batch:

    * doc_id % 5 == 0: EXACT copy of the corpus doc at +PLANT_COPY_OFFSET
      -> identical signature, agrees on every component -> loses to the
      corpus (removal guaranteed, not probabilistic);
    * doc_id % 7 == 3: near-miss at +PLANT_NEAR_OFFSET (4 of 8 tokens
      shared, Jaccard ~0.33 -> signature agreement far below the 0.8
      threshold) -> survives vs the corpus;
    * doc_id % 7 == 3: EXACT copy of that near-miss text at
      +PLANT_WITHIN_OFFSET -> loses WITHIN the batch (exact verify,
      larger id).

    Batch survivors:
        SELECT doc_id + 2000000 FROM documents WHERE doc_id % 7 = 3
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    base_text, near_text = _planted_text_exprs()
    corpus = docs.select("doc_id", base_text.alias("text"))
    copies = (docs.filter(F.col("doc_id") % 5 == 0)
              .select((F.col("doc_id") + PLANT_COPY_OFFSET).alias("doc_id"),
                      base_text.alias("text")))
    near = (docs.filter(F.col("doc_id") % 7 == 3)
            .select((F.col("doc_id") + PLANT_NEAR_OFFSET).alias("doc_id"),
                    near_text.alias("text")))
    within = (docs.filter(F.col("doc_id") % 7 == 3)
              .select((F.col("doc_id") + PLANT_WITHIN_OFFSET).alias("doc_id"),
                      near_text.alias("text")))
    batch = copies.unionByName(near).unionByName(within)
    return corpus, batch


def planted_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings -> (vec_id, embedding) corpus with a closed-form
    cosine-near-dup survivor set (organic pairwise |cos| is bounded at
    ~0.6 on the driver's synthetic embeddings — far below the 0.98
    threshold — so planted rows fully determine the answer):

    * vec_id % 5 == 0: exact copy at +PLANT_COPY_OFFSET (cos = 1, same
      hyperplane-LSH bucket byte-for-byte -> guaranteed candidate ->
      removed);
    * vec_id % 7 == 3: negated vector at +PLANT_NEAR_OFFSET (cos = -1
      vs its parent and -cos(parent, x) vs everything else -> never
      >= 0.98 -> survives).

    Survivors = all originals + all negated rows.
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    copies = (emb.filter(F.col("vec_id") % 5 == 0)
              .select((F.col("vec_id") + PLANT_COPY_OFFSET).alias("vec_id"),
                      "embedding"))
    neg = (emb.filter(F.col("vec_id") % 7 == 3)
           .select((F.col("vec_id") + PLANT_NEAR_OFFSET).alias("vec_id"),
                   F.transform("embedding", lambda x: -x).alias("embedding")))
    return (emb.select("vec_id", "embedding")
            .unionByName(copies).unionByName(neg))


PLANT_WITHIN_OFFSET = 5_000_000  # batch-internal dup -> must lose in-batch


def planted_embedding_batch(spark: SparkSession, sf_dir: str):
    """(corpus, batch) pair for incremental_embedding_dedup with a
    closed-form batch survivor set (organic pairwise |cos| on the
    driver's synthetic embeddings is bounded ~0.6, far below the 0.98
    threshold, so planted rows fully determine the answer):

    * corpus = the base embeddings table — the committed survivors of
      previous drops, passed as a vector-only relation (ids unread);
    * batch:
      - vec_id % 5 == 0: exact copy at +PLANT_COPY_OFFSET — loses to
        the corpus (cos = 1; same buckets byte-for-byte, no id rule);
      - vec_id % 7 == 3: negated vector at +PLANT_NEAR_OFFSET (cos = -1
        vs its parent, -cos(parent, x) vs everything else — never
        >= 0.98 against any corpus vector) — can only lose in-batch;
      - vec_id % 7 == 3: exact copy of that negated vector at
        +PLANT_WITHIN_OFFSET — loses WITHIN the batch to the smaller-id
        negated row.

    Batch survivors = exactly the +PLANT_NEAR_OFFSET rows:
        SELECT vec_id + 2000000 FROM embeddings WHERE vec_id % 7 = 3
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.select("embedding")
    copies = (emb.filter(F.col("vec_id") % 5 == 0)
              .select((F.col("vec_id") + PLANT_COPY_OFFSET).alias("vec_id"),
                      "embedding"))
    neg_vec = F.transform("embedding", lambda x: -x).alias("embedding")
    near = (emb.filter(F.col("vec_id") % 7 == 3)
            .select((F.col("vec_id") + PLANT_NEAR_OFFSET).alias("vec_id"),
                    neg_vec))
    within = (emb.filter(F.col("vec_id") % 7 == 3)
              .select((F.col("vec_id") + PLANT_WITHIN_OFFSET).alias("vec_id"),
                      neg_vec))
    batch = copies.unionByName(near).unionByName(within)
    return corpus, batch


def planted_union_batch(spark: SparkSession, sf_dir: str):
    """(corpus, batch) for incremental_union_dataset with a closed-form
    batch survivor set. The committed corpus has one record per
    customer at its derived position with phash = custkey — distinct
    per customer, so cross-customer merges are impossible regardless of
    how close two customers' derived positions land. The new drop
    plants one scenario per custkey % 4 (batch ids = custkey*10 + i):

    * %4=0, id +0: record 0.3 m north, SAME phash/caption
        -> loses to the corpus (proximity + payload match);
    * %4=1, id +1: record 0.3 m north, phash +10^7
        -> survives (payload keys differ; proximity alone never merges);
    * %4=2, ids +1/+2: TWO records 3.0 m and 3.3 m north sharing phash
        +2*10^7 (matching each other — 0.3 m apart — but neither the
        corpus) -> the smaller id survives, the larger loses WITHIN
        the batch;
    * %4=3, id +3: record 10 m north, same phash as the corpus
        -> survives (outside the 0.5 m default proximity).

    Batch survivors:
        SELECT custkey*10 + 1 WHERE custkey % 4 IN (1, 2)
        UNION ALL SELECT custkey*10 + 3 WHERE custkey % 4 = 3
    """
    cust = derive_lonlat(spark.read.parquet(f"{sf_dir}/customer.parquet"),
                         "c_custkey")
    corpus = cust.select("lon", "lat",
                         F.col("c_custkey").cast("long").alias("phash"),
                         F.lit("c").alias("caption"))
    deg_per_m = 1.0 / geom.M_PER_DEG_LAT

    def rec(mod: int, idx: int, dlat_m: float, phash_off: int) -> DataFrame:
        return (cust.filter(F.col("c_custkey") % 4 == mod)
                .select((F.col("c_custkey") * 10 + idx).cast("long")
                        .alias("image_id"),
                        F.col("lon"),
                        (F.col("lat") + F.lit(dlat_m * deg_per_m)).alias("lat"),
                        (F.col("c_custkey") + phash_off).cast("long")
                        .alias("phash"),
                        F.lit("c").alias("caption")))

    batch = (rec(0, 0, 0.3, 0)
             .unionByName(rec(1, 1, 0.3, 10_000_000))
             .unionByName(rec(2, 1, 3.0, 20_000_000))
             .unionByName(rec(2, 2, 3.3, 20_000_000))
             .unionByName(rec(3, 3, 10.0, 0)))
    return corpus, batch


def chain_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer -> image records with planted proximity CHAINS for the
    exact connected-components collapse (union_dataset collapse='cc',
    the engine's one iterative algorithm — pointer-jumped min-label
    propagation, core/join has no analogue):

    * c_custkey % 50 == 0: a 4-member chain at ids k*10+j (j=0..3),
      alternating datasets A/B, adjacent members 0.4 m apart on the lat
      axis (within the 0.5 m default proximity) and non-adjacent 0.8 m+
      apart — so the duplicate relation is a PATH and only transitive
      closure finds one survivor. All share phash=k, caption 'c'.
    * other customers: one single record (id k*10+9, phash k+10^7).

    Distinct phash per chain blocks cross-chain merges even when two
    derived anchors land close, so the cc survivor set is closed-form:
    min-rank member per chain (dataset A, lowest id = k*10) + all
    singles."""
    cust = derive_lonlat(spark.read.parquet(f"{sf_dir}/customer.parquet"),
                         "c_custkey")
    step = 0.4 / geom.M_PER_DEG_LAT
    j = F.explode(F.array(*[F.lit(i) for i in range(4)]))
    members = (cust.filter(F.col("c_custkey") % 50 == 0)
               .select("c_custkey", "lon", "lat").withColumn("j", j)
               .select((F.col("c_custkey") * 10 + F.col("j")).cast("long")
                       .alias("image_id"),
                       F.col("lon"),
                       (F.col("lat") + F.col("j") * F.lit(step)).alias("lat"),
                       F.col("c_custkey").cast("long").alias("phash"),
                       F.lit("c").alias("caption"),
                       F.when(F.col("j") % 2 == 0, F.lit("ds-A"))
                        .otherwise(F.lit("ds-B")).alias("dataset_id")))
    singles = (cust.filter(F.col("c_custkey") % 50 != 0)
               .select((F.col("c_custkey") * 10 + 9).cast("long")
                       .alias("image_id"),
                       "lon", "lat",
                       (F.col("c_custkey") + 10_000_000).cast("long")
                       .alias("phash"),
                       F.lit("c").alias("caption"),
                       F.lit("ds-A").alias("dataset_id")))
    return members.unionByName(singles)


def _synth_supplier_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier -> (audio_id, bytes) of REAL PCM16 WAV blobs carrying a
    square wave with closed-form features. For key k:
      period p = 2 + k%7, length L = 1000 + k%100,
      amplitude a = 1000 + (k*37)%1000,
      s[i] = +a if (i//p) even else -a.
    Exact features: n_samples=L, peak=a, rms=a (all |s|=a, so
    isqrt(sum/L)=a), zero_crossings=(L-1)//p (one sign change at every
    positive multiple of p below L) — a full SQL oracle over WAV parse
    + numpy DSP."""
    from pyspark.sql import types as T

    from .codecs.audio import wav_bytes
    import numpy as np

    @F.pandas_udf(T.BinaryType())
    def _wav(key: pd.Series) -> pd.Series:
        out = []
        for k in key:
            k = int(k)
            p, L, a = 2 + k % 7, 1000 + k % 100, 1000 + (k * 37) % 1000
            i = np.arange(L, dtype=np.int64)
            s = np.where((i // p) % 2 == 0, a, -a).astype(np.int16)
            out.append(wav_bytes(s))
        return pd.Series(out)

    df = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    return df.select(F.col("s_suppkey").cast("long").alias("audio_id"),
                     _wav.asNondeterministic()(F.col("s_suppkey"))
                     .alias("bytes"))


# ---------------------------------------------------------------------------
# fixture-blob cache: synthesize heavy binary fixtures (png/qimg blobs,
# WAV, vraw) ONCE per scale factor and read parquet thereafter, so
# contract/bench rows for decode_meta / image_phash_dedup / audio /
# video measure the OPERATOR, not blob synthesis (VERDICT r4 next #3).
# Cache key = (sf dir, fixture name, synthesis version); bump
# _CACHE_VERSION whenever any synthesis expression changes, or stale
# blobs would silently poison the correctness gate.
# ---------------------------------------------------------------------------

_CACHE_VERSION = 1


def _cache_root() -> str | None:
    import os
    root = os.environ.get("SPARK_GRAFT_FIXTURE_CACHE",
                          "/root/repo/.fixture_cache")
    return root or None  # set env to "" to disable caching


def _cached(spark: SparkSession, sf_dir: str, name: str, build) -> DataFrame:
    """Return ``build()`` materialized to (and re-read from) a per-SF
    parquet cache. The _SUCCESS marker gates reads, so a crashed partial
    write re-synthesizes instead of serving half a fixture."""
    import os
    root = _cache_root()
    if root is None:
        return build()
    tag = sf_dir.strip("/").replace("/", "_")
    path = os.path.join(root, f"v{_CACHE_VERSION}", tag, name)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # spread the cache over many files: the source TPC-H parquet is
        # a single small file (one task), and blob tables must read back
        # with enough splits that downstream decode stages parallelize —
        # parquet's open-cost accounting gives one task per small file
        n_shards = int(spark.sparkContext.defaultParallelism) or 8
        build().repartition(n_shards).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


PHASH_MULT = 11400714819323198485  # 64-bit golden-ratio odd constant
PHASH_MOD = 1 << 61


def phash_class_value(c: int) -> int:
    """Closed-form planted perceptual hash for phash class ``c`` (the
    k%127 residue). Verified offline over all 127 classes: min pairwise
    hamming 17 (so no cross-class pair can pass a small max_hamming
    verify) and all four 16-bit bands fully distinct (so every class
    owns a dedicated LSH bucket per band — star-capped hot buckets keep
    the min-per-class closed form deterministic)."""
    return ((c + 1) * PHASH_MULT) % PHASH_MOD


def _synth_part_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part -> (image_id, bytes, fmt) of REAL png/qimg blobs whose
    DECODED metadata is closed-form. For key k:
      V = phash_class_value(k % 127)  (< 2^61, int64-safe),
      side s = 1 + k%3, dims = 8s x 8s,
      pixel block (i, j) (each s x s) filled with constant RGB 200 if
      bit 63-(8i+j) of V is set else 40, fmt png if k even else qimg.
    Every pooled 8x8 cell is then a constant strictly above/below the
    pooled mean (qimg's mid-rise reconstruction 200->202 / 40->42 keeps
    the ordering) and ahash64 builds its value MSB-first from
    pooled[0,0], so the recomputed phash equals V EXACTLY and dims = 8s
    — a full SQL oracle over the real decode. Keys sharing k%127 are
    planted perceptual duplicates (identical pixels up to scale/codec
    never flip a pooled bit -> identical phash)."""
    from pyspark.sql import types as T

    from .codecs.image import encode_image
    import numpy as np

    @F.pandas_udf(T.BinaryType())
    def _img(key: pd.Series) -> pd.Series:
        # fixture-synth memoization: only 127 classes x 3 sizes x 2
        # formats = 762 distinct blobs exist, so encode each once per
        # Arrow batch. (The DECODE side stays per-row — that is the
        # operator under test; this cache only removes synth overhead.)
        cache: dict = {}
        out = []
        for k in key:
            k = int(k)
            ck = (k % 127, k % 3, k % 2)
            blob = cache.get(ck)
            if blob is None:
                v = phash_class_value(k % 127)
                s = 1 + k % 3
                cell = np.array([[(v >> (63 - (8 * i + j))) & 1
                                  for j in range(8)] for i in range(8)],
                                dtype=np.uint8)
                img = np.repeat(np.repeat(np.where(cell == 1, 200, 40),
                                          s, 0), s, 1).astype(np.uint8)
                img = np.stack([img] * 3, axis=-1)
                blob = encode_image(img, "png" if k % 2 == 0 else "qimg")
                cache[ck] = blob
            out.append(blob)
        return pd.Series(out)

    df = spark.read.parquet(f"{sf_dir}/part.parquet")
    return df.select(F.col("p_partkey").cast("long").alias("image_id"),
                     _img.asNondeterministic()(F.col("p_partkey"))
                     .alias("bytes"),
                     F.when(F.col("p_partkey") % 2 == 0, F.lit("png"))
                     .otherwise(F.lit("qimg")).alias("fmt"))


def _synth_supplier_videos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier -> (video_id, bytes) of vraw containers with closed-form
    frame content. For key k: F = 3 + k%5 frames of 4x4 RGB, frame f
    filled with the constant byte (k + f) % 256, so a sampled frame's
    integer pixel sum is exactly 48 * ((k + f) % 256)."""
    from pyspark.sql import types as T

    from .codecs.video import vraw_bytes
    import numpy as np

    @F.pandas_udf(T.BinaryType())
    def _vid(key: pd.Series) -> pd.Series:
        out = []
        for k in key:
            k = int(k)
            n = 3 + k % 5
            frames = np.stack([
                np.full((4, 4, 3), (k + f) % 256, dtype=np.uint8)
                for f in range(n)])
            out.append(vraw_bytes(frames))
        return pd.Series(out)

    df = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    return df.select(F.col("s_suppkey").cast("long").alias("video_id"),
                     _vid.asNondeterministic()(F.col("s_suppkey"))
                     .alias("bytes"))


def supplier_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached wrapper over _synth_supplier_audio (see _cached)."""
    return _cached(spark, sf_dir, "supplier_audio",
                   lambda: _synth_supplier_audio(spark, sf_dir))


def part_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached wrapper over _synth_part_images (see _cached)."""
    return _cached(spark, sf_dir, "part_images",
                   lambda: _synth_part_images(spark, sf_dir))


def supplier_videos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached wrapper over _synth_supplier_videos (see _cached)."""
    return _cached(spark, sf_dir, "supplier_videos",
                   lambda: _synth_supplier_videos(spark, sf_dir))


def part_images_captioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part_images plus a caption whose duplicate classes deliberately
    DISAGREE with the pixel classes: caption = 'cap-' || (k % 89) while
    pixels repeat per k % 127 — so plenty of pairs match on exactly one
    modality (same caption / different image, same image / different
    caption). cross_modal_dedup's survivor set is then closed-form: a
    key survives iff it is the minimum of BOTH its pixel class (k % 127)
    and its caption class (k % 89), which is pure integer SQL. Caption
    derivation is a string expression over the cached blob table — the
    cache carries only synthesis-heavy columns."""
    imgs = part_images(spark, sf_dir)
    return imgs.withColumn(
        "caption", F.concat(F.lit("cap-"),
                            (F.col("image_id") % 89).cast("string")))


def part_images_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part_images plus a planted 10-site location lattice that
    deliberately disagrees with the pixel classes: site = k % 10 (all
    members of a site share the EXACT same lon/lat; distinct sites sit
    ~157 m apart, far beyond any dedup radius), while pixels repeat per
    k % 127. geo_visual_dedup then sees both disagreement cases —
    co-located but visually distinct (same k%10, different k%127:
    planted hamming >= 17) and visual twins too far apart (same k%127,
    different k%10) — and its survivor set is the min of the JOINT
    class k % 1270, pure integer SQL. Location derivation is a column
    expression over the cached blob table (the caption pattern,
    part_images_captioned)."""
    imgs = part_images(spark, sf_dir)
    site = F.col("image_id") % 10
    return (imgs
            .withColumn("lon", F.lit(-122.0) + site / F.lit(1000.0))
            .withColumn("lat", F.lit(47.0) + site / F.lit(1000.0)))


def part_image_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part_images plus a second blob of the SAME planted pattern in
    the OTHER codec (png <-> qimg) — the lossless/lossy pair
    decode_mse_cols compares. qimg's mid-rise reconstruction shifts
    every pixel by exactly 2 (200->202, 40->42 on all 3 channels), so
    the pair's integer squared error is closed-form: 4 per channel
    sample -> sq_err_sum = 4 * 192 * s^2 = 768 s^2, PSNR = 42.11 dB
    (>= the 40 dB lossy gate). Derivation rides over the cached blob
    table; only 762 distinct blobs exist, memoized per batch."""
    from pyspark.sql import types as T

    from .codecs.image import encode_image

    @F.pandas_udf(T.BinaryType())
    def _img2(key: pd.Series) -> pd.Series:
        import numpy as np
        cache: dict = {}
        out = []
        for k in key:
            k = int(k)
            ck = (k % 127, k % 3, k % 2)
            blob = cache.get(ck)
            if blob is None:
                v = phash_class_value(k % 127)
                s = 1 + k % 3
                cell = np.array([[(v >> (63 - (8 * i + j))) & 1
                                  for j in range(8)] for i in range(8)],
                                dtype=np.uint8)
                img = np.repeat(np.repeat(np.where(cell == 1, 200, 40),
                                          s, 0), s, 1).astype(np.uint8)
                img = np.stack([img] * 3, axis=-1)
                # OPPOSITE parity: even keys stored png get a qimg twin
                blob = encode_image(img, "qimg" if k % 2 == 0 else "png")
                cache[ck] = blob
            out.append(blob)
        return pd.Series(out)

    imgs = part_images(spark, sf_dir)
    return (imgs
            .withColumn("bytes_b",
                        _img2.asNondeterministic()(F.col("image_id")))
            .withColumn("fmt_b",
                        F.when(F.col("image_id") % 2 == 0, F.lit("qimg"))
                        .otherwise(F.lit("png"))))


def part_images_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part_images geotagged with the standard derived-point scramble
    (derive_lonlat on image_id) — unlike part_images_geo's 10-site
    lattice, every image gets its own lattice point over the full
    0.1-degree box, so raster layers built from the blobs occupy
    hundreds of tiles. Location derivation is a column expression over
    the cached blob table."""
    return derive_lonlat(part_images(spark, sf_dir), "image_id")


def customer_images(spark: SparkSession, sf_dir: str, side: str,
                    n_dups: int = 300, dup_dlon: float = 0.0,
                    dup_dlat: float = 2e-6) -> DataFrame:
    """customer -> image-like point records for the union fixture.

    Side 'A': one record per customer, phash = c_custkey,
    caption 'c<custkey>'. Side 'B': same customers where
    c_custkey < n_dups are content-duplicates of A (same phash/caption,
    shifted by (dup_dlon, dup_dlat) deg — default +2e-6 lat ~ 0.22 m <
    proximity 0.5 m); the rest carry a distinct phash (offset by 10^7)
    so they never merge. The local-metric union row instead shifts LON
    by 6e-6 deg: 0.668 m under the equator convention (no merge at
    0.5) but 0.450 m under cos(47.6 deg) (merge) — the survivor set
    itself pins which metric ran.
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
               .withColumn("lon", F.col("lon") + F.lit(dup_dlon))
               .withColumn("lat", F.col("lat") + F.lit(dup_dlat))
               .withColumn("dataset_id", F.lit("ds-B")))
    return (out.withColumn("caption", F.concat(F.lit("c"), F.col("c_custkey")))
            .withColumn("bytes", F.lit(None).cast("binary"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("png"))
            .withColumn("props", F.create_map().cast("map<string,string>"))
            .select("image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                    "lon", "lat", "props", "dataset_id"))


# --- cleansing-tier fixtures (pipeline/cleanse.py oracles) -----------------

# planted boilerplate lines for the line-dedup fixture: appended to every
# doc_id % 3 == 0 (resp. % 5 == 0) document, so their document frequency
# (~n/3, ~n/5) dwarfs any organic 8-word line (31-word vocab -> 31^8
# possible lines; the rule-replicating oracle is exact regardless)
BOILER_A = "subscribe to our newsletter for weekly updates now"
BOILER_B = "all rights reserved click here to learn more"
LINE_WORDS = 8


def lined_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents re-chunked into newline-separated lines of LINE_WORDS
    whitespace words (the corpus has no organic newlines), with the two
    boilerplate lines planted on the %3 / %5 residues — the input shape
    pipeline/cleanse.dedup_lines expects. Pure Catalyst, and every step
    (split, slice, concat, conditional append) has an exact DuckDB
    replica, so line-dedup output is SQL-checkable end to end."""
    from .pipeline.text import words_col
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = words_col(F.col("text"))
    n_lines = F.floor((F.size(words) + F.lit(LINE_WORDS - 1))
                      / F.lit(LINE_WORDS)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda j: F.concat_ws(" ", F.slice(words, j * LINE_WORDS + 1,
                                           LINE_WORDS)))
    empty = F.array().cast("array<string>")
    lines = F.concat(
        lines,
        F.when(F.col("doc_id") % 3 == 0, F.array(F.lit(BOILER_A)))
         .otherwise(empty),
        F.when(F.col("doc_id") % 5 == 0, F.array(F.lit(BOILER_B)))
         .otherwise(empty))
    return docs.select("doc_id", F.array_join(lines, "\n").alias("text"),
                       "source")


def orders_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geotagged image-metadata records derived from orders — the
    point-dimension source for the zonal image-statistics query: lon/lat
    from the key lattice, w = 8*(1 + k%3), h = 8*(1 + k%5) (the same
    size law part_images plants), so per-zone metadata aggregates are
    closed-form integers in both engines."""
    pts = orders_points(spark, sf_dir)
    return (pts.withColumn("w", (8 * (1 + F.col("o_orderkey") % 3)).cast("int"))
            .withColumn("h", (8 * (1 + F.col("o_orderkey") % 5)).cast("int")))


def pii_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with planted PII: an email appended on the %4 residue
    and a phone number on the %6 residue (the organic corpus has
    neither '@' nor dashes, so matches are exactly the plants). Both
    engines build the same string, so pipeline/cleanse.redact_pii is
    SQL-checkable end to end."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    email = F.when(F.col("doc_id") % 4 == 0,
                   F.concat(F.lit(" contact user"), F.col("doc_id"),
                            F.lit("@example.com now"))).otherwise(F.lit(""))
    phone = F.when(F.col("doc_id") % 6 == 0,
                   F.concat(F.lit(" call 206-555-"),
                            F.lpad(F.col("doc_id") % 10000, 4, "0"),
                            F.lit(" today"))).otherwise(F.lit(""))
    return docs.select("doc_id",
                       F.concat(F.col("text"), email, phone).alias("text"),
                       "source")


def chain_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer -> (image_id, phash) records with planted HAMMING
    3-chains whose member-id order is non-monotone along the chain —
    the fixture that separates the connected-components cluster
    collapse (pipeline/dedup.hash_cluster_dedup) from the pairwise
    larger-id-loses rule (hash_neardup), with every guarantee
    closed-form rather than probabilistic:

    * class code c = (k << 1) | parity(k) — the parity-extended
      identity code has minimum pairwise distance 2, and custkeys are
      distinct and < 32768 at every shipped SF, so c fits 16 bits;
    * base hash = c replicated into all four 16-bit bands -> any two
      classes are >= 3*2 = 6 > max_hamming=3 apart on the full 64 bits
      no matter what the chain masks do to band 0, so chains can never
      merge across classes;
    * members j=0,1,2 at hashes base ^ {0, 0b111, 0b111111}: pairwise
      distances d(0,1)=d(1,2)=3 (edges) and d(0,2)=6 (no edge) — a
      PATH; bands 1-3 are identical within a class, so candidate
      generation is pigeonhole-guaranteed, not LSH-probabilistic;
    * member ids (3k, 3k+2, 3k+1): the path endpoint 3k+1's only
      neighbor is 3k+2 (larger), so the pairwise rule keeps BOTH
      endpoints {3k, 3k+1}, while the cc collapse keeps exactly the
      component minimum {3k} — the contract oracle pins the latter.
    """
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey").cast("long")
    code = F.shiftleft(k, 1).bitwiseOR(F.bit_count(k) % 2)
    base = (code.bitwiseOR(F.shiftleft(code, 16))
            .bitwiseOR(F.shiftleft(code, 32))
            .bitwiseOR(F.shiftleft(code, 48)))
    members = [cust.select((k * 3 + off).alias("image_id"),
                           base.bitwiseXOR(F.lit(mask)).alias("phash"))
               for mask, off in ((0, 0), (0b111, 2), (0b111111, 1))]
    return members[0].unionByName(members[1]).unionByName(members[2])


# ---------------------------------------------------------------------------
# Integer pixel-zone rectangles for zonal raster statistics
# ---------------------------------------------------------------------------
# A 6x5 grid of 2px x 3px zones in GLOBAL z15 pixel coordinates, anchored
# to cover the full derived-point lattice (lon in [-122.35, -122.25) ->
# gx in [5247, 5256]; lat in [47.60, 47.70) -> gy in [11431, 11444] at
# every SF, since the key derivation is modular). Zone edges are integer
# pixel bounds (inclusive) deliberately misaligned with the 16px tile
# grid, so the tile-cover equi-join in raster.zonal_stats is exercised
# across tile borders. The same constants build the DuckDB VALUES oracle.
PIXEL_ZONE_GX0, PIXEL_ZONE_GY0 = 5246, 11430
PIXEL_ZONE_W, PIXEL_ZONE_H = 2, 3
PIXEL_ZONE_COLS, PIXEL_ZONE_ROWS = 6, 5


def _pixel_zone_rows() -> list[dict]:
    rows = []
    for zid in range(PIXEL_ZONE_COLS * PIXEL_ZONE_ROWS):
        c, r = zid % PIXEL_ZONE_COLS, zid // PIXEL_ZONE_COLS
        gx0 = PIXEL_ZONE_GX0 + c * PIXEL_ZONE_W
        gy0 = PIXEL_ZONE_GY0 + r * PIXEL_ZONE_H
        rows.append({"zone_id": zid, "gx0": gx0, "gy0": gy0,
                     "gx1": gx0 + PIXEL_ZONE_W - 1,
                     "gy1": gy0 + PIXEL_ZONE_H - 1})
    return rows


def pixel_zones(spark: SparkSession) -> DataFrame:
    """The zone-rectangle table (zone_id, gx0, gy0, gx1, gy1), longs."""
    return spark.createDataFrame(
        pd.DataFrame(_pixel_zone_rows()),
        schema="zone_id long, gx0 long, gy0 long, gx1 long, gy1 long")


def pixel_zones_sql() -> str:
    """The same zones as a DuckDB inline relation for the oracle."""
    vals = ", ".join(
        f"({z['zone_id']}, {z['gx0']}, {z['gy0']}, {z['gx1']}, {z['gy1']})"
        for z in _pixel_zone_rows())
    return (f"(SELECT * FROM (VALUES {vals}) "
            "AS zz(zone_id, gx0, gy0, gx1, gy1))")


def event_pings(spark: SparkSession, sf_dir: str,
                dataset_id: str = "tpch-pings") -> DataFrame:
    """events -> GPS ping trajectories: per-user fixes ordered by
    (ts, event_id), lon/lat derived from event_id with the standard
    exact-int scheme. Rows whose lat hash ≡ 0 (mod 5000) are excluded
    — those sit exactly ON a grid edge or exactly equidistant between
    two, where the engine's argmin tie-break and SQL ROUND's half rule
    could legitimately disagree (same exclusion knn_rank uses)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev.filter(((F.col("event_id") * 40503 + 12345) % 5000) != 0)
    return (derive_lonlat(ev, "event_id")
            .select("event_id", "user_id", "ts", "lon", "lat")
            .withColumn("dataset_id", F.lit(dataset_id)))


def chain_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic road-network graph over customer keys, shaped for
    non-trivial BFS/shortest-path answers while staying pure integer
    SQL (so DuckDB WITH RECURSIVE can replay it exactly):

    * chain edges ``(k, k+1)`` whenever ``k % 100 != 0`` — the node set
      splits into disjoint 100-node corridors;
    * shortcut edges ``(k, k+5)`` whenever ``k % 25 == 2`` (always
      inside a corridor), cheaper than the 5 chain steps they bypass;
    * integer weights: chain ``100 + (k % 7) * 10`` m, shortcut 130 m.
    """
    c = (spark.read.parquet(f"{sf_dir}/customer.parquet")
         .select(F.col("c_custkey").cast("long").alias("k")))
    chain = (c.filter(F.col("k") % 100 != 0)
             .select(F.col("k").alias("orig_node_id"),
                     (F.col("k") + 1).alias("dest_node_id"),
                     (F.lit(100) + (F.col("k") % 7) * 10)
                     .cast("long").alias("w")))
    short = (c.filter(F.col("k") % 25 == 2)
             .select(F.col("k").alias("orig_node_id"),
                     (F.col("k") + 5).alias("dest_node_id"),
                     F.lit(130).cast("long").alias("w")))
    return chain.unionByName(short)


def chain_graph_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One seed per corridor: the k % 100 == 1 node."""
    return (spark.read.parquet(f"{sf_dir}/customer.parquet")
            .filter(F.col("c_custkey") % 100 == 1)
            .select(F.col("c_custkey").cast("long").alias("node")))


CHAIN_GRAPH_SQL = """
    edges AS (
      SELECT CAST(c_custkey AS BIGINT) AS src,
             CAST(c_custkey + 1 AS BIGINT) AS dst,
             CAST(100 + (c_custkey % 7) * 10 AS BIGINT) AS w
      FROM customer WHERE c_custkey % 100 <> 0
      UNION ALL
      SELECT CAST(c_custkey AS BIGINT), CAST(c_custkey + 5 AS BIGINT),
             CAST(130 AS BIGINT)
      FROM customer WHERE c_custkey % 25 = 2
    ),
    sym AS (
      SELECT src, dst, w FROM edges
      UNION ALL
      SELECT dst, src, w FROM edges
    ),
    seeds AS (
      SELECT CAST(c_custkey AS BIGINT) AS node
      FROM customer WHERE c_custkey % 100 = 1
    )
"""


def tri_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic triangle-rich graph over customer keys, pure
    integer SQL so DuckDB replays it exactly:

    * chain edges ``(k, k+1)`` whenever ``k % 100 != 0`` (the same
      100-node corridors as chain_graph);
    * wedge edges ``(k, k+2)`` whenever ``k % 3 == 0`` — closing the
      triangle (k, k+1, k+2) exactly when both chain edges exist
      (``k % 100 not in (0, 99)``); boundary wedges stay open on
      purpose (wedges without a closing edge must count nothing);
    * reversed duplicates ``(k+1, k)`` whenever ``k % 10 == 5`` and
      the chain edge exists — pins the canonicalization (direction
      and multiplicity must not change any count).
    """
    c = (spark.read.parquet(f"{sf_dir}/customer.parquet")
         .select(F.col("c_custkey").cast("long").alias("k")))
    chain = (c.filter(F.col("k") % 100 != 0)
             .select(F.col("k").alias("orig_node_id"),
                     (F.col("k") + 1).alias("dest_node_id")))
    wedge = (c.filter(F.col("k") % 3 == 0)
             .select(F.col("k").alias("orig_node_id"),
                     (F.col("k") + 2).alias("dest_node_id")))
    rev = (c.filter((F.col("k") % 10 == 5) & (F.col("k") % 100 != 0))
           .select((F.col("k") + 1).alias("orig_node_id"),
                   F.col("k").alias("dest_node_id")))
    return chain.unionByName(wedge).unionByName(rev)


TRI_GRAPH_SQL = """
    tri_edges AS (
      SELECT CAST(c_custkey AS BIGINT) AS src,
             CAST(c_custkey + 1 AS BIGINT) AS dst
      FROM customer WHERE c_custkey % 100 <> 0
      UNION ALL
      SELECT CAST(c_custkey AS BIGINT), CAST(c_custkey + 2 AS BIGINT)
      FROM customer WHERE c_custkey % 3 = 0
      UNION ALL
      SELECT CAST(c_custkey + 1 AS BIGINT), CAST(c_custkey AS BIGINT)
      FROM customer WHERE c_custkey % 10 = 5 AND c_custkey % 100 <> 0
    )
"""
