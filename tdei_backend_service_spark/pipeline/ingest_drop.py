"""Resumable drop admission — the incremental ingest operators composed
with the checkpoint manifest into the end-to-end "admit a new drop"
flow the north rule describes.

A drop's survivors (incremental_union_dataset vs the committed corpus)
are written partitioned by a deterministic shard key with per-partition
lineage + row/byte metrics (core/manifest.py): a killed run resumes
idempotently — committed shards are anti-joined out of the rewrite and
a complete stage is skipped without touching Spark. Survivor content is
a pure function of (batch, corpus, parameters) and the shard key is a
pure function of the row's primary key, so any shard can be recomputed
in isolation (the manifest's determinism contract).

The reference has no resume story at all (SURVEY.md §4 — its only
retry is blob-availability polling); at 10^12 committed rows a drop
admission that restarts from zero on every failure never finishes,
which is why the manifest integration is part of the operator's
definition of done here, not an afterthought.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.manifest import Manifest, read_stage
from ..operators.union_dataset import incremental_union_dataset

N_SHARDS = 16


def admit_drop(batch: DataFrame, corpus: DataFrame, run_dir: str,
               drop_id: str, proximity: float | None = None,
               pk: str = "image_id",
               match_on: tuple = ("phash", "caption"),
               n_shards: int = N_SHARDS) -> dict:
    """Admit ``batch`` against ``corpus`` and persist the survivors
    under ``run_dir``/admit_<drop_id>/shard=K with per-shard commit
    records. Re-running after a crash recomputes ONLY uncommitted
    shards; a complete stage returns ``{"skipped": True, ...}``.

    Returns the manifest record (out_dir, partition count, rows)."""
    survivors = incremental_union_dataset(batch, corpus,
                                          proximity=proximity, pk=pk,
                                          match_on=match_on)
    sharded = survivors.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(pk).cast("string")),
                        F.lit(n_shards)))
    return Manifest(run_dir).run_stage(f"admit_{drop_id}", sharded,
                                       ["shard"])


def read_admitted(spark: SparkSession, run_dir: str,
                  drop_id: str) -> DataFrame:
    """The committed survivors of a drop (shard column dropped) — feed
    ``corpus.unionByName(read_admitted(...).select(corpus.columns))``
    into the next drop's admission to grow the committed corpus."""
    return read_stage(spark, run_dir, f"admit_{drop_id}").drop("shard")


class SignatureStore:
    """Bucketed corpus-signature store for the hash tier: the banded
    DISTINCT (band, bucket, _hc) relation persisted with
    ``bucketBy(n, band, bucket)``, so every later drop admission joins
    the corpus side with ZERO corpus exchange — the bucketed scan
    reports HashPartitioning(band, bucket) and both the distinct and
    the candidate equi-join are satisfied in place; only the (small)
    drop side shuffles, sized to the bucket count.

    This is the piece that changes the 10^12-row admission cost curve:
    without it every drop re-shuffles the full corpus signature
    relation (O(|corpus|) network per drop); with it the corpus
    signatures move over the network exactly once, at commit time.
    ``append`` adds each admitted drop's signatures with the same
    bucket spec, so the invariant holds across drops. In this sandbox
    the table metadata lives in the session's in-memory catalog; on a
    real cluster the same code against a persistent metastore
    (Hive/Iceberg) carries the bucket spec across jobs."""

    def __init__(self, spark: SparkSession, table: str,
                 n_buckets: int = 32, path: str | None = None):
        self.spark = spark
        self.table = table
        self.n_buckets = n_buckets
        self.path = path

    def _banded(self, df: DataFrame, hash_col: str) -> DataFrame:
        from .dedup import _banded16
        return (_banded16(df.select(F.col(hash_col).alias("_hc")), [])
                .dropDuplicates(["band", "bucket", "_hc"])
                .select("band", "bucket", "_hc"))

    def _writer(self, df: DataFrame):
        w = (df.write.format("parquet")
             .bucketBy(self.n_buckets, "band", "bucket")
             .sortBy("band", "bucket", "_hc"))
        return w.option("path", self.path) if self.path else w

    def write(self, corpus: DataFrame, hash_col: str = "phash") -> None:
        """Create/replace the store from the committed corpus hashes."""
        self._writer(self._banded(corpus, hash_col)) \
            .mode("overwrite").saveAsTable(self.table)

    def append(self, admitted: DataFrame, hash_col: str = "phash") -> None:
        """Add an admitted drop's signatures (same bucket spec, so the
        zero-exchange property survives corpus growth)."""
        self._writer(self._banded(admitted, hash_col)) \
            .mode("append").saveAsTable(self.table)

    def read(self) -> DataFrame:
        return self.spark.table(self.table)

    def dedup_batch(self, batch: DataFrame, hash_col: str, id_col: str,
                    max_hamming: int = 3,
                    bucket_cap: int | None = None) -> DataFrame:
        """incremental_hash_neardup with the corpus side served from
        the bucketed store: identical survivor set (parity-tested), but
        the corpus relation is scanned pre-partitioned — the per-drop
        distinct (appends may re-deliver a hash) and the candidate join
        reuse the bucketing instead of exchanging."""
        from .dedup import (BUCKET_CAP, _banded16, _finalize_losers,
                            hash_neardup_losers)
        bucket_cap = BUCKET_CAP if bucket_cap is None else bucket_cap
        batch_sigs = batch.select(id_col,
                                  F.col(hash_col).alias("_hc")).persist()
        within = hash_neardup_losers(batch_sigs, "_hc", id_col,
                                     max_hamming=max_hamming,
                                     bucket_cap=bucket_cap)
        corpus_b = (self.read()
                    .dropDuplicates(["band", "bucket", "_hc"])
                    .select("band", "bucket", F.col("_hc").alias("_ch")))
        batch_b = _banded16(batch_sigs, [id_col])
        cross = (batch_b.join(corpus_b, ["band", "bucket"])
                 .filter(F.bit_count(F.col("_hc").bitwiseXOR(F.col("_ch")))
                         <= max_hamming)
                 .select(id_col))
        losers = within.unionByName(cross).distinct()
        losers = _finalize_losers(losers, [batch_sigs], True)
        return batch.join(losers, id_col, "left_anti")


class VectorStore:
    """Bucketed corpus store for the EMBEDDING tier — the vector twin
    of SignatureStore: the corpus's hyperplane-keyed relation
    (_band, _bkt, _cv) persisted with ``bucketBy(n, _band, _bkt)``, so
    incremental embedding dedup joins the corpus side with zero
    exchange (only the drop shuffles, sized to the bucket count).

    The hyperplane family is deterministic in (seed, dimension) —
    dedup.py's ``_hyperplanes`` — so a drop keyed with the same
    constructor parameters lands in the same buckets as the committed
    corpus by construction; (planes, bands, seed) are therefore part
    of the store's identity and must match between ``write`` and
    ``dedup_batch`` (same rule as re-running the batch operator)."""

    def __init__(self, spark: SparkSession, table: str,
                 n_buckets: int = 32, planes: int = 16, bands: int = 2,
                 seed: int = 11, path: str | None = None):
        self.spark = spark
        self.table = table
        self.n_buckets = n_buckets
        self.planes = planes
        self.bands = bands
        self.seed = seed
        self.path = path

    def _keyed(self, df: DataFrame, vec_col: str) -> DataFrame:
        from .dedup import _hyperplane_keyed, _hyperplanes
        H = _hyperplanes(df, vec_col, self.planes, self.bands, self.seed)
        if H is None:
            raise ValueError("VectorStore: empty frame has no dimension")
        return (_hyperplane_keyed(df.select(F.col(vec_col).alias("_cv")),
                                  "_cv", H)
                .select("_band", "_bkt", "_cv"))

    def _writer(self, df: DataFrame):
        w = (df.write.format("parquet")
             .bucketBy(self.n_buckets, "_band", "_bkt")
             .sortBy("_band", "_bkt"))
        return w.option("path", self.path) if self.path else w

    def write(self, corpus: DataFrame, vec_col: str = "embedding") -> None:
        self._writer(self._keyed(corpus, vec_col)) \
            .mode("overwrite").saveAsTable(self.table)

    def append(self, admitted: DataFrame,
               vec_col: str = "embedding") -> None:
        self._writer(self._keyed(admitted, vec_col)) \
            .mode("append").saveAsTable(self.table)

    def read(self) -> DataFrame:
        return self.spark.table(self.table)

    def dedup_batch(self, batch: DataFrame, vec_col: str = "embedding",
                    id_col: str = "vec_id", threshold: float = 0.98,
                    bucket_cap: int | None = None) -> DataFrame:
        """incremental_embedding_dedup with the corpus served from the
        bucketed store: identical survivor set (parity-tested), corpus
        vectors never re-shuffle. A batch row loses on exact cosine >=
        threshold vs ANY stored vector (corpus always wins) or on the
        min-id rule within the batch."""
        from .dedup import (BUCKET_CAP, _dot, _embedding_losers,
                            _finalize_losers, _hyperplane_keyed,
                            _hyperplanes, _norm)
        bucket_cap = BUCKET_CAP if bucket_cap is None else bucket_cap
        H = _hyperplanes(batch, vec_col, self.planes, self.bands,
                         self.seed)
        if H is None:
            return batch
        b_keyed = _hyperplane_keyed(batch.select(id_col, vec_col),
                                    vec_col, H).persist()
        within = _embedding_losers(b_keyed, vec_col, id_col, threshold,
                                   bucket_cap, False, self.planes)
        cos_ok = (_dot(F.col(vec_col), F.col("_cv"))
                  / (_norm(F.col(vec_col)) * _norm(F.col("_cv")))) \
            >= threshold
        cross = (b_keyed.join(self.read(), ["_band", "_bkt"])
                 .filter(cos_ok).select(id_col))
        losers = within.unionByName(cross).distinct()
        losers = _finalize_losers(losers, [b_keyed], True)
        return batch.join(losers, id_col, "left_anti")
