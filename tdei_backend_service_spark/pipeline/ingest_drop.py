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
