"""Corpus-curation operators a training-data pipeline runs after
cleaning/dedup: sequence packing (fill fixed token budgets for training
batches) and deterministic stratified sampling (per-domain eval/holdout
sets).

Scale shape: both are ONE shuffle each — packing exchanges on the shard
key and runs a window cumsum inside each shard; sampling exchanges on
the stratification key and takes a bounded row_number prefix. No Python
anywhere (pure Catalyst window functions), no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

PACK_SCRAMBLE = 2654435761  # Knuth multiplicative constant (32-bit)


def pack_documents(df: DataFrame, budget: int, n_shards: int = 8,
                   token_col: str = "n_tokens", id_col: str = "doc_id") -> DataFrame:
    """Assign every document to a training pack of ~``budget`` tokens.

    Document-boundary BLOCK packing, the standard distributed
    approximation of greedy sequence packing: documents are sharded
    (``id % n_shards`` — deterministic, balanced for dense ids), ordered
    by id within the shard, and a document belongs to the pack in which
    its first token lands: ``pack = (cumsum - n_tokens) // budget``.
    Exactly reproducible as a SQL window cumsum, so the operator carries
    a full DuckDB oracle; a document longer than ``budget`` occupies (at
    least) its own pack. Output adds (shard, pack_id, pack_offset) where
    pack_offset is the document's first-token offset within its pack.

    One exchange on the shard key; the window runs per shard partition.
    At 10^12 docs you raise ``n_shards`` to the write parallelism you
    want — pack ids are local to a shard by construction, so shards
    never coordinate."""
    shard = (F.col(id_col) % F.lit(n_shards)).alias("shard")
    w = (Window.partitionBy("shard").orderBy(F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.sum(F.col(token_col)).over(w) - F.col(token_col))
    budget = int(budget)
    return (df.withColumn("shard", shard)
            .withColumn("_start", start)
            # integer `div`, not double division: a shard's token cumsum
            # can exceed 2^53 at 10^12-doc scale, where float division
            # would mis-assign boundary documents
            .withColumn("pack_id", F.expr(f"_start div {budget}"))
            .withColumn("pack_offset", F.col("_start") % F.lit(budget))
            .drop("_start"))


def filter_top_fraction(df: DataFrame, score_col: str, key_col: str,
                        num: int = 1, den: int = 2,
                        id_col: str = "doc_id") -> DataFrame:
    """Per-key quality-percentile cut: keep each key's top ``num/den``
    fraction of rows by ``score_col`` (descending; ties on the id) —
    the "keep the best half of every domain" filter a webtext pipeline
    runs on its quality scores. The keep rule is pure INTEGER
    arithmetic, ``rank * den <= n * num``, so the survivor set is exact
    in any engine (no float percentile boundary).

    One exchange on the key; both windows share the partitioning."""
    w = (Window.partitionBy(key_col)
         .orderBy(F.col(score_col).desc(), F.col(id_col).asc()))
    n = Window.partitionBy(key_col)
    return (df.withColumn("_rk", F.row_number().over(w))
            .withColumn("_n", F.count(F.lit(1)).over(n))
            .filter(F.col("_rk") * F.lit(int(den)) <= F.col("_n") * F.lit(int(num)))
            .drop("_rk", "_n"))


def sample_per_key(df: DataFrame, key_col: str, k: int,
                   id_col: str = "doc_id", seed: int = 7) -> DataFrame:
    """Deterministic stratified sample: k rows per ``key_col`` value,
    chosen by a seeded integer scramble of the id (Knuth multiplicative
    hash mod 2^32) — a fixed pseudo-random permutation both this engine
    and any SQL oracle compute bit-identically, so eval/holdout sets are
    reproducible across engines and runs. Ties (scramble collisions)
    break on the id. At production scale swap the scramble for
    ``xxhash64(id, seed)`` — same plan, same one-exchange shape.

    Window rank per key partition: one exchange on the stratification
    key, TakeOrdered-style prefix inside each partition."""
    scramble = ((F.col(id_col) + F.lit(seed)) * F.lit(PACK_SCRAMBLE)) % F.lit(1 << 32)
    w = Window.partitionBy(key_col).orderBy(scramble.asc(), F.col(id_col).asc())
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k).drop("_rk"))
