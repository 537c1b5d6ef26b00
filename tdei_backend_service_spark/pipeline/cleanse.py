"""Corpus-cleansing operators a training-data pipeline runs before
training: eval-set DECONTAMINATION (drop training documents that share
word n-grams with a benchmark/eval corpus — the GPT-3-appendix-style
n-gram overlap rule) and BOILERPLATE LINE REMOVAL (drop lines that
recur across many documents — the CCNet/Gopher line-dedup rule).

Scale shape (both are designed so the 100 TB corpus never shuffles
wholesale):

* decontamination — an eval set is small by definition (benchmarks are
  MBs while the corpus is TBs), so its distinct n-gram relation is
  BROADCAST. The corpus side is a map-only n-gram explode feeding that
  broadcast hash join; only the MATCHING (doc, gram) pairs reach the
  partial-aggregated exchange on doc_id, and the resulting
  contaminated-id relation (small again) broadcast-anti-joins back onto
  the corpus.
* line dedup — lines shuffle as narrow md5 keys with map-side partial
  aggregation to build the line-frequency relation; only the heavy
  hitters (doc frequency > max_doc_freq) survive the HAVING cut, so the
  frequent-line relation broadcasts and the per-line kill test is
  map-side. The one corpus-wide exchange is the regroup on doc_id that
  reassembles cleaned text.

Both operators are pure Catalyst (no Python in the row path) and every
step has an exact DuckDB equivalent, so both carry full SQL oracles
(__spark_entry__.oracle_sql()['decontam_hits' / 'decontam_survivors' /
'line_dedup']).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import word_ngrams


def eval_ngram_set(eval_df: DataFrame, n: int = 3,
                   text_col: str = "text") -> DataFrame:
    """Distinct word n-grams of the eval corpus — the contamination
    probe set. One narrow column; small enough to broadcast whenever
    the eval set is an actual benchmark."""
    return (eval_df
            .select(F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
            .distinct())


def contamination_hits(df: DataFrame, eval_df: DataFrame, n: int = 3,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per-document contamination evidence: (id_col, n_hits) where
    n_hits counts the document's DISTINCT word n-grams that also occur
    anywhere in ``eval_df``. Documents with zero hits are absent.

    Plan: corpus-side explode of the per-doc distinct gram array ->
    broadcast inner join against the eval gram set -> partial-aggregated
    count per doc. Only matched pairs cross the exchange."""
    ev = eval_ngram_set(eval_df, n, text_col)
    doc_grams = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n)))
        .alias("gram"))
    return (doc_grams.join(F.broadcast(ev), "gram")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_hits")))


def decontaminate(df: DataFrame, eval_df: DataFrame, n: int = 3,
                  min_hits: int = 1, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Remove documents contaminated by the eval set: any document with
    at least ``min_hits`` distinct n-gram hits is dropped; survivors
    pass through with all columns intact.

    The contaminated-id relation is tiny relative to the corpus, so the
    LEFT ANTI join broadcasts under AQE — the corpus itself never
    shuffles."""
    bad = (contamination_hits(df, eval_df, n, id_col, text_col)
           .filter(F.col("n_hits") >= int(min_hits))
           .select(id_col))
    return df.join(bad, id_col, "left_anti")


def frequent_lines(df: DataFrame, max_doc_freq: int, sep: str = "\n",
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Boilerplate detector: (line_md5, n_docs) for every line whose
    document frequency exceeds ``max_doc_freq``. Lines shuffle as md5
    keys only (never the line text); the partial-distinct aggregation
    collapses a doc's repeats map-side. The output is heavy-hitters
    only, hence broadcastable."""
    lines = (df.select(F.col(id_col),
                       F.explode(F.split(F.col(text_col), sep))
                       .alias("_line"))
             .select(id_col, F.md5(F.col("_line")).alias("_h")))
    return (lines.groupBy("_h")
            .agg(F.countDistinct(id_col).alias("n_docs"))
            .filter(F.col("n_docs") > int(max_doc_freq)))


def dedup_lines(df: DataFrame, max_doc_freq: int, sep: str = "\n",
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """CCNet/Gopher-style boilerplate removal: delete every line that
    occurs in more than ``max_doc_freq`` documents, reassemble the
    surviving lines in original order, and report per-doc counts.

    Returns one row per input document: (id_col, text_col = cleaned
    text, n_lines_kept, n_lines_removed). A document whose every line
    is boilerplate survives with empty text (callers chain a length
    filter if they want it gone) — silently dropping rows here would
    make removal unaccountable.

    Order is reconstructed from the exploded position via
    array_sort-of-structs (collect_list order is not deterministic
    across retries; the sort is). The frequent-line relation is
    explicitly broadcast, so the kill test never shuffles the corpus —
    the only wide exchange over all lines is the doc_id regroup."""
    freq = (frequent_lines(df, max_doc_freq, sep, id_col, text_col)
            .select("_h", F.lit(True).alias("_bad")))
    lines = (df.select(F.col(id_col),
                       F.posexplode(F.split(F.col(text_col), sep))
                       .alias("_pos", "_line"))
             .withColumn("_h", F.md5(F.col("_line"))))
    marked = lines.join(F.broadcast(freq), "_h", "left")
    kept_struct = F.when(F.col("_bad").isNull(),
                         F.struct(F.col("_pos"), F.col("_line")))
    return (marked.groupBy(id_col)
            .agg(F.array_join(
                     F.transform(F.array_sort(F.collect_list(kept_struct)),
                                 lambda s: s["_line"]), sep)
                 .alias(text_col),
                 F.count(kept_struct).alias("n_lines_kept"),
                 F.count(F.when(F.col("_bad"), F.lit(1)))
                 .alias("n_lines_removed")))


# PII-redaction patterns: deliberately the COMMON subset of Java-regex
# (Spark) and RE2 (DuckDB, Go scanners) syntax — no backrefs, no
# lookaround — so the redaction rule is portable and oracle-checkable.
EMAIL_RE = r"[a-z0-9._%-]+@[a-z0-9.-]+\.[a-z][a-z]+"
PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


def redact_pii(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               email_token: str = "<EMAIL>",
               phone_token: str = "<PHONE>") -> DataFrame:
    """Scrub emails and phone numbers from the corpus, keeping per-doc
    counts — the standard pre-training PII pass. Emails are replaced
    first so a phone-shaped digit run inside an address cannot double
    count. Map-only (two regexp_replace + two regexp_extract_all in
    whole-stage codegen): zero shuffle at any scale."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0))
    after_email = F.regexp_replace(t, EMAIL_RE, email_token)
    n_phones = F.size(F.regexp_extract_all(after_email, F.lit(PHONE_RE), 0))
    cleaned = F.regexp_replace(after_email, PHONE_RE, phone_token)
    return df.select(
        F.col(id_col), cleaned.alias(text_col),
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"))
