"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All hot paths are pure ``pyspark.sql.functions`` (JVM, whole-stage
codegen) — each returns a DataFrame with added columns so stages
compose. Only the winnowing fingerprint needs Python, and it runs as an
Arrow-batched pandas UDF.

At 100 TB these are embarrassingly parallel map stages: no shuffle, full
column pruning (each reads only ``text``), so throughput is bounded by
scan + codegen speed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

# stopword sets for the n-gram/stopword language heuristic (tiny on
# purpose: broadcast as literal arrays, evaluated via array_intersect)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "que", "dans"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein", "mit", "den", "zu"],
}

# BPE-ish tokenization: words, numbers, or single non-space symbols
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words_col(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def word_ngrams(text: Column, n: int) -> Column:
    """Array of sliding word n-grams (space-joined) over the pinned
    whitespace split; empty array for texts shorter than n words.

    Built as a zip_with chain of n shifted slices (optimization r7):
    the former transform-over-sequence re-evaluated the split array
    inside the per-element lambda, making each document O(words^2)
    splits; the chain evaluates the split O(n) times per row and
    concat_ws associativity keeps every gram string identical. The
    short-document guard stays explicit (a slice length <= 0 would
    raise; when() branches evaluate lazily)."""
    n = int(n)
    words = words_col(text)
    m = F.size(words) - (n - 1)
    acc = F.slice(words, 1, m)
    for i in range(1, n):
        acc = F.zip_with(acc, F.slice(words, i + 1, m),
                         lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(words) >= n, acc) \
            .otherwise(F.array().cast("array<string>"))


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``n_tokens_ws`` (whitespace tokens) + ``n_tokens_bpe`` (regex
    word/number/symbol tokens, a BPE-ish proxy)."""
    t = F.col(text_col)
    return (df.withColumn("n_tokens_ws", F.size(words_col(t)))
              .withColumn("n_tokens_bpe",
                          F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), 0))))


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: length, punctuation/digit/space ratios, mean
    word length, English stopword ratio, and a composite ``quality_score``
    in [0, 1] (webtext-filtering style: penalize very short docs, symbol
    soup, and stopword-free token streams)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    words = words_col(t)
    n_words = F.size(words)
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(words), sw))
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_words = F.greatest(n_words, F.lit(1)).cast("double")
    out = (df.withColumn("n_chars_m", n_chars)
             .withColumn("punct_ratio", n_punct / safe_chars)
             .withColumn("digit_ratio", n_digit / safe_chars)
             .withColumn("mean_word_len",
                         (F.length(F.regexp_replace(t, r"\s+", "")) / safe_words))
             .withColumn("stopword_hits", n_stop))
    length_term = F.least(F.col("n_chars_m") / F.lit(200.0), F.lit(1.0))
    punct_term = F.greatest(F.lit(0.0), F.lit(1.0) - F.col("punct_ratio") * 4)
    digit_term = F.greatest(F.lit(0.0), F.lit(1.0) - F.col("digit_ratio") * 4)
    stop_term = F.least(F.col("stopword_hits").cast("double") / 3.0, F.lit(1.0))
    return out.withColumn(
        "quality_score",
        F.round(length_term * 0.3 + punct_term * 0.25 + digit_term * 0.25
                + stop_term * 0.2, 6))


def with_langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language ID: per language, count distinct
    stopwords present; argmax wins (ties broken by language-code order);
    no hit at all -> 'und'. Pure Catalyst via array_intersect."""
    words = F.array_distinct(words_col(F.col(text_col)))
    codes = sorted(STOPWORDS)
    hits = {c: F.size(F.array_intersect(
        words, F.array(*[F.lit(w) for w in STOPWORDS[c]]))) for c in codes}
    # argmax with ties going to the alphabetically-first language: a
    # flat greatest + first-match CASE (same result as the former
    # array-of-structs filter, but plain codegen-friendly columns
    # instead of nested higher-order functions)
    best_hits = F.greatest(*[hits[c] for c in codes])
    first_best = F.coalesce(
        *[F.when(hits[c] == best_hits, F.lit(c)) for c in codes])
    return df.withColumn(
        "lang_pred", F.when(best_hits > 0, first_best).otherwise(F.lit("und")))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``fingerprint``: md5 of the whitespace-normalized lowercased text —
    the exact-dedup key (portable: identical in any SQL engine)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fingerprint", F.md5(norm))


def with_winnow_fingerprint(df: DataFrame, text_col: str = "text",
                            k: int = 8, window: int = 4) -> DataFrame:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03):
    hash every char k-gram, take the min hash per sliding window of
    ``window`` hashes, xor-fold the distinct window minima to one int64.

    Entirely JVM-side Catalyst expressions (transform/slice/array_min/
    aggregate) — no Python in the row path, so the whole column stays in
    whole-stage codegen — and every step has an exact DuckDB equivalent,
    so the contract query is hash-checked against a SQL oracle
    (__spark_entry__.oracle_sql()['winnow_fingerprint']).

    The gram hash is the first 14 hex chars (56 bits) of md5, which both
    engines compute identically over UTF-8; text is lowercased and
    stripped to printable ASCII first so character indexing agrees
    across engines. Texts shorter than ``k`` fall back to the hash of
    the whole normalized text.

    Plan shape matters here: naively nesting ``transform`` lambdas makes
    Catalyst inline the grams array into every window lambda (quadratic:
    each of n windows recomputes all n md5 grams). Two tricks keep it
    O(n log w) and map-only:

    * ``_let`` — a 1-element ``transform`` is an expression-level let:
      HigherOrderFunction evaluates its input array once, so every
      reference to the lambda variable reuses the materialized value
      instead of re-inlining the expression;
    * the sliding-window min is binary doubling (``zip_with`` of the
      array against its own shift: covered window 1 -> 2 -> 4 -> ... ->
      w), not a per-index ``slice``+``array_min``.
    Measured: 482 s -> ~2 s for 500 docs at sf0.01."""

    def _let(value, body):
        return F.element_at(F.transform(F.array(value), body), 1)

    def gram_hash(s):
        return F.conv(F.substring(F.md5(s), 1, 14), 16, 10).cast("long")

    def _winmin(arr, w):
        # min over sliding windows of w: repeatedly zip the array with
        # its own shift (F.least skips the nulls zip_with pads with, so
        # truncated tail windows take the min of what's available —
        # those slots are discarded by the slice below anyway)
        def _round(cur, s):
            # NB: the lambda must take exactly one arg — pyspark treats a
            # second parameter (even defaulted) as the (element, index)
            # form, which would bind it to the array index
            def body(g):
                return F.zip_with(g, F.slice(g, s + 1, F.size(g)),
                                  lambda a, b: F.least(a, b))
            return _let(cur, body)
        covered = 1
        while covered * 2 <= w:
            arr = _round(arr, covered)
            covered *= 2
        if covered < w:
            arr = _round(arr, w - covered)
        return arr

    def _fp(t):
        n_grams = F.length(t) - F.lit(k - 1)
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
            lambda j: gram_hash(F.substr(t, j, F.lit(k))))
        n_wins = F.greatest(n_grams - F.lit(window - 1), F.lit(1))
        mins = F.slice(_winmin(grams, window), 1, n_wins)
        folded = F.aggregate(F.array_distinct(mins), F.lit(0).cast("long"),
                             lambda acc, x: acc.bitwiseXOR(x))
        return F.when(F.length(t) >= k, folded).otherwise(gram_hash(t))

    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^\x20-\x7e]", "")
    return df.withColumn("winnow_fp", _let(norm, _fp))


def ngram_counts(df: DataFrame, n: int = 2, top_k: int | None = None,
                 text_col: str = "text") -> DataFrame:
    """Corpus n-gram statistics — the classic distributed LM-data job:
    whitespace words (same split the token counters pin), sliding
    word-n-grams per document, global counts, optionally the top_k most
    frequent (count desc, n-gram asc — a deterministic tie-break).

    Pure Catalyst: the n-gram build is transform-over-sequence (no
    Python), the count is one partial-aggregated exchange on the n-gram
    key, and top-k is a TakeOrderedAndProject — no full sort. Documents
    shorter than n contribute nothing."""
    grams = word_ngrams(F.col(text_col), n)
    out = (df.select(F.explode(grams).alias("ngram"))
           .groupBy("ngram").agg(F.count(F.lit(1)).alias("n")))
    if top_k is not None:
        out = out.orderBy(F.desc("n"), F.asc("ngram")).limit(int(top_k))
    return out


def corpus_report(df: DataFrame, key_col: str = "source",
                  text_col: str = "text") -> DataFrame:
    """Per-``key_col`` corpus data card in ONE pass — the summary every
    training-data pipeline publishes next to a shipped corpus: document
    count, exact whitespace-token totals and extremes, a fixed-point
    quality total (sum of quality_score in millionths, so the float
    never enters the comparison), and the language mix as one column
    per known language plus ``n_und``.

    Every metric is an exact integer, so the report is reproducible
    bit-for-bit across engines and re-runs. Plan shape: the per-doc
    token/quality/langid expressions are pure Catalyst map stages fused
    into the scan (no Python), then ONE partial-aggregated exchange on
    ``key_col`` — at 10^12 documents the shuffle carries only
    n_sources * n_partitions partial rows."""
    scored = with_langid(with_quality(with_token_counts(df, text_col),
                                      text_col), text_col)
    langs = sorted(STOPWORDS) + ["und"]
    return scored.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_tokens_ws").cast("long")).alias("total_tokens_ws"),
        F.min(F.col("n_tokens_ws").cast("long")).alias("min_tokens_ws"),
        F.max(F.col("n_tokens_ws").cast("long")).alias("max_tokens_ws"),
        F.sum(F.round(F.col("quality_score") * 1_000_000).cast("long"))
         .alias("quality_micros"),
        *[F.sum(F.when(F.col("lang_pred") == c, 1).otherwise(0)).cast("long")
           .alias(f"n_{c}") for c in langs])


def _int_idf(n_docs: int) -> Column:
    """The shared integer inverse-document-frequency law of both
    retrieval scorers: (N * 1_000_000) DIV df — integer DIV, not
    float-divide-then-cast, so a rounding ulp at an integer boundary
    can never desynchronize the engines."""
    return F.expr(f"CAST(CAST({int(n_docs)} AS BIGINT) * 1000000 "
                  "DIV df AS BIGINT)").alias("idf")


def _topk_by_score(scored: DataFrame, id_col: str, k: int) -> DataFrame:
    """Shared retrieval cut: top-k by (score desc, id asc) — the id
    tie-break makes the LIMIT boundary deterministic in any engine —
    compiled to a TakeOrderedAndProject, never a full sort."""
    return (scored.orderBy(F.desc("score"), F.asc(id_col)).limit(int(k))
            .select(F.col(id_col), F.col("score").cast("long")))


def tfidf_topk(df: DataFrame, query_terms: list[str], k: int = 20,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keyword retrieval: the top-``k`` documents for a bag of query
    terms under rational TF-IDF — score = sum over query terms of
    tf(term, doc) * ((N * 1_000_000) // df(term)), where N is the
    corpus size and df the term's document frequency. The integer
    inverse-frequency weight is order-isomorphic to 1/df (log-free on
    purpose: any engine replays it bit-exactly, and with single-term
    weights the log vs reciprocal choice only rescales, it cannot
    reorder documents sharing a term profile). Ties break on id, so
    the LIMIT cut is deterministic. Only matching documents rank.

    Scale shape: tokens explode map-side (the whitespace split every
    text op pins) and filter to the broadcast-tiny query vocabulary
    BEFORE any exchange — the (id, term) partial-aggregated tf relation
    carries only matching rows; df folds from tf with a second tiny
    aggregate; the final top-k is a TakeOrderedAndProject, never a full
    sort. At 10^12 documents the shuffled bytes are proportional to
    query-term occurrences, not corpus size."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    n_docs = df.count()
    # tf is bounded by query-term occurrences; checkpointing it stops
    # the df-fold below from re-deriving it with a second corpus scan
    tf = (df.select(F.col(id_col),
                    F.explode(words_col(F.col(text_col))).alias("term"))
          .filter(F.col("term").isin(terms))
          .groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
          .localCheckpoint())
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.select("term", _int_idf(n_docs))
    scored = (tf.join(F.broadcast(idf), "term")
              .groupBy(id_col)
              .agg(F.sum(F.col("tf") * F.col("idf")).alias("score")))
    return _topk_by_score(scored, id_col, k)


def bm25_topk(df: DataFrame, query_terms: list[str], k: int = 20,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keyword retrieval under rational BM25: top-``k`` documents with

        score = SUM over query terms of
                idf(t) * ((44*S*tf * 100000) DIV
                          (20*S*tf + 6*S + 18*dl*N))

    which is EXACTLY the BM25 term-saturation law
    ``tf*(k1+1) / (tf + k1*(1-b + b*dl/avgdl))`` for k1 = 6/5 and
    b = 3/4 with every denominator cleared: avgdl = S/N (S = corpus
    token count, N = corpus size, dl = document length), so
    multiplying through by k1d*bd*S = 20*S turns the saturation
    fraction into one integer division — scaled by 1e5 and floored,
    then weighted by the same order-isomorphic integer idf as
    tfidf_topk ((N*1e6) DIV df). No float touches the score, so any
    engine replays the ranking bit-exactly. Int64 envelope:
    44*S*tf*1e5 must stay under 2^63 — S*tf < 2.1e12, i.e. corpora to
    ~10^10 tokens with tf <= 200; beyond that drop the 1e5 scale a
    decade (the ranking is scale-invariant). Ties break on id.

    Scale shape: identical to tfidf_topk — dl computes map-side from
    the split array BEFORE the explode, tokens filter to the
    broadcast-tiny query vocabulary before the first exchange, (N, S)
    are one tiny global aggregate, and the cut is a
    TakeOrderedAndProject. Shuffled bytes stay proportional to
    query-term occurrences, not corpus size.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    toks = df.select(F.col(id_col), words_col(F.col(text_col)).alias("_w"))
    n_docs, s_tokens = toks.agg(
        F.count(F.lit(1)), F.sum(F.size("_w"))).first()
    n_docs, s_tokens = int(n_docs), int(s_tokens or 0)
    if s_tokens == 0:
        raise ValueError("corpus has no tokens")
    # bounded by query-term occurrences; checkpoint so the df-fold
    # does not re-derive it with a second corpus scan
    tf = (toks.select(F.col(id_col), F.size("_w").alias("dl"),
                      F.explode("_w").alias("term"))
          .filter(F.col("term").isin(terms))
          .groupBy(id_col, "term")
          .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
          .localCheckpoint())
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.select("term", _int_idf(n_docs))
    norm = F.expr(
        f"(CAST({44 * s_tokens} AS BIGINT) * tf * 100000) DIV "
        f"(CAST({20 * s_tokens} AS BIGINT) * tf"
        f" + CAST({6 * s_tokens} AS BIGINT)"
        f" + CAST({18 * n_docs} AS BIGINT) * dl)")
    scored = (tf.join(F.broadcast(idf), "term")
              .groupBy(id_col)
              .agg(F.sum(F.col("idf") * norm).alias("score")))
    return _topk_by_score(scored, id_col, k)


def build_postings(df: DataFrame, min_df: int = 1,
                   max_df: int | None = None,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Inverted-index construction: one row per vocabulary term with
    its document frequency and the full posting list — doc ids sorted
    ascending and comma-joined into a string (a string, not an array,
    so the oracle comparison is a plain value equality in any
    engine). ``min_df``/``max_df`` implement the standard vocabulary
    pruning band (drop hapaxes / stop-terms before they bloat the
    index).

    Scale shape: terms deduplicate WITHIN each document map-side
    (array_distinct before the explode), so the exchange carries one
    (term, doc) row per posting — exactly the index size. One
    partial-aggregated groupBy builds df and the posting list
    together. At 10^12 documents a single term's posting list no
    longer fits one row — shard the groupBy key to (term,
    id DIV 2^20) and keep per-shard rows; the band filter still
    applies to the global df (one extra tiny aggregate). The in-row
    string here is the fixture-scale layout.
    """
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(words_col(F.col(text_col))))
        .alias("term"))
    g = (toks.groupBy("term")
         .agg(F.count(F.lit(1)).alias("df"),
              F.concat_ws(",", F.transform(
                  F.sort_array(F.collect_list(F.col(id_col))),
                  lambda x: x.cast("string"))).alias("postings")))
    out = g.filter(F.col("df") >= min_df)
    if max_df is not None:
        out = out.filter(F.col("df") <= max_df)
    return out.select("term", F.col("df").cast("long"), "postings")


def cooccur_pmi(df: DataFrame, window: int = 2, k: int = 50,
                min_count: int = 2, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Windowed co-occurrence statistics with an integer PMI-style
    score — the word2vec/GloVe-shaped corpus preprocessing pass: for
    every ordered token pair (u at position i, v at position i+j,
    1 <= j <= window, same document) count occurrences c_uv, then
    score each pair

        pmi_scaled = (c_uv * T * 1_000_000) DIV (c_u * c_v)

    where c_u/c_v are corpus token-occurrence counts and T the corpus
    token total — the integer-rational analogue of pointwise mutual
    information p(u,v)/(p(u)p(v)) (log-free on purpose: monotone in
    the true PMI for fixed marginals and bit-exact in any engine).
    Top-``k`` pairs by (score desc, u, v); pairs below ``min_count``
    drop first. Int64 envelope: c_uv * T * 1e6 < 2^63 — fine to
    ~10^8-token corpora with c_uv <= 10^4; shrink the 1e6 scale for
    more.

    Scale shape: pairs are generated MAP-SIDE as a nested
    transform-over-sequence on the split array (the word_ngrams
    trick) — no positional self-join, no shuffle until the (u, v)
    partial-aggregated count; unigram counts fold from one explode of
    the same array; the cut is a TakeOrderedAndProject.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    w = words_col(F.col(text_col))
    toks = df.select(w.alias("_w"))
    # one corpus pass builds the (tiny) vocabulary relation; the token
    # total folds out of it, and localCheckpoint stops the two join
    # sides below from re-deriving it with two more corpus scans
    uni = (toks.select(F.explode("_w").alias("u"))
           .groupBy("u").agg(F.count(F.lit(1)).alias("cu"))
           .localCheckpoint())
    t_total = int(uni.agg(F.sum("cu")).first()[0] or 0)
    if t_total == 0:
        raise ValueError("corpus has no tokens")
    starts = F.when(F.size("_w") >= 2,
                    F.sequence(F.lit(1), F.size("_w") - 1)) \
              .otherwise(F.array().cast("array<int>"))
    pair_arrays = F.flatten(F.transform(
        starts,
        lambda i: F.transform(
            F.sequence(i + 1, F.least(i + window,
                                      F.size("_w").cast("int"))),
            lambda j: F.struct(F.element_at("_w", i).alias("u"),
                               F.element_at("_w", j).alias("v")))))
    pairs = (toks.select(F.explode(pair_arrays).alias("p"))
             .select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
             .groupBy("u", "v").agg(F.count(F.lit(1)).alias("c_uv"))
             .filter(F.col("c_uv") >= min_count))
    scored = (pairs
              .join(F.broadcast(uni), "u")
              .join(F.broadcast(uni.select(F.col("u").alias("v"),
                                           F.col("cu").alias("cv"))),
                    "v")
              .select("u", "v", F.col("c_uv").cast("long"),
                      F.expr(f"CAST(c_uv * {t_total} * 1000000 "
                             "DIV (cu * cv) AS BIGINT)")
                      .alias("pmi_scaled")))
    return (scored.orderBy(F.desc("pmi_scaled"), F.asc("u"), F.asc("v"))
            .limit(int(k)))
