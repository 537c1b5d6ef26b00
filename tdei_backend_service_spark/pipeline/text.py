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
    entries = [F.struct(
        F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in STOPWORDS[c]]))).alias("hits"),
        F.lit(c).alias("code")) for c in sorted(STOPWORDS)]
    arr = F.array(*entries)
    # argmax with ties going to the alphabetically-first language (the
    # entries array is built in sorted-code order and filter preserves it)
    best_hits = F.array_max(F.transform(arr, lambda s: s["hits"]))
    first_best = F.filter(arr, lambda s: s["hits"] == best_hits)[0]["code"]
    return df.withColumn(
        "lang_pred", F.when(best_hits > 0, first_best).otherwise(F.lit("und")))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``fingerprint``: md5 of the whitespace-normalized lowercased text —
    the exact-dedup key (portable: identical in any SQL engine)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fingerprint", F.md5(norm))


def with_winnow_fingerprint(df: DataFrame, text_col: str = "text",
                            k: int = 8, window: int = 4) -> DataFrame:
    """Winnowing document fingerprint (Schleimer et al.): rolling hash of
    char k-grams, min-hash per sliding window, xor-folded to one int64.
    Robust to small edits (unlike md5). Arrow-batched numpy; the rolling
    hash is computed with a vectorized polynomial over a char matrix."""

    @F.pandas_udf(T.LongType())
    def _winnow(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        B = np.uint64(1000003)
        for i, s in enumerate(texts):
            s = (s or "").lower()
            b = np.frombuffer(s.encode("utf-8", "ignore"), dtype=np.uint8).astype(np.uint64)
            if b.size < k:
                out[i] = np.int64(b.sum() + b.size)
                continue
            # polynomial rolling hash of every k-gram, vectorized:
            # h[j] = sum b[j+t] * B^(k-1-t)
            powers = B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
            n = b.size - k + 1
            idx = np.arange(n)[:, None] + np.arange(k)[None, :]
            h = (b[idx] * powers[None, :]).sum(axis=1)
            if h.size >= window:
                m = h.size - window + 1
                widx = np.arange(m)[:, None] + np.arange(window)[None, :]
                mins = h[widx].min(axis=1)
            else:
                mins = h.min(keepdims=True)
            sel = np.unique(mins)
            with np.errstate(over="ignore"):  # modular uint64 on purpose
                folded = sel * B + np.uint64(1)
            acc = np.bitwise_xor.reduce(folded) if folded.size else np.uint64(0)
            out[i] = np.int64(acc & np.uint64(0x7FFFFFFFFFFFFFFF))
        return pd.Series(out)

    return df.withColumn("winnow_fp", _winnow(F.col(text_col)))
