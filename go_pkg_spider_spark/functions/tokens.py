"""Token counting, document fingerprinting, and text-quality stats —
the text-analysis layer a training-data pipeline needs, all as built-in
column expressions (JVM-side, codegen).

Shapes follow the reference's rune-count idiom
(utf8.RuneCountInString, e.g. /root/reference/lang.go:290) and its
regex-count statistics (lang.go:296-334).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .textnorm import ASCII_ALPHA, JAVA_HAN, JAVA_PUNCT_SYM, char_count

# BPE-ish pretokenizer: word pieces, numbers, or single non-space symbols
# (GPT-2 pretokenizer shape, public knowledge).
BPE_ISH_RE = r"[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]"

EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "be", "this", "that",
)


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.filter(F.split(F.trim(F.coalesce(text, F.lit(""))), r"\s+"), lambda w: w != ""))


def bpe_ish_token_count(text: Column) -> Column:
    """Upper-bound token estimate via a BPE-style pretokenizer regex."""
    return F.regexp_count(F.coalesce(text, F.lit("")), F.lit(BPE_ISH_RE))


def stopword_ratio(text: Column) -> Column:
    words = F.filter(
        F.split(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"\s+"), lambda w: w != ""
    )
    n = F.size(words)
    stops = F.size(F.filter(words, lambda w: w.isin(*EN_STOPWORDS)))
    return F.when(n > 0, F.round(stops / n, 6)).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    t = F.coalesce(text, F.lit(""))
    n = F.length(t)
    return F.when(n > 0, F.round(char_count(t, JAVA_PUNCT_SYM) / n, 6)).otherwise(F.lit(0.0))


def alpha_ratio(text: Column) -> Column:
    t = F.coalesce(text, F.lit(""))
    n = F.length(t)
    return F.when(n > 0, F.round(char_count(t, ASCII_ALPHA) / n, 6)).otherwise(F.lit(0.0))


def han_ratio(text: Column) -> Column:
    t = F.coalesce(text, F.lit(""))
    n = F.length(t)
    return F.when(n > 0, F.round(char_count(t, JAVA_HAN) / n, 6)).otherwise(F.lit(0.0))


def words_array(text: Column) -> Column:
    """The shared whitespace word array (hoist target: an alias of this
    in its own projection is computed once per row even when the score
    expression references it several times — CollapseProject keeps
    non-cheap multi-referenced aliases in their own Project)."""
    return F.filter(
        F.split(F.trim(F.coalesce(text, F.lit(""))), r"\s+"), lambda w: w != ""
    )


def mean_word_length_from_words(words: Column) -> Column:
    n = F.size(words)
    total = F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
    return F.when(n > 0, F.round(total / n, 6)).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    return mean_word_length_from_words(words_array(text))


def quality_score_from_words(text: Column, words: Column) -> Column:
    """quality_score with the word array injected (see with_quality_score
    for the hoisted two-projection form)."""
    t = F.coalesce(text, F.lit(""))
    n = F.length(t)
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 4.0)
    wl = mean_word_length_from_words(words)
    wl_score = F.when((wl >= 3.0) & (wl <= 10.0), 1.0).otherwise(0.5)
    return F.round(len_score * 0.4 + punct_penalty * 0.4 + wl_score * 0.2, 6)


def quality_score(text: Column) -> Column:
    """Composite heuristic quality score in [0,1]: rewards moderate
    length, low punctuation/symbol share, moderate word length — the
    C4/Gopher-style rule family re-expressed as one column expression.
    Prefer with_quality_score on DataFrames (hoists the word array)."""
    return quality_score_from_words(text, words_array(text))


def with_quality_score(df, text_col: str, out_col: str = "quality_score"):
    """Adds the quality score with the word array AND its length-sum
    hoisted into single-eval projections (the inline form re-derived the
    split/filter array ~6x and the aggregate 2x in the plan)."""
    w, tot = "_qs_words", "_qs_total"
    words, total = F.col(w), F.col(tot)
    n = F.size(words)
    wl = F.when(n > 0, F.round(total / n, 6)).otherwise(F.lit(0.0))
    wl_score = F.when((wl >= 3.0) & (wl <= 10.0), 1.0).otherwise(0.5)
    t = F.coalesce(F.col(text_col), F.lit(""))
    len_score = F.least(F.length(t) / F.lit(500.0), F.lit(1.0))
    punct_penalty = F.greatest(
        F.lit(0.0), F.lit(1.0) - punct_ratio(F.col(text_col)) * 4.0
    )
    score = F.round(len_score * 0.4 + punct_penalty * 0.4 + wl_score * 0.2, 6)
    return (
        df.withColumn(w, words_array(F.col(text_col)))
        .withColumn(tot, F.aggregate(words, F.lit(0), lambda a, x: a + F.length(x)))
        .withColumn(out_col, score)
        .drop(w, tot)
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: 64-bit xxhash of the
    whitespace-normalized, lowercased text. Exact-dedup key."""
    norm = F.lower(F.trim(F.regexp_replace(F.coalesce(text, F.lit("")), r"\s+", " ")))
    return F.xxhash64(norm)


def content_hash_md5(text: Column) -> Column:
    """MD5 content hash of the same normalization — portable to the
    DuckDB oracle (md5 exists in both engines)."""
    norm = F.lower(F.trim(F.regexp_replace(F.coalesce(text, F.lit("")), r"\s+", " ")))
    return F.md5(norm)


def md5_u64_le(col: Column) -> Column:
    """First 8 md5-digest bytes as an unsigned little-endian integer —
    a PURE-COLUMN twin of DuckDB's md5_number_upper() (and of
    dedup._hash64_bytes), so hash-routed decisions (deterministic
    sampling, hash partitioning, dedup keys) replay exactly in the
    oracle. Returns decimal(20,0) (values exceed signed int64)."""
    h = F.md5(F.encode(col.cast("string"), "UTF-8"))
    le_hex = F.concat(*[F.substring(h, 15 - 2 * i, 2) for i in range(8)])
    return F.conv(le_hex, 16, 10).cast("decimal(20,0)")
