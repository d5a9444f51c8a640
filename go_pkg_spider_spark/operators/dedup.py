"""Deduplication operators for training-data pipelines — all Spark-first.

- exact_dedup: hash-groupBy on normalized content (the `seen`-map analog
  made distributed, /root/reference/spider_news.go:15 ≙ J6).
- ngram_jaccard_pairs: word n-gram shingles + array_intersect/union
  Jaccard over bounded candidate groups (no UDF).
- minhash_lsh: shingle -> k minhashes via xxhash64(shingle, seed_k) ->
  band buckets -> self-join candidates. Pure built-ins; the classic
  MinHash/LSH construction (Broder 1997; MMDS ch.3).
- simhash64: 64-bit SimHash (Charikar 2002) via bit-position vote
  columns over token hashes — JVM-side only.

Scale notes: minhash/simhash signatures are tiny (k longs / 1 long) so
the only shuffle is the band-bucket groupBy/self-join, which AQE
skew-splits; candidate verification happens after the LSH filter, never
all-pairs. `ngram_jaccard_pairs` all-pairs form is for WITHIN-GROUP use
(bounded group size) — at 10^12 rows use minhash_lsh first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.tokens import content_hash_md5


def normalized_text(col: Column) -> Column:
    return F.lower(F.trim(F.regexp_replace(F.coalesce(col, F.lit("")), r"\s+", " ")))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the smallest id per identical normalized text; emit the kept
    id, the content hash, and the duplicate count. Map-side partial agg
    (min/count) makes the shuffle carry one row per distinct hash."""
    h = content_hash_md5(F.col(text_col)).alias("content_md5")
    return (
        df.select(h, F.col(id_col))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("kept_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string> (built-ins only:
    split -> sliding join via transform+slice -> array_distinct)."""
    words = F.filter(F.split(normalized_text(text), " "), lambda w: w != "")
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(1), k)
    grams = F.when(
        k > 0,
        F.transform(idx, lambda i: F.array_join(F.slice(words, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    threshold: float = 0.8,
    n: int = 3,
) -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard within a candidate group
    (e.g. same source/site). Self-join is equi on the group key so it
    shuffles once on group_col; the id<id predicate halves the pairs."""
    s = df.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), n).alias("sh"),
    )
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.g").alias(group_col),
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(jaccard(F.col("a.sh"), F.col("b.sh")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """k minhash values: min over xxhash64(shingle, seed_k). Empty
    shingle set -> NULL signature (dropped from LSH)."""
    sigs = [
        F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(k))))
        for k in range(num_hashes)
    ]
    return F.when(F.size(shingles) > 0, F.array(*sigs))


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidate pairs: signature split into `bands` bands of
    num_hashes/bands rows; same band-hash -> candidate. Returns pairs
    with their exact Jaccard (verified on the shingle sets) so callers
    threshold as needed.

    Shuffle profile at scale: one explode (rows x bands), one groupBy
    on (band_idx, band_hash) — band hashes are near-uniform so no skew;
    candidate verification joins back on id through a broadcast-able
    distinct-candidate set when the dup rate is low."""
    rows_per_band = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_n).alias("sh"),
    ).withColumn("sig", minhash_signature(F.col("sh"), num_hashes)).filter(
        F.col("sig").isNotNull()
    )
    banded = base.select(
        "id",
        "sh",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                        ",",
                    )
                ),
            )
        ).alias("band_idx", "band_hash"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(jaccard(F.col("a.sh"), F.col("b.sh")), 6).alias("jaccard"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs


def simhash64(text: Column) -> Column:
    """64-bit SimHash of the token multiset: per-bit majority vote over
    xxhash64(token). Bit i of the result = 1 iff sum over tokens of
    (bit_i(h) ? +1 : -1) > 0. Pure column math (64 bit-lanes via one
    aggregate over a bit-count array)."""
    tokens = F.filter(F.split(normalized_text(text), " "), lambda w: w != "")
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    # votes[i] = count of tokens with bit i set (64 static bit lanes;
    # shift amounts must be Python ints for shiftright)
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.shiftright(h, i).bitwiseAND(F.lit(1)).cast("int")
                    for i in range(64)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    n = F.size(tokens)
    out = F.lit(0).cast("long")
    for i in range(64):
        bit_val = (1 << i) if i < 63 else -(1 << 63)  # sign bit wraps
        out = out.bitwiseOR(
            F.when(
                F.element_at(votes, i + 1) * 2 > n, F.lit(bit_val).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        )
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_neardup_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs via 4-block bucketing (pigeonhole: any
    pair within hamming<=3 shares at least one exact 16-bit block).
    Shuffles once on (block_idx, block_value)."""
    base = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sh"))
    blocked = base.select(
        "id",
        "sh",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda i: F.shiftright(F.col("sh"), i * 16).bitwiseAND(F.lit(0xFFFF)),
            )
        ).alias("blk_idx", "blk"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk_idx") == F.col("b.blk_idx"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.sh"), F.col("b.sh")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
