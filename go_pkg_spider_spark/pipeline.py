"""The end-to-end quality-filter pipeline (north_rule):

    clips(clip_id, bytes, sr_hz, dur_ms, codec, transcript)
      -> decode features (Arrow UDF, PCM dropped in-stage)
      -> charset stage (valid-utf8 fast path + codec normalization)
      -> language-ID cascade (cheap rules JVM-side; n-gram model UDF
         only on the unresolved residual)
      -> CEPF quality features + composite score
      -> keep/drop rule chain with drop_reason
      -> perplexity (UDF on kept rows only)
      -> PII scrub (frozen regex bank)

Output schema (SURVEY.md §1.2): clip_id, keep, drop_reason,
scrubbed_transcript, lang, lang_pos, ppl, quality_score (+ feature
structs for metrics).

Scale design: the whole per-clip path is ONE stage (narrow
transformations only — zero shuffles end to end). Partition count is
inherited from the source scan (Iceberg/parquet split planning);
`repartition_salted` is available for writers that need balanced output
files despite long-clip skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .functions import charset as cs
from .functions import langid, perplexity, quality, rules, scrub, tokens
from .operators import decode


def is_valid_utf8(transcript: Column) -> Column:
    """UTF-8 validity fast path (charset.go:43-47). Transcripts arrive as
    Spark strings (already unicode) — validity = successful round-trip
    through binary, i.e. non-null after try-encode. Kept as a column so
    byte-payload variants can swap in a real try-decode."""
    return transcript.isNotNull()


def with_charset(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "charset_res", cs.charset_of(F.col("codec"), is_valid_utf8(F.col("transcript")))
    )


def with_lang(df: DataFrame, title: Column | None = None) -> DataFrame:
    """Charset-map -> (title) -> body rules, then model-UDF residual.
    For clip payloads the 'charset' input is the canonical codec-derived
    charset: a GBK/SHIFT_JIS-declared source pins zh/ja exactly like the
    reference's CharsetLangMap short-circuit (lang.go:132-139)."""
    df = df.withColumn(
        "lang_res",
        langid.lang_cascade(
            F.col("transcript"),
            charset=F.col("charset_res")["charset"],
            title=title,
        ),
    )
    return langid.resolve_model_langs(df, "lang_res", "transcript")


def with_quality(df: DataFrame) -> DataFrame:
    return df.withColumn("qf", quality.quality_features(F.col("transcript"))).withColumn(
        "quality_score", tokens.quality_score(F.col("transcript"))
    )


def with_keep_drop(df: DataFrame, min_chars: int = 64) -> DataFrame:
    """Rule order (first failure wins, mirroring the reference's guard
    sequence): decode failure -> size/junk/licence/class rules."""
    kd = rules.keep_drop(F.col("transcript"), F.col("lang_res")["lang"], min_chars=min_chars)
    decode_reason = F.when(~F.col("audio")["ok"], F.concat(F.lit("decode_"), F.col("audio")["err"]))
    reason = F.coalesce(decode_reason, kd["drop_reason"])
    return (
        df.withColumn("drop_reason", reason)
        .withColumn("keep", reason.isNull())
        .withColumn("link_type", kd["link_type"])
    )


def with_scrub_and_ppl(df: DataFrame) -> DataFrame:
    """Scrub + perplexity only for kept rows (masked inputs keep the
    Arrow transfer proportional to kept rows; dropped rows carry NULLs)."""
    kept_t = F.when(F.col("keep"), F.col("transcript"))
    return df.withColumn("scrubbed_transcript", F.when(F.col("keep"), scrub.scrub(F.col("transcript")))).withColumn(
        "ppl", perplexity.ppl_udf(kept_t)
    )


OUTPUT_COLUMNS = [
    "clip_id",
    "keep",
    "drop_reason",
    "scrubbed_transcript",
    "lang",
    "lang_pos",
    "ppl",
    "quality_score",
]


def run_pipeline(clips: DataFrame, min_chars: int = 64, with_features: bool = False) -> DataFrame:
    df = decode.with_decode_features(clips)
    df = with_charset(df)
    df = with_lang(df)
    df = with_quality(df)
    df = with_keep_drop(df, min_chars=min_chars)
    df = with_scrub_and_ppl(df)
    df = df.withColumn("lang", F.col("lang_res")["lang"]).withColumn(
        "lang_pos", F.col("lang_res")["lang_pos"]
    )
    cols = list(OUTPUT_COLUMNS)
    if with_features:
        cols += ["qf", "audio", "link_type"]
    return df.select(*cols)


def repartition_salted(df: DataFrame, num_partitions: int, salt_buckets: int = 8) -> DataFrame:
    """Skew-safe repartition for writers: hash(clip_id) striped with a
    length-tier salt so long-transcript rows spread across buckets
    (SURVEY.md §4.1). Deterministic (no rand())."""
    salt = F.pmod(F.xxhash64(F.col("clip_id"), F.length(F.coalesce(F.col("transcript"), F.lit("")))), F.lit(salt_buckets))
    return df.repartition(num_partitions, F.pmod(F.hash("clip_id"), F.lit(num_partitions)), salt)
