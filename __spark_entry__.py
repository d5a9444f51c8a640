"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship quality-filter query over the sf0.001
documents corpus (the transcript stand-in table); `queries()` /
`oracle_sql()` expose every implemented operator family from
SURVEY.md §2 — ALL entries have DuckDB oracle twins (the LSH/ANN family
derives its signatures from md5_number_upper-compatible hashes, see
go_pkg_spider_spark/oracle_sql_gen.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full text-leg quality-filter pipeline (lang rules ->
    model residual -> keep/drop -> scrub -> quality + ppl) over
    sf0.001/documents.parquet."""
    from go_pkg_spider_spark.functions import langid, perplexity, rules, scrub, tokens

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = d.withColumn("lang_res", langid.body_lang_rules(F.col("text")))
    df = langid.resolve_model_langs(df, "lang_res", "text")
    kd = rules.keep_drop(F.col("text"), F.col("lang_res")["lang"], min_chars=64)
    df = (
        df.withColumn("keep", kd["keep"])
        .withColumn("drop_reason", kd["drop_reason"])
        .withColumn(
            "scrubbed_text", F.when(F.col("keep"), scrub.scrub(F.col("text")))
        )
        .withColumn("ppl", perplexity.ppl_udf(F.when(F.col("keep"), F.col("text"))))
    )
    df = tokens.with_quality_score(df, "text")
    return df.select(
        "doc_id",
        "keep",
        "drop_reason",
        F.col("lang_res")["lang"].alias("lang"),
        F.col("lang_res")["lang_pos"].alias("lang_pos"),
        "scrubbed_text",
        "quality_score",
        "ppl",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from go_pkg_spider_spark.entry_queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from go_pkg_spider_spark.entry_queries import all_oracles

    return all_oracles()
