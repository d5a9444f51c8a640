"""Round-9 micro-experiments (guide §1): decompose the per-row cost of
the hot JVM-regex entries (scrub_docs, lang_rules_docs) pattern by
pattern, at a chosen SF, using the noop sink. Not part of the bench
contract — iteration evidence only.

Usage: python tools/r09_experiments.py [sf_dir] [exp1,exp2,...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, df, n=2):
    best = None
    for _ in range(n):
        spark.sparkContext.setJobDescription(label)
        t0 = time.monotonic()
        _noop(df)
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.3f}s", flush=True)
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    which = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else {"scrub", "lang"}
    from go_pkg_spider_spark.session import get_spark
    from go_pkg_spider_spark.functions import scrub as scrub_mod
    from go_pkg_spider_spark.functions import langid, textnorm

    spark = get_spark(
        app_name="r09_experiments",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        extra_conf={"spark.sql.files.maxPartitionBytes": "32m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # same spread guard as entry queries
    from go_pkg_spider_spark import entry_queries as eq

    d = eq._spread_small_scan(d, spark)

    # baseline: scan + noop only
    timed(spark, "scan_only", d.select("doc_id", "text"))

    if "scrub" in which:
        # full chain as shipped
        timed(spark, "scrub_full", d.select("doc_id", scrub_mod.scrub(F.col("text")).alias("s")))
        # each pattern alone
        for name, pat, repl in scrub_mod.SCRUB_BANK:
            timed(
                spark,
                f"scrub_one:{name}",
                d.select("doc_id", F.regexp_replace(F.col("text"), pat, repl).alias("s")),
                n=1,
            )

    if "lang" in which:
        timed(
            spark,
            "lang_full",
            d.select("doc_id", langid.body_lang_rules(F.col("text"))["lang"].alias("l")),
        )
        clean = textnorm.clean_for_lang(F.col("text"), 2048)
        timed(spark, "lang_clean_only", d.select("doc_id", clean.alias("c")))
        timed(
            spark,
            "lang_clean_plus_counts",
            d.select(
                "doc_id",
                textnorm.char_count(clean, textnorm.JAVA_HAN).alias("h"),
                textnorm.char_count(clean, textnorm.JAVA_KANA).alias("j"),
                textnorm.char_count(clean, textnorm.ASCII_ALPHA).alias("e"),
                textnorm.char_count(clean, textnorm.LATIN_SUPPLEMENT).alias("lat"),
                F.length(clean).alias("n"),
            ),
        )
        # counts over a let-bound clean (evaluate clean once)
        from go_pkg_spider_spark.functions.expr_utils import let_col

        bound = let_col(
            clean,
            lambda c: F.struct(
                textnorm.char_count(c, textnorm.JAVA_HAN).alias("h"),
                textnorm.char_count(c, textnorm.JAVA_KANA).alias("j"),
                textnorm.char_count(c, textnorm.ASCII_ALPHA).alias("e"),
                textnorm.char_count(c, textnorm.LATIN_SUPPLEMENT).alias("lat"),
                F.length(c).alias("n"),
            ),
        )
        timed(spark, "lang_letbound_counts", d.select("doc_id", bound.alias("s")))

    spark.stop()


if __name__ == "__main__":
    main()
