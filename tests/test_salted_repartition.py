"""Skew handling (north_rule: 'partitioning / shuffle / skew handled
explicitly'): the salted repartition must spread pathological inputs —
both hot keys and long-transcript clusters — across partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_pkg_spider_spark import pipeline


def _partition_sizes(df):
    return [
        r.n
        for r in df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]


def test_salted_repartition_spreads_long_rows(spark):
    # heavy tail: 5% of rows carry 100x transcripts (the long-clip skew
    # FIXTURES.md §1 dur_ms describes)
    rows = [
        (f"clip-{i:06d}", ("long text " * 400) if i % 20 == 0 else "short text")
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "clip_id string, transcript string")
    out = pipeline.repartition_salted(df, 8)
    sizes = _partition_sizes(out)
    assert len(sizes) == 8
    # balanced within 2x of ideal
    assert max(sizes) <= 2 * (2000 / 8)

    # the heavy rows themselves spread (not all in one partition)
    heavy = out.filter(F.length("transcript") > 1000)
    heavy_pids = {
        r.pid
        for r in heavy.withColumn("pid", F.spark_partition_id()).select("pid").distinct().collect()
    }
    assert len(heavy_pids) >= 4


def test_salted_repartition_breaks_hot_key(spark):
    # pathological: many rows share one clip_id (duplicate-key burst) —
    # plain hash(clip_id) partitioning would put them ALL in one
    # partition; the length-tier salt still cannot split identical
    # (key, length) rows, so vary lengths as a real burst would
    rows = [("hot-clip", "x" * (10 + i % 50)) for i in range(1000)] + [
        (f"clip-{i}", "y" * 20) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "clip_id string, transcript string")
    out = pipeline.repartition_salted(df, 8)
    hot = out.filter(F.col("clip_id") == "hot-clip")
    hot_pids = {
        r.pid
        for r in hot.withColumn("pid", F.spark_partition_id()).select("pid").distinct().collect()
    }
    assert len(hot_pids) >= 4  # the hot key is split across partitions
