"""Bucketed-table utilities — co-located joins without a shuffle.

At 10^12 rows the decisions table is re-joined against the clips table
(and against itself across runs) constantly; bucketing both sides on
hash(clip_id) makes every such equi-join shuffle-free (SortMergeJoin
over pre-bucketed scans — zero Exchange). This is the persistent twin
of `pipeline.repartition_salted`; Iceberg's bucket partition transform
(`bucket(N, clip_id)`) is the same layout declared in table metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int,
    sorted_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table (saveAsTable is required —
    plain parquet paths cannot carry bucket metadata)."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sorted_by:
        w = w.sortBy(sorted_by)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on the bucket column: Catalyst
    sees matching output partitioning on both scans and plans the join
    with NO Exchange (tests/test_bucketed.py pins it)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
