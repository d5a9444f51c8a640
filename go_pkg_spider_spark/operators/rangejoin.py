"""Bucketized range (interval) join — the scale pattern for
"rows within +/- W of each other" joins.

A naive range join is a per-key cross product with an inequality filter
(SortMergeJoin degenerates to a cartesian scan within each key group —
O(n*m) per key, the classic 100 TB killer). The bucketized form maps
both sides onto fixed W-sized time buckets, explodes the LEFT side into
its bucket and the two neighbors (any |dt| <= W pair must share one of
those three), equi-joins on (key, bucket) — one ordinary hash-partition
shuffle — and applies the exact |dt| <= W predicate on the (tiny)
bucket-local candidates. Cost: 3x left-side rows through the join, no
per-key quadratics unless the DATA is quadratic inside a single bucket.

This is the batch analog of a stream-stream interval join's state
layout (Spark docs: "Support matrix for joins in streaming queries").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bucket(ts: Column, window_us: int) -> Column:
    # events.ts is TIMESTAMP_NTZ: cast first (NTZ->numeric not ANSI-ok)
    return F.floor(F.unix_micros(ts.cast("timestamp")) / F.lit(window_us))


def within_range_count(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    window_seconds: int,
) -> DataFrame:
    """For every left row: the count of right rows with the same key
    within +/- window_seconds (inclusive). Left rows with zero matches
    are kept (count 0). Output: (id_col, n_in_range).

    Shuffle profile: one equi-join shuffle on (key, bucket) + the
    count groupBy on the left id (both AQE-coalesced); the left set
    re-joins its counts via a final left join so zero-match rows
    survive."""
    w_us = window_seconds * 1_000_000
    l = left.select(
        F.col(id_col).alias("_lid"),
        F.col(key_col).alias("_k"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_lt"),
        F.explode(
            F.array(
                _bucket(F.col(ts_col), w_us) - 1,
                _bucket(F.col(ts_col), w_us),
                _bucket(F.col(ts_col), w_us) + 1,
            )
        ).alias("_b"),
    )
    r = right.select(
        F.col(key_col).alias("_k"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_rt"),
        _bucket(F.col(ts_col), w_us).alias("_b"),
    )
    matched = (
        l.join(r, ["_k", "_b"])
        .filter(F.abs(F.col("_lt") - F.col("_rt")) <= w_us)
        .groupBy("_lid")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    base = left.select(F.col(id_col).alias("_lid")).distinct()
    return base.join(matched, "_lid", "left").select(
        F.col("_lid").alias(id_col),
        F.coalesce(F.col("_n"), F.lit(0)).alias("n_in_range"),
    )
