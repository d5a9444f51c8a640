"""Checkpoint / resume manifest: the reference's in-memory `seen` dedup
map (/root/reference/spider_news.go:15, 162-167, 202-205) made durable
and distributed (SURVEY.md §4.4).

The input is processed in partition batches keyed by
`pmod(hash(clip_id), num_buckets)`. After each batch commits its output,
one manifest row per bucket records (bucket, input rows, kept rows,
drop-reason histogram, wall-clock, status). Resume = read the manifest,
skip DONE buckets — the left-anti-join / J6 shape, implemented as a
bucket-set filter that PRUNES AT THE SCAN (a pushed-down `pmod(...)
NOT IN (...)` predicate), never a row-level anti-join against 10^12
processed ids.

Idempotence: a bucket either committed (manifest row present with
status=done) or is re-run whole; output writes are per-bucket overwrite
(dynamic partition overwrite in Iceberg), so re-running a half-written
bucket is safe.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from .catalog import Catalog

MANIFEST_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("status", StringType(), False),
        StructField("input_rows", LongType()),
        StructField("kept_rows", LongType()),
        StructField("drop_histogram", MapType(StringType(), LongType())),
        StructField("wall_sec", DoubleType()),
        StructField("run_id", StringType()),
        StructField("committed_at_unix", LongType()),
    ]
)

MANIFEST_TABLE = "pipeline_manifest"


def bucket_of(col, num_buckets: int):
    return F.pmod(F.hash(col), F.lit(num_buckets))


class ManifestedRun:
    """Drives the pipeline bucket-by-bucket with durable progress.

    At 10^12 rows each bucket is a full Spark job over ~1/num_buckets of
    the table (hundreds of GB); locally buckets are small but the
    control flow is identical.
    """

    def __init__(
        self,
        spark: SparkSession,
        catalog: Catalog,
        num_buckets: int,
        run_id: str,
        key_col: str = "clip_id",
    ):
        self.spark = spark
        self.catalog = catalog
        self.num_buckets = num_buckets
        self.run_id = run_id
        self.key_col = key_col

    def done_buckets(self) -> set[int]:
        if not self.catalog.exists(MANIFEST_TABLE):
            return set()
        rows = (
            self.catalog.read(MANIFEST_TABLE)
            .filter(F.col("status") == "done")
            .select("bucket")
            .distinct()
            .collect()
        )
        return {r.bucket for r in rows}

    def pending_buckets(self) -> list[int]:
        done = self.done_buckets()
        return [b for b in range(self.num_buckets) if b not in done]

    def run(self, clips: DataFrame, transform, output_table: str) -> dict:
        """transform: DataFrame -> DataFrame with (keep, drop_reason).
        Returns summary counts. Restart-safe: completed buckets are
        skipped via the manifest."""
        pending = self.pending_buckets()
        summary = {"buckets_run": 0, "buckets_skipped": self.num_buckets - len(pending)}
        for b in pending:
            t0 = time.monotonic()
            # bucket predicate prunes at the scan (partition/bucket
            # pruning when the table is bucket-partitioned on the key)
            part = clips.filter(bucket_of(F.col(self.key_col), self.num_buckets) == b)
            out = transform(part)
            self.catalog.write(out, f"{output_table}/bucket={b}", mode="overwrite")
            # metrics from the committed output (one extra cheap scan of
            # the just-written bucket, not the input)
            written = self.catalog.read(f"{output_table}/bucket={b}")
            hist_rows = written.groupBy("drop_reason").count().collect()
            hist = {r.drop_reason or "": r["count"] for r in hist_rows}
            input_rows = sum(hist.values())
            kept = hist.get("", 0)
            wall = time.monotonic() - t0
            row = [
                (
                    b,
                    "done",
                    input_rows,
                    kept,
                    hist,
                    round(wall, 3),
                    self.run_id,
                    int(time.time()),
                )
            ]
            mdf = self.spark.createDataFrame(row, MANIFEST_SCHEMA)
            self.catalog.append(mdf, MANIFEST_TABLE)
            summary["buckets_run"] += 1
        return summary
