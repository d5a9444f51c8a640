"""Checkpoint/resume: an interrupted run resumes from the manifest
without reprocessing committed buckets, and its output equals an
uninterrupted run's."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from go_pkg_spider_spark import pipeline
from go_pkg_spider_spark.io.catalog import Catalog
from go_pkg_spider_spark.io.manifest import (
    MANIFEST_SCHEMA,
    MANIFEST_TABLE,
    ManifestedRun,
    bucket_of,
)


def _transform(df):
    return pipeline.run_pipeline(df)


def _commit_one_bucket(spark, cat, clips, bucket, num_buckets, table="decisions"):
    """Replicates exactly what ManifestedRun.run commits for one bucket —
    used to simulate a crash after a partial run."""
    part = clips.filter(bucket_of(F.col("clip_id"), num_buckets) == bucket)
    cat.write(_transform(part), f"{table}/bucket={bucket}")
    hist = {
        r.drop_reason or "": r["count"]
        for r in cat.read(f"{table}/bucket={bucket}").groupBy("drop_reason").count().collect()
    }
    row = [
        (bucket, "done", sum(hist.values()), hist.get("", 0), hist, 1.0, "crashed", int(time.time()))
    ]
    cat.append(spark.createDataFrame(row, MANIFEST_SCHEMA), MANIFEST_TABLE)


def test_full_run_then_nothing_pending(spark, clips_path, tmp_path):
    clips = spark.read.parquet(clips_path)
    cat = Catalog(spark, str(tmp_path / "full"))
    run = ManifestedRun(spark, cat, num_buckets=3, run_id="r1")
    s = run.run(clips, _transform, "decisions")
    assert s == {"buckets_run": 3, "buckets_skipped": 0}
    # a second run over the same manifest does nothing
    run2 = ManifestedRun(spark, cat, num_buckets=3, run_id="r2")
    assert run2.pending_buckets() == []
    s2 = run2.run(clips, _transform, "decisions")
    assert s2 == {"buckets_run": 0, "buckets_skipped": 3}


def test_resume_after_crash_matches_uninterrupted(spark, clips_path, tmp_path):
    clips = spark.read.parquet(clips_path)

    cat_a = Catalog(spark, str(tmp_path / "a"))
    ManifestedRun(spark, cat_a, num_buckets=3, run_id="a").run(
        clips, _transform, "decisions"
    )

    # crash scenario: bucket 0 committed, then the driver died
    cat_b = Catalog(spark, str(tmp_path / "b"))
    _commit_one_bucket(spark, cat_b, clips, bucket=0, num_buckets=3)

    resume = ManifestedRun(spark, cat_b, num_buckets=3, run_id="resume")
    assert resume.pending_buckets() == [1, 2]
    s = resume.run(clips, _transform, "decisions")
    assert s == {"buckets_run": 2, "buckets_skipped": 1}

    a_rows = sorted(
        tuple(r) for b in range(3) for r in cat_a.read(f"decisions/bucket={b}").collect()
    )
    b_rows = sorted(
        tuple(r) for b in range(3) for r in cat_b.read(f"decisions/bucket={b}").collect()
    )
    assert a_rows == b_rows and len(a_rows) == clips.count()


def test_manifest_metrics(spark, clips_path, tmp_path):
    clips = spark.read.parquet(clips_path)
    cat = Catalog(spark, str(tmp_path / "m"))
    ManifestedRun(spark, cat, num_buckets=2, run_id="m").run(
        clips, _transform, "decisions"
    )
    rows = cat.read(MANIFEST_TABLE).collect()
    assert len(rows) == 2
    assert sum(r.input_rows for r in rows) == clips.count()
    assert all(r.status == "done" and r.wall_sec > 0 for r in rows)
    # drop-reason histogram is recorded per bucket
    assert any("too_short" in (r.drop_histogram or {}) for r in rows)
