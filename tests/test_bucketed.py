"""Bucketed co-located join: zero Exchange in the join plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_pkg_spider_spark import pipeline
from go_pkg_spider_spark.io import bucketed


def test_bucketed_join_has_no_shuffle(spark, clips_path, tmp_path):
    # warehouse.dir is static config — tables land in ./spark-warehouse
    # (gitignored); drop tables AND orphan dirs from crashed runs
    import shutil

    for t in ("clips_b", "decisions_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    clips = spark.read.parquet(clips_path)
    decisions = pipeline.run_pipeline(clips)

    bucketed.write_bucketed(
        clips.select("clip_id", "codec", "dur_ms"), "clips_b", "clip_id", 8
    )
    bucketed.write_bucketed(decisions, "decisions_b", "clip_id", 8)

    # disable broadcast so the plan shows the bucketed SortMergeJoin
    # (at scale neither side is broadcastable — that's the point)
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed.bucketed_join(spark, "clips_b", "decisions_b", "clip_id")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        assert "SortMergeJoin" in plan
        assert joined.count() == clips.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)

    # sanity: the same join over plain parquet DOES shuffle
    plain = clips.select("clip_id", "codec").join(decisions, "clip_id")
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plain_plan or "Broadcast" in plain_plan

    for t in ("clips_b", "decisions_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
