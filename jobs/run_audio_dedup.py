"""Composed AUDIO near-dup job: robust fingerprint -> pigeonhole-block
candidate pairs (capped buckets) -> connected components -> one
decision row per clip — the perceptual twin of jobs/run_dedup.py for
the north-star's audio payload, as ONE spark-submit artifact.

    zip -qr /tmp/pkg.zip go_pkg_spider_spark
    spark-submit --driver-memory 24g --py-files /tmp/pkg.zip \
        jobs/run_audio_dedup.py --input /data/clips \
        --output-root /data/audio_dedup --run-id nightly

Scale/resume design (the run_dedup.py conventions, stage-manifested):
- `fingerprints` commits the mapInPandas output FIRST — the expensive
  decode+FFT pass runs exactly once; every downstream stage (and any
  rerun with different grouping knobs) reads the ~20-byte/clip table
  back instead of re-decoding the corpus. max_hamming /
  max_bucket_size are therefore EXCLUDED from the fingerprint stage's
  params_sig and only gate the downstream stages (StageRunner's
  per-stage extra_sig).
- `pairs` commits the hamming-filtered candidate pairs with the
  bucket-cap drop accounting observed into the manifest metrics.
- `components` labels over the COMMITTED pairs (lineage cut).
- `decisions`: error rows -> 'error'; degenerate fingerprints (zero
  spectro-temporal variation — silence, stationary tones) ->
  'keep_degenerate' (no identity to assert; NEVER merged); group
  losers -> 'drop_audio_dup'; else 'keep'.
- Single-writer run lease on the output root (io/stages.run_lease).
"""

from __future__ import annotations

import argparse
import json
import sys

AUDIO_DEDUP_MANIFEST_TABLE = "audio_dedup_manifest"


def run_audio_dedup(
    spark,
    clips,
    output_root: str,
    run_id: str = "adhoc",
    max_hamming: int = 7,
    max_bucket_size: int = 1024,
) -> dict:
    from go_pkg_spider_spark.io.stages import run_lease

    with run_lease(output_root, run_id):
        return _run_locked(
            spark, clips, output_root, run_id, max_hamming, max_bucket_size
        )


def _run_locked(
    spark,
    clips,
    output_root: str,
    run_id: str,
    max_hamming: int,
    max_bucket_size: int,
) -> dict:
    from pyspark.sql import Observation, functions as F

    from go_pkg_spider_spark.io.catalog import Catalog
    from go_pkg_spider_spark.io.stages import StageRunner
    from go_pkg_spider_spark.operators import components as cc_ops
    from go_pkg_spider_spark.operators.audio_fp import (
        audio_fp_pairs,
        fingerprint_clips,
    )

    cat = Catalog(spark, output_root)
    # the fingerprint stage is knob-free by design: changing the
    # grouping knobs must NOT re-decode the corpus, so they ride the
    # downstream stages' sig only
    runner = StageRunner(
        spark,
        cat,
        AUDIO_DEDUP_MANIFEST_TABLE,
        {"max_hamming": max_hamming, "max_bucket_size": max_bucket_size},
        run_id,
        stage_params={"fingerprints": {}},
    )
    summary = runner.summary
    commit, resumable = runner.commit, runner.resumable

    if not resumable("fingerprints"):
        commit("fingerprints", fingerprint_clips(clips))
    fp = cat.read("fingerprints")

    if not resumable("pairs"):
        obs = Observation()
        pairs = audio_fp_pairs(
            fp,
            max_hamming=max_hamming,
            max_bucket_size=max_bucket_size,
            observation=obs,
        )

        def _bucket_metrics():
            got = obs.get
            return {
                "dropped_members": str(got.get("dropped_members") or 0),
                "max_bucket_members": str(got.get("max_bucket_members") or 0),
                "n_buckets": str(got.get("n_buckets") or 0),
                "max_hamming": str(max_hamming),
            }

        commit("pairs", pairs, metrics_after=_bucket_metrics)

    if not resumable("components"):
        # pair endpoints only (no corpus-wide node set): clips in no
        # pair are singletons and the decisions stage's left-join
        # coalesce labels them — keeps every iterative round at
        # O(near-dup members), not O(corpus)
        labels = cc_ops.connected_components(
            cat.read("pairs"), src="id_a", dst="id_b", id_col="id"
        )
        commit("components", labels.select(F.col("id").alias("clip_id"), "component"))

    if not resumable("decisions"):
        labels = cat.read("components")
        enriched = fp.select("clip_id", "err", "fp_degenerate", "fp64").join(
            labels, "clip_id", "left"
        )
        decision = (
            F.when(F.col("err").isNotNull(), "error")
            .when(F.col("fp_degenerate"), "keep_degenerate")
            .when(F.col("component") != F.col("clip_id"), "drop_audio_dup")
            .otherwise("keep")
        )
        commit(
            "decisions",
            enriched.select(
                "clip_id",
                "fp64",
                F.coalesce(F.col("component"), F.col("clip_id")).alias("group_id"),
                decision.alias("decision"),
            ),
        )

    dec = cat.read("decisions")
    summary["decision_histogram"] = {
        r.decision: r["count"] for r in dec.groupBy("decision").count().collect()
    }
    return summary


def main() -> None:
    p = argparse.ArgumentParser(description="composed audio near-dup job")
    p.add_argument("--input", required=True, help="clips table path")
    p.add_argument("--output-root", required=True)
    p.add_argument("--run-id", default="adhoc")
    p.add_argument("--max-hamming", type=int, default=7)
    p.add_argument("--max-bucket-size", type=int, default=1024)
    args = p.parse_args()

    from go_pkg_spider_spark.session import get_spark

    spark = get_spark(app_name=f"audio-dedup-{args.run_id}")
    clips = spark.read.parquet(args.input)
    summary = run_audio_dedup(
        spark,
        clips,
        args.output_root,
        run_id=args.run_id,
        max_hamming=args.max_hamming,
        max_bucket_size=args.max_bucket_size,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
