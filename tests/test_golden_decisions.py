"""FROZEN decision goldens: the pipeline's (keep, drop_reason, lang,
scrub-hash) for the first 60 deterministic datagen clips, captured at
round 1 and committed. Unlike the live oracle (which moves with the
code), this file does NOT move — any semantic drift of the cascade,
scrub bank, or decode paths fails here and must be a conscious,
documented regeneration (tools note in the file header)."""

from __future__ import annotations

import hashlib
import json
import os

from go_pkg_spider_spark import datagen, pipeline

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_decisions.json")


def test_decisions_match_frozen_goldens(spark, tmp_path):
    with open(GOLDEN) as f:
        want = {r["clip_id"]: r for r in json.load(f)}

    p = str(tmp_path / "golden_clips.parquet")
    datagen.write_clips_parquet(p, 60)
    out = pipeline.run_pipeline(spark.read.parquet(p)).collect()
    assert len(out) == len(want) == 60

    for r in out:
        w = want[r.clip_id]
        got = {
            "keep": r.keep,
            "drop_reason": r.drop_reason,
            "lang": r.lang,
            "lang_pos": r.lang_pos,
            "scrubbed_sha1": hashlib.sha1(
                (r.scrubbed_transcript or "").encode()
            ).hexdigest(),
        }
        assert got == {k: w[k] for k in got}, (r.clip_id, got, w)
