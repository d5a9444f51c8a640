"""Regenerate tests/golden_decisions.json — ONLY for a conscious,
documented semantic change (the goldens exist to catch accidental
drift). Record the reason in the commit message.

Usage: python tools/regen_goldens.py
"""

from __future__ import annotations

import hashlib
import json
import sys

sys.path.insert(0, ".")

from go_pkg_spider_spark import datagen, pipeline
from go_pkg_spider_spark.session import get_spark


def main() -> None:
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    p = "/tmp/golden_clips_regen.parquet"
    datagen.write_clips_parquet(p, 60)
    rows = pipeline.run_pipeline(spark.read.parquet(p)).collect()
    out = [
        {
            "clip_id": r.clip_id,
            "keep": r.keep,
            "drop_reason": r.drop_reason,
            "lang": r.lang,
            "lang_pos": r.lang_pos,
            "scrubbed_sha1": hashlib.sha1(
                (r.scrubbed_transcript or "").encode()
            ).hexdigest(),
        }
        for r in sorted(rows, key=lambda r: r.clip_id)
    ]
    with open("tests/golden_decisions.json", "w") as f:
        json.dump(out, f, indent=1)
    kept = sum(r["keep"] for r in out)
    print(f"regenerated 60 goldens, kept={kept}")
    spark.stop()


if __name__ == "__main__":
    main()
