"""Scaling + throughput evidence for the audio-fingerprint near-dup
job (round 8): fingerprint_clips -> audio_neardup_groups over the
deterministic bench clips corpus at two parallelism levels — the
north-rule two-cluster-size proxy, same protocol as
tools/scaling_bench.py (fresh JVM per run, interleaved levels,
min-of-rounds, noop sink, never limit()).

Usage: python tools/fp_scaling_bench.py [n_clips] [rounds] [tier]

tier (default fp64): fp64 = fingerprint_clips -> audio_neardup_groups
(the 64-bit key tier); subfp = fingerprint_clips_full ->
audio_subfp_neardup_groups (the noise-robust stream-matching tier —
carries the packed streams, so its delta over fp64 prices the tier).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from go_pkg_spider_spark.session import get_spark
from go_pkg_spider_spark.operators.audio_fp import (
    fingerprint_clips, audio_neardup_groups,
    fingerprint_clips_full, audio_subfp_neardup_groups)
from pyspark.sql import functions as F
spark = get_spark(app_name="fp_scaling", master="local[{cpus}]", shuffle_partitions={cpus},
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "32m"}})
spark.sparkContext.setLogLevel("ERROR")
tier = {tier!r}
fp_fn = fingerprint_clips if tier == "fp64" else fingerprint_clips_full
group_fn = audio_neardup_groups if tier == "fp64" else audio_subfp_neardup_groups
clips = spark.read.parquet({path!r})
n = clips.count()
warm = clips.filter(F.col("clip_id") < "clip-000000000500")
fp_fn(warm).write.format("noop").mode("overwrite").save()
times = []
for i in range({reps}):
    t0 = time.monotonic()
    fp = fp_fn(clips)
    group_fn(fp).write.format("noop").mode("overwrite").save()
    times.append(time.monotonic() - t0)
print("RESULT " + json.dumps({{"cpus": {cpus}, "rows": n, "times": times}}))
spark.stop()
"""


def run_level(cpus: int, path: str, reps: int, tier: str = "fp64") -> dict:
    code = RUNNER.format(repo=REPO, cpus=cpus, path=path, reps=reps, tier=tier)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    ).stdout
    line = next(ln for ln in out.splitlines() if ln.startswith("RESULT "))
    return json.loads(line[len("RESULT ") :])


def main() -> None:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    tier = sys.argv[3] if len(sys.argv) > 3 else "fp64"
    path = f"/tmp/bench_clips_v5_sf0.1_{n_clips}.parquet"
    if not os.path.exists(path):
        from go_pkg_spider_spark.session import get_spark
        from go_pkg_spider_spark import datagen

        spark = get_spark(app_name="fp_scaling_gen", master="local[32]")
        datagen.write_clips_with_spark(datagen.generate_clips_df(spark, n_clips), path)
        spark.stop()

    best: dict[int, float] = {}
    rows = 0
    for r in range(rounds):
        for cpus in (2, 8) if r % 2 == 0 else (8, 2):
            res = run_level(cpus, path, reps=1, tier=tier)
            rows = res["rows"]
            t = min(res["times"])
            best[cpus] = min(best.get(cpus, float("inf")), t)
            print(f"round {r} local[{cpus}]: {t:.1f}s", flush=True)
    eff = (best[2] / best[8]) / 4.0
    print(
        json.dumps(
            {
                "job": f"audio_fp_neardup_{tier}",
                "rows": rows,
                "best_s": {str(k): round(v, 1) for k, v in best.items()},
                "clips_per_sec_local8": round(rows / best[8], 1),
                "scaling_efficiency_2_to_8": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
