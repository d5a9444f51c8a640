"""Scale evidence for the incremental audio-dedup ingest path: the
cost of absorbing a new batch must scale with the BATCH, not the
committed corpus. Measures, at local[N] with a fresh JVM per run
(the scaling_bench subprocess protocol):

  1. one-time committed base: batch run_audio_dedup (subfp tier) over
     the 100k bench corpus;
  2. APPEND: run_audio_dedup_increment of a 5k disjoint-id batch
     (datagen rows 100000..105000) against the committed root;
  3. FULL RERUN: batch job over all 105k clips into a fresh root —
     what absorbing the batch costs WITHOUT the incremental path.

Prints one JSON line with both walls and the ratio. Results in
BENCH/BASELINE.md.

Usage: python tools/increment_bench.py [base_n] [inc_n] [cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from go_pkg_spider_spark import datagen
import os
if not os.path.exists({path!r}):
    datagen.write_clips_parquet({path!r}, {n}, start={start})
print("GEN_OK")
"""

RUN = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from go_pkg_spider_spark.session import get_spark
from jobs.run_audio_dedup import run_audio_dedup, run_audio_dedup_increment
spark = get_spark(app_name="inc_bench", master="local[{cpus}]", shuffle_partitions={cpus},
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "32m"}})
spark.sparkContext.setLogLevel("ERROR")
t0 = time.monotonic()
if {append!r} == "append":
    clips = spark.read.parquet({inc_path!r})
    s = run_audio_dedup_increment(spark, clips, {root!r}, run_id={run_id!r}, tier="subfp")
else:
    clips = spark.read.parquet({base_path!r})
    if {inc_path!r}:
        clips = clips.unionByName(spark.read.parquet({inc_path!r}))
    s = run_audio_dedup(spark, clips, {root!r}, run_id={run_id!r}, tier="subfp")
wall = time.monotonic() - t0
print("RESULT " + json.dumps({{"wall_s": round(wall, 1), "hist": s["decision_histogram"],
                               "stages_run": s["stages_run"]}}))
spark.stop()
"""


def _run(code: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    ).stdout
    line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    inc_n = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    base_path = f"/tmp/bench_clips_v5_sf0.1_{base_n}.parquet"
    inc_path = f"/tmp/bench_clips_v5_inc_{base_n}_{inc_n}.parquet"
    for path, n, start in ((base_path, base_n, 0), (inc_path, inc_n, base_n)):
        subprocess.run(
            [sys.executable, "-c", GEN.format(repo=REPO, path=path, n=n, start=start)],
            check=True,
        )

    base_root = f"/tmp/inc_bench_base_{base_n}"
    full_root = f"/tmp/inc_bench_full_{base_n}_{inc_n}"
    import shutil

    shutil.rmtree(base_root, ignore_errors=True)
    shutil.rmtree(full_root, ignore_errors=True)

    setup = _run(RUN.format(repo=REPO, cpus=cpus, append="batch", base_path=base_path,
                            inc_path="", root=base_root, run_id="base", inc_n=inc_n))
    print(f"committed base ({base_n} clips): {setup['wall_s']}s")

    results = {}
    for label, kwargs in (
        ("append", dict(append="append", base_path=base_path, inc_path=inc_path,
                        root=base_root, run_id="inc1")),
        ("full_rerun", dict(append="batch", base_path=base_path, inc_path=inc_path,
                            root=full_root, run_id="full")),
    ):
        res = _run(RUN.format(repo=REPO, cpus=cpus, **kwargs))
        results[label] = res
        print(f"{label}: {res['wall_s']}s  hist={res['hist']}")

    print(json.dumps({
        "job": "audio_dedup_increment_bench",
        "base_n": base_n,
        "inc_n": inc_n,
        "cpus": cpus,
        "base_setup_s": setup["wall_s"],
        "append_s": results["append"]["wall_s"],
        "full_rerun_s": results["full_rerun"]["wall_s"],
        "speedup": round(results["full_rerun"]["wall_s"] / results["append"]["wall_s"], 1),
    }))


if __name__ == "__main__":
    main()
