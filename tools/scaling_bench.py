"""Scaling-efficiency evidence for the north_rule (N vs 4N executors).

Sandbox proxy per BASELINE.md: the same job at two parallelism levels
on the same input. This host is a shared/multi-tenant VM whose OWN
pure-CPU scaling ceiling is measured and reported alongside (a
multiprocessing burn loop with zero shared state — the best any
software could do):

    N=2 -> 4N=8 : hardware ceiling ~0.89   (primary proxy)
    N=8 -> 4N=32: hardware ceiling ~0.69   (reported for context)

Protocol (noise-hardened):
- deterministic clips input, small parquet row groups (binary payload
  requirement, datagen.CLIPS_ROW_GROUP_SIZE);
- fresh JVM per level, levels interleaved across rounds;
- filter-based warm-up (never limit() — GlobalLimit single-tasks the
  UDF pipeline);
- best (min) of all timed runs per level — the contention-robust
  estimator of true capability on a shared host;
- efficiency = (T_N / T_4N) / 4.

Usage: python tools/scaling_bench.py [n_clips] [rounds]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from go_pkg_spider_spark.session import get_spark
from go_pkg_spider_spark import pipeline
from pyspark.sql import functions as F
spark = get_spark(app_name="scaling", master="local[{cpus}]", shuffle_partitions={cpus},
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "32m"}})
spark.sparkContext.setLogLevel("ERROR")
clips = spark.read.parquet({path!r})
n = clips.count()
warm = clips.filter(F.col("clip_id") < "clip-000000000500")
pipeline.run_pipeline(warm).write.format("noop").mode("overwrite").save()
times = []
for i in range({reps}):
    t0 = time.monotonic()
    pipeline.run_pipeline(clips).write.format("noop").mode("overwrite").save()
    times.append(time.monotonic() - t0)
print("RESULT " + json.dumps({{"cpus": {cpus}, "rows": n, "times": times}}))
spark.stop()
"""


def _burn(n):
    s = 0
    for i in range(n):
        s += i * i
    return s


def hw_ceiling(lo: int, hi: int) -> float:
    """Pure-CPU fixed-total-work scaling of THIS host right now."""
    def t(procs):
        t0 = time.monotonic()
        with mp.Pool(procs) as p:
            p.map(_burn, [6_000_000] * 32)
        return time.monotonic() - t0

    return (t(lo) / t(hi)) / (hi / lo)


def ensure_clips(n_clips: int) -> str:
    path = f"/tmp/bench_clips_v5_sf0.1_{n_clips}.parquet"
    if not os.path.exists(path):
        code = (
            f"import sys; sys.path.insert(0, {REPO!r})\n"
            "from go_pkg_spider_spark.session import get_spark\n"
            "from go_pkg_spider_spark import datagen\n"
            "spark = get_spark(master='local[32]')\n"
            "spark.sparkContext.setLogLevel('ERROR')\n"
            f"datagen.write_clips_with_spark(datagen.generate_clips_df(spark, {n_clips}), {path!r})\n"
            "spark.stop()\n"
        )
        subprocess.run([sys.executable, "-c", code], check=True)
    return path


def run_level(cpus: int, path: str, reps: int) -> list[float]:
    code = RUNNER.format(repo=REPO, cpus=cpus, path=path, reps=reps)
    out = subprocess.run(
        [sys.executable, "-c", code], check=True, capture_output=True, text=True
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])["times"]
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def measure_pair(lo: int, hi: int, path: str, rounds: int, n_clips: int) -> dict:
    times: dict[int, list[float]] = {lo: [], hi: []}
    for r in range(rounds):
        for cpus in (lo, hi):
            ts = run_level(cpus, path, reps=2)
            times[cpus].extend(ts)
            print(f"round {r + 1} local[{cpus}]: {[round(t, 2) for t in ts]}", flush=True)
    b_lo, b_hi = min(times[lo]), min(times[hi])
    return {
        "pair": f"local[{lo}] -> local[{hi}]",
        "lo": lo,
        "hi": hi,
        "all_lo": [round(t, 2) for t in times[lo]],
        "all_hi": [round(t, 2) for t in times[hi]],
        "best_lo_sec": round(b_lo, 3),
        "best_hi_sec": round(b_hi, 3),
        "throughput_lo": round(n_clips / b_lo, 1),
        "throughput_hi": round(n_clips / b_hi, 1),
        "efficiency": round((b_lo / b_hi) / (hi / lo), 3),
    }


def main():
    # mark spawned JVMs as ours so bench.py's leftover-kill can scope to
    # this project's processes (ADVICE r4: never SIGKILL unrelated spark)
    os.environ["SPARK_GRAFT_JVM_OWNER"] = "scaling_bench"
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    path = ensure_clips(n_clips)

    hw28 = hw_ceiling(2, 8)
    hw832 = hw_ceiling(8, 32)
    print(f"hw ceiling 2->8: {hw28:.2f}, 8->32: {hw832:.2f}", flush=True)

    primary = measure_pair(2, 8, path, rounds, n_clips)
    secondary = measure_pair(8, 32, path, max(rounds - 1, 1), n_clips)
    summary = {
        "n_clips": n_clips,
        "hw_ceiling_2_8": round(hw28, 3),
        "hw_ceiling_8_32": round(hw832, 3),
        "primary": primary,
        "secondary": secondary,
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    baseline_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    # Preserve sections this script does not own (e.g. the sf1 decade
    # jump): any H2 whose heading is not one of ours is re-inserted
    # before "## Scale lessons" (round-5 lesson: a full rewrite here
    # silently dropped the sf1 evidence).
    _OWNED = ("Scaling efficiency", "Scale lessons", "Reference baseline")
    preserved = ""
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            body = f.read()
        chunks = ["## " + c for c in body.split("\n## ")[1:]]
        preserved = "".join(
            c.rstrip() + "\n\n"
            for c in chunks
            if not any(c.startswith("## " + h) for h in _OWNED)
        )
    with open(baseline_path, "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured numbers

## Scaling efficiency (north_rule: >=0.8 from N to 4N executors)

Sandbox proxy per BASELINE.md: the same end-to-end clips pipeline
(decode -> langid -> quality -> keep/drop -> scrub) on the same
deterministic {n_clips}-clip input at two parallelism levels. Fresh JVM
per level, levels interleaved, best-of-runs per level (min is the
contention-robust estimator on this shared multi-tenant host).

**Host calibration** — pure-CPU multiprocessing (zero shared state,
the best ANY software could do on this box in the same window):
2->8 cores: {hw28:.2f}; 8->32 cores: {hw832:.2f}. The calibration
itself fluctuates window-to-window on this multi-tenant box (observed
0.64-1.44 at 8->32 across rounds) — treat it as a noise gauge, not a
constant. The 2->8 pair is the primary evidence (contention at 32
threads + documented UDF-stage oversubscription make 8->32 a host
property, not a plan property); 8->32 reported for context.

### Primary: N=2 -> 4N=8

| parallelism | best wall-clock | throughput |
|---|---|---|
| local[2] (N)  | {primary["best_lo_sec"]} s | {primary["throughput_lo"]} clips/s |
| local[8] (4N) | {primary["best_hi_sec"]} s | {primary["throughput_hi"]} clips/s |

**efficiency = {primary["efficiency"]}** (target >= 0.8; hardware ceiling {hw28:.2f})

All runs: local[2] {primary["all_lo"]}, local[8] {primary["all_hi"]}.

### Context: 8 -> 32

| parallelism | best wall-clock | throughput |
|---|---|---|
| local[8]  | {secondary["best_lo_sec"]} s | {secondary["throughput_lo"]} clips/s |
| local[32] | {secondary["best_hi_sec"]} s | {secondary["throughput_hi"]} clips/s |

efficiency = {secondary["efficiency"]} (hardware ceiling {hw832:.2f};
normalized vs ceiling: {min(secondary["efficiency"] / hw832, 1.0):.2f})

All runs: local[8] {secondary["all_lo"]}, local[32] {secondary["all_hi"]}.

{preserved}## Scale lessons encoded in the repo (found by measurement)

1. **Parquet row groups for binary payloads**: default ~128MB row
   groups made every scan thread buffer >100MB live -> GC collapse at
   32 threads (40s scans vs 2s). Fixed: ~256-row (~20MB) groups
   (datagen.CLIPS_ROW_GROUP_SIZE); Iceberg twin
   `write.parquet.row-group-size-bytes`.
2. **Columnar reader batch size**: 4096-row default x binary rows
   overflows column vectors ("Cannot reserve additional contiguous
   bytes"); capped at 256 (session.py).
3. **One fused Arrow UDF, not three**: each ArrowEvalPython node is its
   own python-worker pool + socket round trip; three nodes measured
   ~85% kernel time at local[32]. Fused decode+langid+ppl
   (operators/fused.py) — the reference's single-pass computeInfo
   discipline applied to UDF topology.
4. **Never warm up / benchmark through limit()**: GlobalLimit funnels
   the whole UDF pipeline into one task (85s vs 14s for identical rows
   via a filter).
5. **Heap sizing**: local[N] holds N concurrent binary batches; 8g OOMs
   at N=32, default now 24g (session.py).

## Reference baseline

The reference publishes no benchmark numbers (BASELINE.md); the
comparison basis is this repo's own N-vs-4N scaling plus the
driver-recorded BENCH_r{{N}}.json history.
"""
        )
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
