"""sf1 (500k-clip) headline run — the 10x decade jump above the bench tier.

Round-4 verdict #7: prove the memory knobs (24g driver heap, 256-row
Arrow batches, ~20MB parquet row groups, 32m maxPartitionBytes) hold at
10x the sf0.1 row count, and record clips/s + peak-memory evidence in
BENCH/BASELINE.md — so the 100 TB scale claims rest on a measured
decade jump, not extrapolation from 50k rows.

Phases (each skippable; default = all):
  gen    build /tmp/bench_clips_v4_sf1_500000.parquet (~48GB, the same
         deterministic datagen rows as every other tier — bench.py's
         CLIPS_BY_SF["sf1"] points at the same path) and
         /tmp/docs_sf1.parquet (50k docs: the sf0.1 documents table
         expanded 10x with per-copy deterministic text perturbation —
         copies of a doc are NEAR-duplicates of each other, so the LSH
         -> components chain is stressed with 10-cliques, the worst
         realistic shape for bucket caps).
  clips  run_pipeline over the 500k-clip table, min-of-N wall +
         clips/s, with a /proc RSS sampler recording peak JVM + python
         worker memory.
  dedup  jobs/run_dedup.py full chain over the 50k-doc table (fresh
         output root), wall + manifest metrics.

Usage:
  SPARK_GRAFT_CPUS=32 python tools/sf1_headline.py [gen clips dedup]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1_CLIPS = 500_000
CLIPS_PATH = f"/tmp/bench_clips_v4_sf1_{SF1_CLIPS}.parquet"
DOCS_SRC = "/root/testdata/sf0.1/documents.parquet"
DOCS_PATH = "/tmp/docs_sf1.parquet"
DEDUP_ROOT = "/tmp/dedup_sf1"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# ~48GB of clips + working room; refuse to fill the disk of a shared
# host. (The table is an ephemeral bench artifact — delete after use.)
MIN_FREE_GB_FOR_GEN = 52


class RssSampler(threading.Thread):
    """Sample /proc every 0.5s for the session's JVM RSS and the summed
    RSS of its python workers (pyspark.daemon tree); keep the peaks.
    Peak JVM RSS is also cross-checked against VmHWM at stop()."""

    def __init__(self) -> None:
        super().__init__(daemon=True)
        self.peak_jvm_mb = 0.0
        self.peak_workers_mb = 0.0
        self.jvm_hwm_mb = 0.0
        self._halt = threading.Event()

    @staticmethod
    def _procs(needle: bytes) -> list[int]:
        """PIDs whose cmdline matches AND that carry this tool's env
        marker: on the documented multi-tenant host a cmdline match
        alone would sample ANOTHER tenant's Spark JVM into the
        peak-memory evidence (the bench.py JVM-kill scoping lesson,
        ADVICE r4). Foreign-user /proc/<pid>/environ is unreadable ->
        skipped; same-user unrelated sessions lack the marker."""
        marker = b"SPARK_GRAFT_JVM_OWNER=sf1_headline"
        out = []
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/cmdline", "rb") as f:
                    if needle not in f.read():
                        continue
                with open(f"/proc/{d}/environ", "rb") as f:
                    if marker in f.read():
                        out.append(int(d))
            except OSError:
                continue
        return out

    @staticmethod
    def _rss_mb(pid: int, field: str = "VmRSS") -> float:
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith(field):
                        return int(line.split()[1]) / 1024.0
        except OSError:
            pass
        return 0.0

    def run(self) -> None:
        while not self._halt.is_set():
            jvms = self._procs(b"org.apache.spark")
            if jvms:
                self.peak_jvm_mb = max(
                    self.peak_jvm_mb, max(self._rss_mb(p) for p in jvms)
                )
                self.jvm_hwm_mb = max(
                    self.jvm_hwm_mb, max(self._rss_mb(p, "VmHWM") for p in jvms)
                )
            workers = self._procs(b"pyspark.daemon")
            if workers:
                self.peak_workers_mb = max(
                    self.peak_workers_mb, sum(self._rss_mb(p) for p in workers)
                )
            self._halt.wait(0.5)

    def stop(self) -> dict[str, float]:
        self._halt.set()
        self.join(timeout=2)
        return {
            "peak_jvm_rss_mb": round(self.peak_jvm_mb, 1),
            "peak_jvm_hwm_mb": round(self.jvm_hwm_mb, 1),
            "peak_python_workers_sum_mb": round(self.peak_workers_mb, 1),
        }


def _spark(app: str):
    from go_pkg_spider_spark.session import get_spark

    spark = get_spark(
        app_name=app,
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        extra_conf={"spark.sql.files.maxPartitionBytes": "32m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def phase_gen() -> None:
    free_gb = shutil.disk_usage("/tmp").free / 1e9
    if not os.path.exists(CLIPS_PATH) and free_gb < MIN_FREE_GB_FOR_GEN:
        raise SystemExit(
            f"refusing to generate ~48GB sf1 clips with only {free_gb:.0f}GB free"
        )
    spark = _spark("sf1-gen")
    if not os.path.exists(CLIPS_PATH):
        from go_pkg_spider_spark import datagen

        t0 = time.monotonic()
        datagen.write_clips_with_spark(
            datagen.generate_clips_df(spark, SF1_CLIPS), CLIPS_PATH
        )
        print(f"gen clips: {time.monotonic() - t0:.1f}s -> {CLIPS_PATH}")
    if not os.path.exists(DOCS_PATH):
        from pyspark.sql import functions as F

        docs = spark.read.parquet(DOCS_SRC)
        # 10 copies per doc; copy 0 is verbatim, copies 1-9 get a short
        # deterministic suffix so they are NEAR-dups (not exact) of the
        # original — every doc becomes a 10-clique for the LSH stage.
        expanded = (
            docs.withColumn("c", F.explode(F.sequence(F.lit(0), F.lit(9))))
            .withColumn(
                "text",
                F.when(F.col("c") == 0, F.col("text")).otherwise(
                    F.concat(
                        F.col("text"),
                        F.lit(" v"),
                        F.col("c").cast("string"),
                        F.lit("-"),
                        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
                    )
                ),
            )
            .withColumn("doc_id", F.col("doc_id") * 10 + F.col("c"))
            .withColumn("n_chars", F.length("text"))
            .drop("c")
        )
        expanded.repartition(CPUS).write.mode("overwrite").parquet(DOCS_PATH)
        print(f"gen docs: {expanded.count()} rows -> {DOCS_PATH}")
    spark.stop()


def phase_clips(n_runs: int = 3) -> dict:
    from pyspark.sql import functions as F

    from go_pkg_spider_spark import pipeline

    spark = _spark("sf1-clips")
    clips = spark.read.parquet(CLIPS_PATH)
    n = clips.count()
    # page-cache warm: one full byte scan (the bench protocol)
    clips.agg(F.sum(F.length("bytes"))).collect()
    sampler = RssSampler()
    sampler.start()
    runs = []
    for _ in range(n_runs):
        t0 = time.monotonic()
        pipeline.run_pipeline(clips).write.format("noop").mode("overwrite").save()
        runs.append(round(time.monotonic() - t0, 2))
    mem = sampler.stop()
    best = min(runs)
    out = {
        "phase": "clips",
        "n_clips": n,
        "cpus": CPUS,
        "raw_runs_sec": runs,
        "min_sec": best,
        "clips_per_sec": round(n / best, 1),
        **mem,
    }
    print(json.dumps(out))
    spark.stop()
    return out


def phase_dedup() -> dict:
    if os.path.exists(DEDUP_ROOT):
        shutil.rmtree(DEDUP_ROOT)
    sampler = RssSampler()
    sampler.start()
    t0 = time.monotonic()
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "jobs", "run_dedup.py"),
            "--input",
            DOCS_PATH,
            "--output-root",
            DEDUP_ROOT,
            "--run-id",
            "sf1",
        ],
        capture_output=True,
        text=True,
        env={
            **os.environ,
            "SPARK_GRAFT_CPUS": str(CPUS),
            # plain-python invocation (prod uses spark-submit --py-files):
            # the repo root must be importable from jobs/
            "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        },
    )
    wall = round(time.monotonic() - t0, 2)
    mem = sampler.stop()
    if proc.returncode != 0:
        print(proc.stdout[-4000:])
        print(proc.stderr[-4000:])
        raise SystemExit(f"run_dedup failed rc={proc.returncode}")
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    out = {"phase": "dedup", "wall_sec": wall, **mem, "summary": summary}
    print(json.dumps(out))
    return out


def main() -> None:
    phases = sys.argv[1:] or ["gen", "clips", "dedup"]
    # unconditional: the RssSampler matches exactly this value
    os.environ["SPARK_GRAFT_JVM_OWNER"] = "sf1_headline"
    for ph in phases:
        {"gen": phase_gen, "clips": phase_clips, "dedup": phase_dedup}[ph]()


if __name__ == "__main__":
    main()
