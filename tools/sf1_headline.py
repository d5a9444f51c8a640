"""sf1 (500k-clip) headline run — the 10x decade jump above the bench tier.

Round-4 verdict #7: prove the memory knobs (24g driver heap, 256-row
Arrow batches, ~20MB parquet row groups, 32m maxPartitionBytes) hold at
10x the sf0.1 row count, and record clips/s + peak-memory evidence in
BENCH/BASELINE.md — so the 100 TB scale claims rest on a measured
decade jump, not extrapolation from 50k rows.

Phases (each skippable; default = all):
  gen    build /tmp/bench_clips_v5_sf1_500000.parquet (~48GB, the same
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
  ann    jobs/run_ann_index.py over a 500k-vector table (the sf0.1
         embeddings expanded 250x with deterministic per-copy
         perturbation — 2,000 micro-clusters of 250, real cluster
         structure for IVF): full train -> index -> serve chain, then
         a same-args resume (expect 0 stages), then a serve-only rerun
         at a different n_probe (isolates serve wall against the
         committed index). Records per-stage walls from the manifest,
         cell balance, and peak RSS (VERDICT r5 "What's missing" #2).

  scaling  north-rule 2->8 interleaved pair on the 500k-clip corpus
         (fresh JVM per run, min per level) — long walls de-weight
         spinup vs the sf0.1 primary.

  docs_entries  winnow_fingerprints_docs + link_types_docs over the
         50k-doc corpus (10x bench tier), ABBA min-of-4 + peak RSS —
         the decade datapoints for the two slowest entry families
         (needs only the docs table, not the 48GB clips).

Usage:
  SPARK_GRAFT_CPUS=32 python tools/sf1_headline.py [gen clips dedup ann scaling docs_entries]
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
CLIPS_PATH = f"/tmp/bench_clips_v5_sf1_{SF1_CLIPS}.parquet"
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


def _gen_docs(spark) -> None:
    if os.path.exists(DOCS_PATH):
        return
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
    _gen_docs(spark)
    spark.stop()


def phase_docs_entries(n_runs: int = 4) -> dict:
    """sf1 datapoints for the two slowest documents-table entries
    (VERDICT r6 #7): winnow_fingerprints_docs + link_types_docs over
    the 50k-doc expanded corpus (10x the bench tier), min-of-N with the
    runs INTERLEAVED across the two entries (the ABBA noise protocol)
    and peak-RSS accounting. Needs only the docs table — not the 48GB
    clips corpus."""
    spark = _spark("sf1-docs-entries")
    _gen_docs(spark)
    # entries resolve {sf_dir}/documents.parquet: stage a dir view
    sf_dir = "/tmp/sf1_docs_dir"
    os.makedirs(sf_dir, exist_ok=True)
    link = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.abspath(DOCS_PATH), link)

    import __spark_entry__ as entry

    qs = entry.queries()
    names = ["winnow_fingerprints_docs", "link_types_docs"]
    docs = spark.read.parquet(link)
    n_docs = docs.count()
    from pyspark.sql import functions as F

    docs.agg(F.sum(F.length("text"))).collect()  # page-cache warm
    sampler = RssSampler()
    sampler.start()
    raw: dict[str, list[float]] = {n: [] for n in names}
    for r in range(n_runs):
        order = names if r % 3 == 0 else list(reversed(names))
        for name in order:
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            raw[name].append(round(time.monotonic() - t0, 2))
    mem = sampler.stop()
    out = {
        "phase": "docs_entries",
        "n_docs": n_docs,
        "cpus": CPUS,
        "raw_runs_sec": raw,
        "min_sec": {n: min(raw[n]) for n in names},
        **mem,
    }
    print(json.dumps(out))
    spark.stop()
    return out


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


EMB_SRC = "/root/testdata/sf0.1/embeddings.parquet"
EMB_PATH = "/tmp/emb_sf1.parquet"
QUERIES_PATH = "/tmp/ann_queries_sf1.parquet"
ANN_ROOT = "/tmp/ann_sf1"
ANN_COPIES = 250  # 2,000 sf0.1 vectors x 250 = 500k
ANN_CELLS = 64


def _gen_ann_tables() -> None:
    """500k vectors: each sf0.1 embedding expanded to ANN_COPIES
    deterministic perturbed copies (copy 0 verbatim). Perturbation is
    integer-arithmetic pseudo-noise per (new id, position), amplitude
    0.03 against a value range of ~[-0.34, 0.34] — copies form a tight
    micro-cluster around the original, so the corpus has genuine
    cluster structure (unlike the near-random base table, IVF's worst
    case measured in BENCH/BASELINE.md). Queries = the 2,000 verbatim
    copy-0 members."""
    from pyspark.sql import functions as F

    spark = _spark("sf1-ann-gen")
    emb = spark.read.parquet(EMB_SRC)
    expanded = (
        emb.withColumn(
            "c", F.explode(F.sequence(F.lit(0), F.lit(ANN_COPIES - 1)))
        )
        .withColumn("new_id", F.col("vec_id") * ANN_COPIES + F.col("c"))
        .select(
            F.col("new_id").alias("vec_id"),
            F.when(F.col("c") == 0, F.transform("embedding", lambda x: x.cast("double")))
            .otherwise(
                F.transform(
                    "embedding",
                    lambda x, i: x.cast("double")
                    + (
                        F.pmod(
                            F.col("new_id") * F.lit(40503) + i * F.lit(2654435761),
                            F.lit(2001),
                        )
                        - F.lit(1000)
                    )
                    / F.lit(1000.0)
                    * F.lit(0.03),
                )
            )
            .alias("embedding"),
            "label",
        )
    )
    expanded.repartition(CPUS).write.mode("overwrite").parquet(EMB_PATH)
    emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    ).coalesce(1).write.mode("overwrite").parquet(QUERIES_PATH)
    print(f"gen ann: {expanded.count()} vectors -> {EMB_PATH}")
    spark.stop()


def _ann_job(extra_args: list[str]) -> tuple[float, dict]:
    t0 = time.monotonic()
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(
                os.path.dirname(__file__), "..", "jobs", "run_ann_index.py"
            ),
            "--input", EMB_PATH,
            "--output-root", ANN_ROOT,
            "--run-id", "sf1",
            "--n-cells", str(ANN_CELLS),
            "--queries", QUERIES_PATH,
            "--topk", "10",
            *extra_args,
        ],
        capture_output=True,
        text=True,
        env={
            **os.environ,
            "SPARK_GRAFT_CPUS": str(CPUS),
            "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        },
    )
    wall = round(time.monotonic() - t0, 2)
    if proc.returncode != 0:
        print(proc.stdout[-4000:])
        print(proc.stderr[-4000:])
        raise SystemExit(f"run_ann_index failed rc={proc.returncode}")
    return wall, json.loads(proc.stdout.strip().splitlines()[-1])


def phase_ann() -> dict:
    import duckdb

    if not (os.path.exists(EMB_PATH) and os.path.exists(QUERIES_PATH)):
        _gen_ann_tables()
    if os.path.exists(ANN_ROOT):
        shutil.rmtree(ANN_ROOT)
    sampler = RssSampler()
    sampler.start()
    full_wall, full = _ann_job(["--n-probe", "8"])
    resume_wall, resume = _ann_job(["--n-probe", "8"])
    serve_wall, serve = _ann_job(["--n-probe", "4"])
    gemm_wall, gemm = _ann_job(["--n-probe", "8", "--scorer", "gemm"])
    mem = sampler.stop()
    con = duckdb.connect()
    stage_walls = dict(
        con.execute(
            f"select stage, max(wall_sec) from '{ANN_ROOT}/ann_manifest/*.parquet' group by 1"
        ).fetchall()
        + con.execute(
            f"select stage, max(wall_sec) from '{ANN_ROOT}/ann_manifest_topk/*.parquet' group by 1"
        ).fetchall()
    )
    out = {
        "phase": "ann",
        "cpus": CPUS,
        "n_vectors": 2000 * ANN_COPIES,
        "n_cells": ANN_CELLS,
        "n_queries": 2000,
        "full_chain": {"wall_sec": full_wall, **full},
        "resume": {"wall_sec": resume_wall, **resume},
        "serve_only_nprobe4": {"wall_sec": serve_wall, **serve},
        "serve_only_nprobe8_gemm": {"wall_sec": gemm_wall, **gemm},
        "stage_walls_sec": stage_walls,
        **mem,
    }
    print(json.dumps(out))
    return out


def phase_scaling(rounds: int = 2) -> dict:
    """North-rule 2->8 pair at sf1 (VERDICT r5 #6): the interleaved
    scaling protocol of tools/scaling_bench.py re-run on the 500k-clip
    corpus, where per-run walls (~2-10 min) are long enough that JVM /
    python-worker spinup and scan stragglers stop dominating — closing
    the loop between the sf0.1 interleaved primary (0.955) and the sf1
    sequential 8->32 cross-check (0.90 normalized). Fresh JVM per run,
    levels interleaved 2,8,2,8,..., min per level."""
    from tools import scaling_bench

    if not os.path.exists(CLIPS_PATH):
        raise SystemExit(f"run the gen phase first ({CLIPS_PATH} missing)")
    hw28 = scaling_bench.hw_ceiling(2, 8)
    print(f"hw ceiling 2->8: {hw28:.2f}", flush=True)
    times: dict[int, list[float]] = {2: [], 8: []}
    for r in range(rounds):
        for cpus in (2, 8):
            ts = scaling_bench.run_level(cpus, CLIPS_PATH, reps=1)
            times[cpus].extend(ts)
            print(
                f"round {r + 1} local[{cpus}]: {[round(t, 1) for t in ts]}",
                flush=True,
            )
    b2, b8 = min(times[2]), min(times[8])
    out = {
        "phase": "scaling2v8_sf1",
        "n_clips": SF1_CLIPS,
        "hw_ceiling_2_8": round(hw28, 3),
        "all_2": [round(t, 1) for t in times[2]],
        "all_8": [round(t, 1) for t in times[8]],
        "best_2_sec": round(b2, 1),
        "best_8_sec": round(b8, 1),
        "throughput_2": round(SF1_CLIPS / b2, 1),
        "throughput_8": round(SF1_CLIPS / b8, 1),
        "efficiency": round((b2 / b8) / 4, 3),
    }
    print(json.dumps(out))
    return out


def main() -> None:
    phases = sys.argv[1:] or ["gen", "clips", "dedup"]
    # unconditional: the RssSampler matches exactly this value
    os.environ["SPARK_GRAFT_JVM_OWNER"] = "sf1_headline"
    for ph in phases:
        {
            "gen": phase_gen,
            "clips": phase_clips,
            "dedup": phase_dedup,
            "ann": phase_ann,
            "scaling": phase_scaling,
            "docs_entries": phase_docs_entries,
        }[ph]()


if __name__ == "__main__":
    main()
