"""SparkSession factory tuned for the quality-filter pipeline.

Scale notes (100 TB / 1000-executor design, tested on local[N]):
- AQE on: runtime shuffle-partition coalescing + skew-join splitting is
  the backstop for long-transcript / long-clip skew (SURVEY.md §4.1).
- Arrow on, with a bounded records-per-batch so Arrow batches of binary
  audio `bytes` stay memory-safe inside pandas UDFs (SURVEY.md §7 risk:
  PCM is ~100x input; never let a batch of decoded audio exceed RAM).
- shuffle.partitions default sized for local testing; production submit
  overrides via spark-submit conf (the code never hard-codes a plan that
  depends on the partition count).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size: clips average ~100KB-1MB of audio bytes; 256 rows/batch
# keeps a decode batch under ~256MB even for heavy rows, while still
# amortizing Python/Arrow transfer overhead.
ARROW_MAX_RECORDS_PER_BATCH = 256

# UDF-heavy stages run ~2 processes per task slot (JVM task thread +
# python worker): local[N] on N physical cores oversubscribes 2x, and
# local[24] measured ~2x FASTER than local[32] on this 32-core host
# (BENCH/BASELINE.md). 0.75x cores is the measured sweet spot.
UDF_STAGE_CORE_FRACTION = 0.75


def udf_stage_cores(total_cores: int | None = None) -> int:
    """Task-slot count to use for UDF-heavy jobs on a `total_cores` host
    (default: this machine). Overridable via $SPARK_GRAFT_UDF_CPUS."""
    env = os.environ.get("SPARK_GRAFT_UDF_CPUS")
    if env:
        return int(env)
    total = total_cores or os.cpu_count() or 8
    return max(4, int(total * UDF_STAGE_CORE_FRACTION))


def get_spark(
    app_name: str = "go-pkg-spider-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    udf_heavy: bool = False,
) -> SparkSession:
    """udf_heavy=True sizes an unspecified local master at
    udf_stage_cores() (0.75x physical cores) instead of local[*] — the
    measured fix for python-worker oversubscription on UDF-dominated
    jobs; explicit `master`/$SPARK_GRAFT_MASTER always win."""
    master = master or os.environ.get("SPARK_GRAFT_MASTER")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        # precedence for an unspecified master: SPARK_GRAFT_CPUS (the
        # explicit bench/driver knob — it wins even for udf_heavy
        # sessions, round-3 advice), then udf_heavy auto-sizing, then
        # local[*].
        if cpus:
            master = f"local[{cpus}]"
        else:
            master = f"local[{udf_stage_cores()}]" if udf_heavy else "local[*]"
    elif cpus and master == "local[*]":
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # match parallelism: one shuffle partition per core locally;
        # production overrides to ~2-3x total cores via submit conf.
        import re

        m = re.match(r"local\[(\d+|\*)\]", master)
        if m and m.group(1) != "*":
            shuffle_partitions = max(int(m.group(1)), 4)
        else:
            shuffle_partitions = os.cpu_count() or 8

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        # binary audio blobs (~100KB-1MB/row): the default 4096-row
        # columnar reader batch makes per-thread column vectors of
        # hundreds of MB and OOMs at high parallelism ("Cannot reserve
        # additional contiguous bytes") — cap rows per read batch.
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
        # Python-worker allocator: pyarrow's default (jemalloc) returns
        # batch buffers to the OS on every free; at 32 concurrent
        # workers the resulting mmap/munmap churn serializes in the
        # kernel (TLB shootdowns — measured 85% sys time, UDF stage
        # 53s -> 9.5s with these three envs). Keep arenas resident.
        .config("spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL", "system")
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "1073741824")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "-1")
        .config("spark.sql.session.timeZone", "UTC")
        # local[N] runs the whole engine in one JVM: N concurrent tasks
        # each hold a columnar read batch of binary audio (~33MB at 256
        # rows) plus Arrow/UDF buffers — size the heap for the thread
        # count, not the dataset (32 threads OOM an 8g heap).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
