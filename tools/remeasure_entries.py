"""Clean-window re-measurement of specific bench entries at sf0.1
(VERDICT r6 #6: link_types_docs & friends regressed 1.4-1.6x in
BENCH_r06 with UNCHANGED code — confirm host noise vs a real plan
regression). Uses the exact bench.py session/protocol: same session
conf, full-scan warmup, ABBA-interleaved min-of-PASSES, raw runs
printed for adjudication.

Usage: python tools/remeasure_entries.py [entry ...]
       (default: the four r6-regressed entries)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "4"))

DEFAULT = [
    "link_types_docs",
    "psl_domains_docs",
    "sessionize_events",
    "charset_rules_docs",
]


def main() -> None:
    import bench

    os.environ["SPARK_GRAFT_JVM_OWNER"] = "bench"
    bench._kill_leftover_jvms()
    names = sys.argv[1:] or DEFAULT

    from go_pkg_spider_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(
        app_name="remeasure",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        extra_conf={"spark.sql.files.maxPartitionBytes": "32m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    # warm each entry once (JIT/codegen/page cache), untimed
    for n in names:
        bench._noop_write(qs[n](spark, SF_DIR))
    raw: dict[str, list[float]] = {n: [] for n in names}
    for p in range(PASSES):
        order = names if p % 3 == 0 else list(reversed(names))
        for n in order:
            t0 = time.monotonic()
            bench._noop_write(qs[n](spark, SF_DIR))
            raw[n].append(round(time.monotonic() - t0, 3))
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "cpus": CPUS,
                "mins": {n: min(raw[n]) for n in names},
                "raw_runs": raw,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
