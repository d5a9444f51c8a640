"""Optimization-round measurement workbench (guide §1.1/§1.4/§1.5).

bench.py is FROZEN for driver measurement; this file is the round's
iteration harness. It isolates chosen entries with the noop sink at a
chosen SF, times min-of-N with the same ABBA interleave as bench.py,
labels jobs, and can dump `.explain("formatted")` plans for the
plans/r09 evidence files.

Usage:
  python bench_extra.py [--sf-dir /root/testdata/sf1.0] [--passes 3]
      [--entries name1,name2] [--plans-dir plans/r09] [--plans-suffix _before]
      [--no-time]

Environment mirrors bench.py: SPARK_GRAFT_CPUS (default 32),
session conf identical to the frozen bench (shuffle=max(cpus,8),
maxPartitionBytes=32m) so numbers are comparable with driver runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def explain_formatted(df) -> str:
    qe = df._jdf.queryExecution()
    try:
        jvm = df.sparkSession._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        return qe.explainString(mode)
    except Exception:
        return qe.executedPlan().toString()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--entries", default=None, help="comma list; default = all queries()")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--plans-suffix", default="_before")
    ap.add_argument("--no-time", action="store_true", help="plans only, no timing")
    ap.add_argument("--out", default=None, help="write JSON results to this path")
    args = ap.parse_args()

    from go_pkg_spider_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        extra_conf={"spark.sql.files.maxPartitionBytes": "32m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = list(qs) if args.entries is None else args.entries.split(",")
    for n in names:
        if n not in qs:
            raise SystemExit(f"unknown entry: {n}")

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)
        for n in names:
            df = qs[n](spark, args.sf_dir)
            p = os.path.join(args.plans_dir, f"{n}{args.plans_suffix}.txt")
            with open(p, "w", encoding="utf-8") as f:
                f.write(explain_formatted(df))
        print(f"wrote {len(names)} plans to {args.plans_dir}", file=sys.stderr)

    if args.no_time:
        spark.stop()
        return

    # warm-up pass (uncounted): JIT/codegen/Arrow pool init
    for n in names:
        spark.sparkContext.setJobDescription(f"warmup:{n}")
        _noop(qs[n](spark, args.sf_dir))

    raw: dict[str, list[float]] = {n: [] for n in names}
    for p in range(args.passes):
        order = names if p % 3 == 0 else list(reversed(names))
        for n in order:
            spark.sparkContext.setJobDescription(f"time:{n}:pass{p}")
            t0 = time.monotonic()
            _noop(qs[n](spark, args.sf_dir))
            raw[n].append(round(time.monotonic() - t0, 3))
    mins = {n: min(raw[n]) for n in names}
    result = {
        "sf_dir": args.sf_dir,
        "cpus": CPUS,
        "passes": args.passes,
        "mins": mins,
        "raw": raw,
        "total_min": round(sum(mins.values()), 3),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
