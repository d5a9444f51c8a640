"""Measure the multi-chunk GEMM serve with and without the persisted
index projection (round 8, VERDICT r7 #4): each probe chunk is its own
mapInPandas branch over the cell-assigned index, so a C-chunk serve
scans the index C times unless the projection is cached.

Uses the committed sf1 ANN artifacts (tools/sf1_headline.py phase_ann:
500k-vector index at /tmp/ann_sf1/index with precomputed cells — the
production serve shape — and the 2,000-query batch). The chunk cap is
forced down to 2,000 probe rows so 2,000 queries x n_probe=8 = 16,000
probe rows split into 8 chunks.

Protocol: ABBA interleave (persist / no-persist / no-persist / persist
x rounds), min-of-N per arm — the multi-tenant-host rule from
tools/scaling_bench.py. Appends nothing; prints one JSON line for
BENCH/BASELINE.md.

Usage: python tools/gemm_chunk_bench.py [rounds=2]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from go_pkg_spider_spark.operators import similarity
from go_pkg_spider_spark.session import get_spark

INDEX = "/tmp/ann_sf1/index"
CENTROIDS = "/tmp/ann_sf1/centroids"
QUERIES = "/tmp/ann_queries_sf1.parquet"
CHUNK_CAP = 2_000  # 16k probe rows -> 8 chunks
N_PROBE = 8
K = 10


def _serve(spark, persist: bool) -> tuple[float, int]:
    from pyspark.sql import functions as F

    idx = spark.read.parquet(INDEX)
    cents_rows = (
        spark.read.parquet(CENTROIDS).orderBy("cell", "pos").collect()
    )
    k_cells = max(r["cell"] for r in cents_rows) + 1
    dim = max(r["pos"] for r in cents_rows) + 1
    cents = [[0.0] * dim for _ in range(k_cells)]
    for r in cents_rows:
        cents[r["cell"]][r["pos"]] = float(r["val"])
    q = spark.read.parquet(QUERIES).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    t0 = time.monotonic()
    out = similarity.ivf_topk_batch_gemm(
        idx,
        q,
        "embedding",
        "vec_id",
        "qid",
        cents,
        k=K,
        n_probe=N_PROBE,
        cell_col="cell",
        max_probe_rows_per_chunk=CHUNK_CAP,
        persist_index_across_chunks=persist,
    )
    n = out.count()
    wall = time.monotonic() - t0
    released = similarity.release_serve_caches()
    assert released == (1 if persist else 0), released
    return wall, n


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark(app_name="gemm-chunk-bench")
    spark.sparkContext.setLogLevel("ERROR")
    walls = {True: [], False: []}
    n_rows = None
    for _ in range(rounds):
        for persist in (True, False, False, True):  # ABBA
            w, n = _serve(spark, persist)
            walls[persist].append(round(w, 2))
            if n_rows is None:
                n_rows = n
            assert n == n_rows, "row-count drift between arms"
    print(
        json.dumps(
            {
                "index_rows": spark.read.parquet(INDEX).count(),
                "queries": 2000,
                "n_probe": N_PROBE,
                "chunk_cap": CHUNK_CAP,
                "chunks": 8,
                "topk_rows": n_rows,
                "persist_walls_sec": walls[True],
                "nopersist_walls_sec": walls[False],
                "persist_min": min(walls[True]),
                "nopersist_min": min(walls[False]),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
