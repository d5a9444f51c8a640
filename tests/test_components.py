"""Connected components (min-label propagation) + the pure-column
md5-u64 hash twin."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from go_pkg_spider_spark.functions import tokens
from go_pkg_spider_spark.operators import components


def _cc(spark, edges, nodes=None, **kw):
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    n = (
        spark.createDataFrame([(x,) for x in nodes], "id long")
        if nodes is not None
        else None
    )
    return {
        r.id: r.component
        for r in components.connected_components(e, nodes=n, **kw).collect()
    }


def test_two_components_and_singletons(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)], nodes=[1, 2, 3, 10, 11, 99])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_chain_needs_multiple_rounds(spark):
    """A length-6 path: the min label must walk the whole diameter
    (several propagation rounds + the convergence early-exit)."""
    edges = [(i, i + 1) for i in range(1, 7)]
    got = _cc(spark, edges)
    assert got == {i: 1 for i in range(1, 8)}


def test_edge_direction_irrelevant(spark):
    assert _cc(spark, [(5, 2), (2, 9)]) == {2: 2, 5: 2, 9: 2}


def test_max_iter_bounds_work(spark):
    # a triangle converges in one round even with max_iter=1
    got = _cc(spark, [(1, 2), (2, 3), (1, 3)], max_iter=2)
    assert got == {1: 1, 2: 1, 3: 1}


def test_md5_u64_le_matches_hashlib(spark):
    df = spark.range(50).select(tokens.md5_u64_le(F.col("id")).alias("h"), "id")
    for r in df.collect():
        want = int.from_bytes(
            hashlib.md5(str(r.id).encode()).digest()[:8], "little"
        )
        assert int(r.h) == want
