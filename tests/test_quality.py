"""CEPF quality-score goldens (FIXTURES.md §3.4) — hand-computed against
/root/reference/extract/content.go:1067-1104 semantics, incl. the n==1
variance = x/2 quirk and the density zero-guard."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from go_pkg_spider_spark.functions import quality as q


def _feat(spark, text):
    return spark.range(1).select(q.quality_features(F.lit(text)).alias("f")).collect()[0].f


def test_uniform_segments(spark):
    # three segments of 10 chars each: var=0, text=30, p=3
    text = "aaaaaaaaaa\nbbbbbbbbbb\ncccccccccc"
    f = _feat(spark, text)
    assert f.seg_count == 3
    assert f.text_count == 30
    assert f.link_text_count == 0
    assert abs(f.leaf_var - 0.0) < 1e-9
    want = math.log(math.sqrt(0 + 1)) * 30.0 * math.log(31.0) * math.log10(4.0)
    assert abs(f.cepf_score - want) < 1e-4  # ln(1)=0 -> score 0
    assert f.cepf_score == 0.0


def test_varied_segments_score(spark):
    # lengths 4, 20: mean 12, var = ((4-12)^2+(20-12)^2)/2 = 64
    text = "abcd\n" + "x" * 20
    f = _feat(spark, text)
    assert f.seg_count == 2 and f.text_count == 24
    assert abs(f.leaf_var - 64.0) < 1e-9
    want = math.log(math.sqrt(65.0)) * 24.0 * math.log(25.0) * math.log10(3.0)
    assert abs(f.cepf_score - round(want, 6)) < 1e-5


def test_single_segment_variance_quirk(spark):
    # n==1 -> var = x/2 (content.go:1086-1088)
    f = _feat(spark, "x" * 10)
    assert f.seg_count == 1
    assert abs(f.leaf_var - 5.0) < 1e-9


def test_empty_and_whitespace(spark):
    f = _feat(spark, "")
    assert f.seg_count == 0 and f.text_count == 0 and f.cepf_score == 0.0
    f = _feat(spark, "   \n\n  ")
    assert f.seg_count == 0


def test_link_dominated_density(spark):
    text = "see https://example.com/a/b/c now"
    f = _feat(spark, text)
    assert f.link_text_count > 0
    assert f.link_char_ratio > 0.5


def test_null_text(spark):
    row = spark.sql("select cast(null as string) t").select(
        q.quality_features(F.col("t")).alias("f")
    ).collect()[0].f
    assert row.seg_count == 0
