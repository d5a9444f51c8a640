"""Publish-date cascade goldens (FIXTURES.md §3.5 date spans;
/root/reference/extract/content.go:23-68, spider_test.go:281-286)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from go_pkg_spider_spark.functions import dates

RUN_DATE = "2024-10-08"  # reference snapshot date, injected (determinism)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_cascade_priority(spark):
    # zh-prefixed beats a bare date appearing earlier
    t = "更新于 2021-01-01 … 发布时间: 2022-09-02 11:40:53 完"
    r = _one(spark, dates.extract_publish_date_raw(F.lit(t)))
    assert r.kind == "zh_prefixed" and "2022-09-02 11:40:53" in r.raw

    r = _one(spark, dates.extract_publish_date_raw(F.lit("on 8/30/2022 11:11:11 ok")))
    assert r.kind == "en_us"

    r = _one(spark, dates.extract_publish_date_raw(F.lit("posted 02 Sep 2022 11:40 pm")))
    assert r.kind == "en_dmy"

    r = _one(spark, dates.extract_publish_date_raw(F.lit("Sep 02, 2022 news")))
    assert r.kind == "en_mdy"

    r = _one(spark, dates.extract_publish_date_raw(F.lit("发布于09-02 11:40")))
    assert r.kind == "noyear"

    assert _one(spark, dates.extract_publish_date_raw(F.lit("no dates here"))) is None


def test_zh_date_normalization_and_parse(spark):
    ts = _one(
        spark,
        dates.to_timestamp_cascade(F.lit("2022年9月2日 11点40分53秒"), RUN_DATE),
    )
    assert ts == datetime.datetime(2022, 9, 2, 11, 40, 53)


def test_sanity_case_spider_test(spark):
    # spider_test.go:282-285 sanity string
    ts = _one(
        spark, dates.to_timestamp_cascade(F.lit("2022-05-26 17:00:57"), RUN_DATE)
    )
    assert ts == datetime.datetime(2022, 5, 26, 17, 0, 57)


def test_noyear_gets_run_date_year(spark):
    ts = _one(spark, dates.to_timestamp_cascade(F.lit("9-2 11:40"), RUN_DATE))
    assert ts == datetime.datetime(2024, 9, 2, 11, 40)


def test_zone_and_garbage_tails_dropped(spark):
    ts = _one(
        spark,
        dates.to_timestamp_cascade(F.lit("2022-05-26 17:00:57+08:00"), RUN_DATE),
    )
    assert ts == datetime.datetime(2022, 5, 26, 17, 0, 57)
    # RegexFormatTime3: bad :NNN tail
    ts = _one(spark, dates.to_timestamp_cascade(F.lit("2022-05-26 17:00:573"), RUN_DATE))
    assert ts is not None


def test_longest_wins(spark):
    t = "a 2022-09-02 b 2022-09-02 11:40:53 c"
    got = _one(spark, dates.longest_date(F.lit(t)))
    assert got.startswith("2022-09-02 11:40:53")


def test_nearest_to_anchor(spark):
    t = "2020-01-01 xxxx TITLE yyy 2022-09-02 zzz"
    got = _one(spark, dates.nearest_date_to_anchor(F.lit(t), F.lit("TITLE")))
    assert got.startswith("2022-09-02")


def test_max_plausible_timestamp(spark):
    # future date (> run_date+1d) excluded; max of the plausible wins.
    # The reference's A10 loop has a never-updated accumulator bug
    # (content.go:577-583) making it first-match; we pin the FIXED
    # (true-max) semantics here (SURVEY.md §7 decision).
    t = "old 2020-01-01 12:00:00 mid 2023-03-03 03:03:03 future 2031-01-01 00:00:00"
    ts = _one(spark, dates.max_plausible_timestamp(F.lit(t), RUN_DATE))
    assert ts == datetime.datetime(2023, 3, 3, 3, 3, 3)


def test_wx_script_time(spark):
    ts = _one(spark, dates.wx_script_time(F.lit('var ct = "1670000000";')))
    assert ts == datetime.datetime(2022, 12, 2, 16, 53, 20)
