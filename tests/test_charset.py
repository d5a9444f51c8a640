"""Charset normalization + charset->lang lookup goldens
(FIXTURES.md §3.1; /root/reference/charset.go:196-222,
/root/reference/lang.go:27-38)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_pkg_spider_spark.functions import charset as cs


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_convert_charset_aliases(spark):
    cases = {
        "utf8": "UTF-8",
        "UTF_8": "UTF-8",
        " utf-8 ": "UTF-8",
        "gb2312": "GBK",
        "gb18030": "GBK",
        "GBK": "GBK",
        "big5-hkscs": "Big5",
        "BIG5": "Big5",
        "shift-jis": "SHIFT_JIS",
        "Shift_JIS": "SHIFT_JIS",
        "EUC-KR": "EUC-KR",
        "": "",
    }
    for raw, want in cases.items():
        assert _one(spark, cs.convert_charset(F.lit(raw))) == want, raw


def test_charset_lang_map(spark):
    for charset, want in [("GBK", "zh"), ("Big5", "zh"), ("SHIFT_JIS", "ja"),
                          ("EUC-KR", "ko"), ("KOI8-R", "ru"), ("UTF-8", None)]:
        assert _one(spark, cs.charset_lang(F.lit(charset))) == want, charset


def test_extract_declared_charset(spark):
    got = _one(spark, cs.extract_declared_charset(F.lit('<meta charset="gb2312">')))
    assert got == "gb2312"


def test_charset_of_fast_path(spark):
    res = _one(spark, cs.charset_of(F.lit("gbk"), F.lit(True)))
    assert res.charset == "UTF-8" and res.charset_pos == "valid"
    res = _one(spark, cs.charset_of(F.lit("gb2312"), F.lit(False)))
    assert res.charset == "GBK" and res.charset_pos == "header"
