"""Domain parse + host-meta goldens, re-targeted from
/root/reference/extract/domain_test.go:8-58 and meta_test.go:5-17."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_pkg_spider_spark.functions import domain


def _parse(spark, host):
    r = spark.range(1).select(domain.domain_parse(F.lit(host)).alias("d")).collect()[0].d
    return None if r is None else (r.subdomain, r.domain, r.tld)


def _top(spark, host):
    return spark.range(1).select(domain.domain_top(F.lit(host)).alias("t")).collect()[0].t


def test_domain_parse_fixtures(spark):
    # domain_test.go fixture list with publicsuffix-derived expectations
    cases = {
        # net.cn is a public suffix -> etld+1('www.net.cn') = www.net.cn
        # (matches golang.org/x/net/publicsuffix behavior)
        "www.net.cn": ("", "www", "net.cn"),
        "hi.chinanews.com": ("hi", "chinanews", "com"),
        "a.wh.cn": ("a", "wh", "cn"),
        "siat.ac.cn": ("", "siat", "ac.cn"),
        "abc.spring.io": ("abc", "spring", "io"),
        "www.china-embassy.or.jp": ("www", "china-embassy", "or.jp"),
        "legismac.safp.gov.mo": ("legismac", "safp", "gov.mo"),
        "www.gov.cn": ("", "www", "gov.cn"),
        "scopsr.gov.cn": ("", "scopsr", "gov.cn"),
        "usa.gov": ("", "usa", "gov"),
        "bbc.co.uk": ("", "bbc", "co.uk"),
        "dealer.auto.sohu.com": ("dealer.auto", "sohu", "com"),
        "bbs.sohu.com": ("bbs", "sohu", "com"),
    }
    for host, want in cases.items():
        assert _parse(spark, host) == want, host


def test_domain_top(spark):
    assert _top(spark, "bbs.sohu.com") == "sohu.com"
    assert _top(spark, "bbc.co.uk") == "bbc.co.uk"
    assert _top(spark, "legismac.safp.gov.mo") == "safp.gov.mo"
    assert _top(spark, "localhost") is None  # single label -> invalid


def _meta(spark, host, lang):
    r = (
        spark.range(1)
        .select(domain.meta_from_host(F.lit(host), F.lit(lang)).alias("m"))
        .collect()[0]
        .m
    )
    return (r.country, r.province, r.category)


def test_meta_from_host(spark):
    # meta_test.go-shaped goldens (meta.go:89-183 semantics)
    assert _meta(spark, "usa.gov", "en") == ("美国", "", "政务")
    # HostGovCountryMap (meta.go:7-72) has NO 'cn' key, so gov.cn hosts
    # fall through to the .cn+zh rule with empty category — reference
    # quirk preserved
    assert _meta(spark, "scopsr.gov.cn", "zh") == ("中国", "", "")
    assert _meta(spark, "legismac.safp.gov.mo", "zh") == ("中国", "中国澳门", "政务")
    assert _meta(spark, "news.gov.hk", "zh") == ("中国", "中国香港", "政务")
    assert _meta(spark, "www.sina.cn", "zh") == ("中国", "", "")
    assert _meta(spark, "asahi.or.jp", "ja") == ("日本", "", "")
    assert _meta(spark, "bbc.co.uk", "en") == ("英国", "", "")
    assert _meta(spark, "lemonde.fr", "fr") == ("法国", "", "")
    assert _meta(spark, "example.com", "en") == ("", "", "")
    # lang mismatch -> no country inference (conjunction rule)
    assert _meta(spark, "bbc.co.uk", "fr") == ("", "", "")
