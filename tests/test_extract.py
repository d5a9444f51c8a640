"""extract_news / profile_domains — the GetNews & DetectDomain analogs."""

from __future__ import annotations

import datetime

from go_pkg_spider_spark.operators import extract


def test_extract_news(spark):
    rows = [
        (
            "c1",
            "重要新闻事件的详细报道标题\n发布时间: 2022-09-02 11:40:53\n"
            "记者在现场进行了详细的报道，专家表示这一事件具有重要意义。",
        ),
        ("c2", "Some Long Report Title Here\nBody text follows the title with detail. "
               "It was published on 8/30/2022 11:11:11 according to the site."),
        ("c3", "no title no date just plain text"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, transcript string")
    out = {r.clip_id: r for r in extract.extract_news(df).collect()}

    r1 = out["c1"]
    assert r1.title == "重要新闻事件的详细报道标题"
    assert r1.time == datetime.datetime(2022, 9, 2, 11, 40, 53)
    assert r1.time_pos == "zh_prefixed"

    r2 = out["c2"]
    assert r2.title.startswith("Some Long Report Title")
    assert r2.time == datetime.datetime(2022, 8, 30, 11, 11, 11)
    assert r2.time_pos == "en_us"

    assert out["c3"].time is None


def test_profile_domains(spark):
    rows = [
        ("news.gov.hk", "香港政府新闻网正式发布的内容信息", "zh", "content"),
        ("news.gov.hk", "另一条新闻内容粤ICP备17055554号", "zh", "content"),
        ("news.gov.hk", "列表页面", "zh", "list"),
        ("lemonde.fr", "les nouvelles du jour en france", "fr", "content"),
    ]
    df = spark.createDataFrame(rows, "host string, transcript string, lang string, link_type string")
    out = {r.host: r for r in extract.profile_domains(df).collect()}

    hk = out["news.gov.hk"]
    assert hk.page_count == 3 and hk.lang == "zh"
    assert (hk.country, hk.province, hk.category) == ("中国", "中国香港", "政务")
    assert hk.icp == "粤ICP备17055554" and hk.icp_province == "广东"
    assert hk.content_count == 2 and hk.list_count == 1

    fr = out["lemonde.fr"]
    assert fr.country == "法国" and fr.icp == ""


def test_extract_news_empty_transcript_no_ansi_crash(spark):
    """ANSI regression: empty/whitespace transcripts produce an empty
    segments array; bare element_at threw under Spark 4 ANSI mode."""
    df = spark.createDataFrame(
        [("c1", ""), ("c2", "   \n  "), ("c3", "A real segment\nwith body text here")],
        "clip_id string, transcript string",
    )
    out = {r.clip_id: r for r in extract.extract_news(df).collect()}
    assert out["c1"].title == "" and out["c2"].title == ""
    assert out["c3"].title is not None


def test_extract_news_single_python_hop(spark):
    """pick_title is ONE fused struct UDF: the unfused cascade carried
    three ArrowEvalPython nodes in a single projection (the measured
    ~85%-kernel-time topology)."""
    df = spark.createDataFrame(
        [("c1", "Title line\nbody text here with details")],
        "clip_id string, transcript string",
    )
    plan = extract.extract_news(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
