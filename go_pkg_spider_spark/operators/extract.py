"""Top-level extraction operators — the Spark recast of the reference's
two public entry points:

- extract_news: GetNews / ExtractNews (§3.1 of SURVEY.md;
  /root/reference/spider.go:162-263 -> extract/content.go:194-308) —
  per-row title/time/content extraction over transcript payloads.
- profile_domains: DetectDomain (§3.2; /root/reference/detect.go:
  101-254) — per-site profile aggregation over a page/clip table.

Both are compositions of the already-tested column functions — one
narrow projection for extract_news; one groupBy for profile_domains.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import dates, icp, langid, quality, simtext
from ..functions.domain import meta_from_host
from ..functions.textnorm import (
    normalise_space,
    strip_markup,
    truncate_title,
    web_title_clean,
)


def pick_title(text: Column, meta_title: Column, lang: Column) -> Column:
    """getTitle cascade (/root/reference/extract/content.go:844-949)
    re-targeted to transcript payloads (no DOM: the 'h1/h2' candidates
    are the transcript's segments):

    1. 'headline': first segment when it similarity-matches the cleaned
       meta title above the per-lang threshold (the h-tag argmax A11)
    2. 'content': best-matching segment anywhere in the body
       (getTitleByEditDistance :956-978)
    3. 'title': fall back to the meta title itself (:946-948)

    Returns struct(title, title_pos). ONE fused Python hop
    (simtext.pick_title_udf) — the unfused form made 3 ArrowEvalPython
    nodes in a single projection."""
    cleaned_meta = web_title_clean(truncate_title(meta_title), lang)
    thr = simtext.title_sim_threshold(lang)
    return simtext.pick_title_udf(
        quality.segments(text), cleaned_meta, thr.cast("double")
    )


def extract_news(
    df: DataFrame,
    text_col: str = "transcript",
    title_col: str | None = None,
    lang_col: str | None = None,
    run_date: str = "2024-10-08",
) -> DataFrame:
    """News-record extraction (the News struct, content.go:117-136):
    adds (title, title_pos, time_raw, time_pos, time, content) columns.
    One narrow projection; the similarity UDF is the only Python hop."""
    text = strip_markup(F.col(text_col))
    lang = (
        F.col(lang_col)
        if lang_col
        else F.coalesce(langid.body_lang_rules(text)["lang"], F.lit("en"))
    )
    meta_title = (
        F.col(title_col) if title_col else F.coalesce(F.try_element_at(quality.segments(text), F.lit(1)), F.lit(""))
    )

    t = pick_title(text, meta_title, lang)
    raw = dates.extract_publish_date_raw(text)
    ts = dates.to_timestamp_cascade(raw["raw"], run_date)
    content = normalise_space(text)
    return (
        df.withColumn("title", t["title"])
        .withColumn("title_pos", t["title_pos"])
        .withColumn("time_raw", raw["raw"])
        .withColumn("time_pos", raw["kind"])
        .withColumn("time", ts)
        .withColumn("content", content)
    )


def profile_domains(
    pages: DataFrame,
    host_col: str = "host",
    text_col: str = "transcript",
    lang_col: str = "lang",
    link_type_col: str | None = "link_type",
) -> DataFrame:
    """DetectDomain's DomainRes (detect.go:14-49) as a per-host
    aggregation: dominant lang, country/province/category (J4 host
    meta), ICP licence (first non-empty), content/list counts (A7),
    page count. One shuffle on host; host-meta and ICP are computed
    per-row pre-aggregation (cheap columns)."""
    host = F.col(host_col)
    meta = meta_from_host(host, F.col(lang_col))
    icp_res = icp.icp_extract(F.col(text_col))

    enriched = pages.withColumn("_meta", meta).withColumn("_icp", icp_res)
    aggs = [
        F.count(F.lit(1)).alias("page_count"),
        F.mode(F.col(lang_col)).alias("lang"),
        F.max_by(F.col("_meta"), F.length(F.col("_meta")["country"])).alias("_m"),
        F.max_by(F.col("_icp"), F.length(F.col("_icp")["icp"])).alias("_i"),
    ]
    if link_type_col:
        aggs += [
            F.sum((F.col(link_type_col) == "content").cast("long")).alias("content_count"),
            F.sum((F.col(link_type_col) == "list").cast("long")).alias("list_count"),
        ]
    out = enriched.groupBy(host.alias("host")).agg(*aggs)
    return out.select(
        "host",
        "page_count",
        "lang",
        F.col("_m")["country"].alias("country"),
        F.col("_m")["province"].alias("province"),
        F.col("_m")["category"].alias("category"),
        F.col("_i")["icp"].alias("icp"),
        F.col("_i")["province"].alias("icp_province"),
        *([c for c in ("content_count", "list_count")] if link_type_col else []),
    )
