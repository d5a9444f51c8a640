"""CEPF-derived quality scoring as pure column math over segment arrays.

Recasts the reference's content-extraction statistics
(/root/reference/extract/content.go:1020-1104) for transcript payloads.
The DOM degenerates to a segment list (SURVEY.md §1.3): transcript lines
≙ text leaves / <p> children, embedded URL spans ≙ <a> children. The
per-node accumulator `countInfo` becomes per-clip scalar columns:

- leaf_list   : per-segment char lengths (normalised-space, rune count)
- text_count  : sum(leaf_list)                (content.go:1056-1058)
- link_text   : chars inside URL spans        (content.go:1036-1038)
- p_count     : number of non-empty segments  (content.go:1040)
- density     : (text-linkText)/(tags-linkTags), zero-guarded
                (content.go:1043-1048)
- leaf_var    : population variance with the n==1 -> x/2 quirk
                (content.go:1086-1088) preserved verbatim
- cepf_score  : ln(sqrt(var+1)) * densitySum * ln(text-linkText+1)
                * log10(p+1)                  (content.go:1067-1077)

Everything is `F.aggregate`/`F.transform` over a split array — one
projection, zero shuffles, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# URL-ish spans inside a transcript play the role of <a> link text.
URL_SPAN_RE = r"(?i)\bhttps?://[^\s]+"


def segments(text: Column) -> Column:
    """Split transcript into trimmed non-empty line segments."""
    segs = F.split(F.coalesce(text, F.lit("")), r"\n")
    segs = F.transform(segs, lambda s: F.trim(F.regexp_replace(s, r"\s+", " ")))
    return F.filter(segs, lambda s: s != "")


def leaf_lengths(segs: Column) -> Column:
    return F.transform(segs, lambda s: F.length(s))


def leaf_variance(leaves: Column) -> Column:
    """computeVar (/root/reference/extract/content.go:1079-1104):
    population variance of leaf lengths; n==0 -> 0; n==1 -> x/2 (quirk
    preserved — it biases single-segment docs low, as the reference
    does).

    The mean is LET-BOUND before the squared-deviation fold: inlined,
    the mean's own O(n) sum re-evaluates once PER ELEMENT inside the
    fold lambda (the Generate/HOF re-eval trap) — O(n^2) per doc."""
    from .expr_utils import let_col

    n = F.size(leaves)
    total = F.aggregate(leaves, F.lit(0.0), lambda acc, x: acc + x)
    sqdev = let_col(
        total / F.when(n > 0, n),
        lambda mean: F.aggregate(
            leaves, F.lit(0.0), lambda acc, x: acc + (x - mean) * (x - mean)
        ),
    )
    return (
        F.when(n == 0, F.lit(0.0))
        .when(n == 1, F.element_at(leaves, 1) / F.lit(2.0))
        .otherwise(sqdev / n)
    )


def density(text_count: Column, link_text: Column, tag_count: Column, link_tag: Column) -> Column:
    """countInfo.Density (/root/reference/extract/content.go:1043-1048):
    (text-linkText)/(tag-linkTag) with the pureLen==0-or-tagLen==0 -> 0
    guard."""
    pure_len = text_count - link_text
    tag_len = tag_count - link_tag
    return F.when((pure_len == 0) | (tag_len == 0), F.lit(0.0)).otherwise(
        pure_len.cast("double") / tag_len
    )


def cepf_score(
    leaf_var: Column, density_sum: Column, text_count: Column, link_text: Column, p_count: Column
) -> Column:
    """computeScore (/root/reference/extract/content.go:1067-1077):
    score = ln(sqrt(var+1)) * densitySum * ln(textCount-linkText+1)
            * log10(pCount+1)."""
    return (
        F.log(F.sqrt(leaf_var + 1.0))
        * density_sum
        * F.log(text_count - link_text + 1.0)
        * F.log10(p_count + 1.0)
    )


def quality_features(text: Column) -> Column:
    """All CEPF-derived features for one transcript in one struct
    (single shared computation — the Spark analog of the reference's
    single-pass computeInfo recursion computing every stat at once,
    SURVEY.md §4 'shared subexpression').

    Every shared subtree is LET-BOUND (expr_utils.let_col): inlined,
    the segs split/regex chain re-embedded in each struct field and the
    text_count fold re-ran per reference — with the var fold's inlined
    mean the worst case was O(n^2) per doc. Lambda-bound values
    evaluate once by construction. NOTE: a caller selecting several
    FIELDS of this struct still copies the whole (now-cheap-inside)
    expression per field — select the struct as ONE column first and
    read fields in a second projection (CollapseProject keeps
    non-cheap multi-referenced aliases)."""
    from .expr_utils import let_col

    def build(segs: Column, link_text: Column, link_tag: Column) -> Column:
        def with_counts(leaves: Column) -> Column:
            p_count = F.size(segs)

            def finish(text_count: Column, var: Column) -> Column:
                # Flat segment tree: root <body> holds P <p> children,
                # one text leaf each; URL spans act as <a> children. A
                # <p> without links has density = len/1 = len; with
                # links, (len-linkChars)/1. The root's DensitySum
                # (content.go:1030 accumulation) therefore reduces
                # EXACTLY to text_count - link_text_count.
                tag_count = p_count + 1 + link_tag
                root_density = density(text_count, link_text, tag_count, link_tag)
                density_sum = (text_count - link_text).cast("double")
                score = cepf_score(var, density_sum, text_count, link_text, p_count)
                link_ratio = F.when(
                    text_count > 0, link_text / text_count
                ).otherwise(F.lit(0.0))
                return F.struct(
                    p_count.alias("seg_count"),
                    text_count.alias("text_count"),
                    link_text.alias("link_text_count"),
                    F.round(link_ratio, 6).alias("link_char_ratio"),
                    F.round(root_density, 6).alias("density"),
                    F.round(var, 6).alias("leaf_var"),
                    F.round(score, 6).alias("cepf_score"),
                )

            text_count = F.aggregate(leaves, F.lit(0), lambda a, x: a + x)
            return let_col(
                text_count,
                lambda tc: let_col(leaf_variance(leaves), lambda v: finish(tc, v)),
            )

        return let_col(leaf_lengths(segs), with_counts)

    # the URL-span extract_all (a full-text regex scan) is itself
    # let-bound: link_text and link_tag both read it
    links_arr = F.regexp_extract_all(
        F.coalesce(text, F.lit("")), F.lit(URL_SPAN_RE), F.lit(0)
    )
    return let_col(
        segments(text),
        lambda segs: let_col(
            links_arr,
            lambda la: let_col(
                F.length(F.array_join(la, "")),
                lambda link_text: let_col(
                    F.size(la), lambda link_tag: build(segs, link_text, link_tag)
                ),
            ),
        ),
    )
