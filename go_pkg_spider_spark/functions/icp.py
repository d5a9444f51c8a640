"""ICP licence extraction (/root/reference/extract/icp.go) as column
expressions: the regex trio with priority order (ICP -> 公网安备 ->
B2-), province capture, and the ProvinceShortMap lookup (J5 map-literal
join, SURVEY.md §2.3)."""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, functions as F

# /root/reference/extract/icp.go:12-53
PROVINCE_SHORT_MAP: dict[str, str] = {
    "京": "北京", "津": "天津", "沪": "上海", "渝": "重庆", "黑": "黑龙江",
    "吉": "吉林", "辽": "辽宁", "冀": "河北", "豫": "河南", "鲁": "山东",
    "晋": "山西", "陕": "陕西", "秦": "陕西", "蒙": "内蒙古", "宁": "宁夏",
    "陇": "甘肃", "甘": "甘肃", "新": "新疆", "青": "青海", "藏": "西藏",
    "鄂": "湖北", "皖": "安徽", "苏": "江苏", "浙": "浙江", "闽": "福建",
    "湘": "湖南", "赣": "江西", "川": "四川", "蜀": "四川", "黔": "贵州",
    "贵": "贵州", "滇": "云南", "云": "云南", "粤": "广东", "桂": "广西",
    "琼": "海南", "港": "中国香港", "澳": "中国澳门", "台": "中国台湾",
}

_PROV = "(京|津|冀|晋|蒙|辽|吉|黑|沪|苏|浙|皖|闽|赣|鲁|豫|鄂|湘|粤|桂|琼|川|蜀|贵|黔|云|滇|渝|藏|陇|甘|陕|秦|青|宁|新)"
# /root/reference/extract/icp.go:56-58 (Go had (?i); all-CJK so case-free)
REGEX_ICP = _PROV + "ICP(备|证|备案)?[0-9]+"
REGEX_ICP_GA = _PROV + "公网安备[0-9]+"
REGEX_ICP_DX = _PROV + "B2-[0-9]+"


def _norm(text: Column) -> Column:
    """Icp() body normalization (icp.go:72-77): remove lines, tabs,
    spaces."""
    c = F.regexp_replace(F.coalesce(text, F.lit("")), r"[\r\n]+", " ")
    return F.regexp_replace(c, r"[\t ]", "")


def icp_extract(text: Column) -> Column:
    """IcpFromText (icp.go:84-111): priority ICP > 公网安备 > B2-;
    returns struct(icp, loc_short, province)."""
    t = _norm(text)
    icp1 = F.regexp_extract(t, REGEX_ICP, 0)
    icp2 = F.regexp_extract(t, REGEX_ICP_GA, 0)
    icp3 = F.regexp_extract(t, REGEX_ICP_DX, 0)
    loc1 = F.regexp_extract(t, REGEX_ICP, 1)
    loc2 = F.regexp_extract(t, REGEX_ICP_GA, 1)
    loc3 = F.regexp_extract(t, REGEX_ICP_DX, 1)
    icp = F.when(icp1 != "", icp1).when(icp2 != "", icp2).when(icp3 != "", icp3).otherwise(F.lit(""))
    loc = F.when(icp1 != "", loc1).when(icp2 != "", loc2).when(icp3 != "", loc3).otherwise(F.lit(""))
    m = F.create_map(
        *[F.lit(x) for x in chain.from_iterable(PROVINCE_SHORT_MAP.items())]
    )
    prov = F.coalesce(m[loc], F.lit(""))
    return F.struct(icp.alias("icp"), loc.alias("loc_short"), prov.alias("province"))
