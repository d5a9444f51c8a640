"""Byte-level charset detection — the full Charset() flow
(/root/reference/charset.go:38-101) for binary text payloads, as a
vectorized pandas UDF.

Decision order (charset.go semantics):
1. valid UTF-8 -> ("UTF-8", "valid") fast path          charset.go:43-47
2. declared charset in the payload (RegexCharset over the HTML4/HTML5
   meta shapes) -> normalized, ("X", "html")            charset.go:112-180
3. header/codec declaration -> ("X", "header")          charset.go:80-101
4. statistical guess -> ("X", "guess")                  charset.go:183-193
   (chardet slot X5: charset_normalizer when importable, else a
   deterministic BOM + try-decode cascade over the CharsetLangMap
   encodings; both normalized through convert_charset aliases)

Returns struct(charset, charset_pos, decoded_text). Runs inside the
decode stage so the payload is examined exactly once.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

try:  # optional, import-gated (X5 model slot)
    import charset_normalizer as _cn  # type: ignore
except Exception:  # noqa: BLE001
    _cn = None

# charset.go:21-23 (bytes-level, ascii-compatible prefix scan)
_RE_HTML5 = re.compile(rb"(?i)<meta\s+charset\s*=\s*[\"']?([a-z][_\-0-9a-z]*)")
_RE_HTML4 = re.compile(
    rb"(?i)<meta\s+[^>]*http-equiv=[\"']?content-type[\"']?[^>]*>"
)
_RE_CHARSET = re.compile(rb"(?i)charset=\s*[\"']?([a-z][_\-0-9a-z]*)")

# try-decode guess order: strict CJK/cyrillic codecs, most-restrictive
# first; scored by the share of decoded chars in the codec's target
# script (deterministic — no ML model needed for the fixture families)
_GUESS_ORDER = (
    ("SHIFT_JIS", "shift_jis"),
    ("EUC-KR", "euc_kr"),
    ("EUC-JP", "euc_jp"),
    ("Big5", "big5"),
    ("GBK", "gb18030"),
    ("KOI8-R", "koi8_r"),
)

_SCRIPT_RANGES = {
    "SHIFT_JIS": ((0x3040, 0x30FF), (0x4E00, 0x9FFF)),
    "EUC-JP": ((0x3040, 0x30FF), (0x4E00, 0x9FFF)),
    "EUC-KR": ((0xAC00, 0xD7AF),),
    "Big5": ((0x4E00, 0x9FFF),),
    "GBK": ((0x4E00, 0x9FFF),),
    "KOI8-R": ((0x0400, 0x04FF),),
}

_PY_CODEC = {
    "UTF-8": "utf-8",
    "GBK": "gb18030",
    "Big5": "big5",
    "SHIFT_JIS": "shift_jis",
    "EUC-KR": "euc_kr",
    "EUC-JP": "euc_jp",
    "KOI8-R": "koi8_r",
    "ISO-8859-1": "latin-1",
    # BOM-guessed payloads must decode (the python utf-16 codec consumes
    # the BOM the guesser keyed on)
    "UTF-16": "utf-16",
}


def convert_charset_py(c: str) -> str:
    """convertCharset (charset.go:196-222) in Python (same aliases as
    the column version in charset.py)."""
    c = (c or "").strip().upper()
    if not c:
        return ""
    if c in ("UTF8", "UTF_8"):
        return "UTF-8"
    if c.startswith("GB"):
        return "GBK"
    if c.startswith("BIG5"):
        return "Big5"
    if c.startswith("SHIFT"):
        return "SHIFT_JIS"
    # detector-output aliases (chardet/charset_normalizer report MS
    # codepage names for the same families)
    ms = {
        "CP932": "SHIFT_JIS", "MS932": "SHIFT_JIS", "WINDOWS-31J": "SHIFT_JIS",
        "CP936": "GBK", "MS936": "GBK", "CP950": "Big5",
        "CP949": "EUC-KR", "UHC": "EUC-KR", "MS949": "EUC-KR",
    }
    return ms.get(c, c)


def _script_share(text: str, ranges) -> float:
    if not text:
        return 0.0
    hits = sum(1 for ch in text if any(a <= ord(ch) <= b for a, b in ranges))
    return hits / len(text)


def _guess(data: bytes) -> str:
    """chardet slot (charset.go:183-193)."""
    if data.startswith(b"\xff\xfe") or data.startswith(b"\xfe\xff"):
        return "UTF-16"
    # deterministic try-decode cascade first (known CJK/cyrillic
    # families, scored by target-script share)
    best_name, best_score = "", 0.0
    for name, codec in _GUESS_ORDER:
        try:
            text = data.decode(codec)
        except Exception:  # noqa: BLE001
            continue
        score = _script_share(text, _SCRIPT_RANGES[name])
        if score > best_score + 1e-9:
            best_name, best_score = name, score
    if best_name and best_score >= 0.2:
        return best_name
    # statistical fallback (the chardet slot X5)
    if _cn is not None:
        best = _cn.from_bytes(data).best()
        if best and best.encoding:
            return convert_charset_py(best.encoding.upper())
    return best_name


def sniff_charset(data: bytes | None, declared: str | None = None) -> tuple[str, str, str | None]:
    """Full Charset() decision; returns (charset, pos, decoded_text)."""
    if not data:
        return "", "", None
    try:
        return "UTF-8", "valid", data.decode("utf-8")
    except UnicodeDecodeError:
        pass
    # embedded declaration (html5 then html4-nested, charset.go:112-180;
    # first-occurrence tie-break :161-175 — scan order implements it)
    m5 = _RE_HTML5.search(data)
    m4 = _RE_HTML4.search(data)
    decl = None
    if m5 and (not m4 or m5.start() <= m4.start()):
        decl = m5.group(1)
    elif m4:
        inner = _RE_CHARSET.search(m4.group(0))
        if inner:
            decl = inner.group(1)
    c_html = convert_charset_py(decl.decode("ascii", "ignore")) if decl else ""
    c_header = convert_charset_py(declared) if declared else ""
    # CharsetFromHeaderHtml conflict rule (charset.go:70-106): only one
    # present -> it wins; both equal -> header; both differ -> html wins
    # ONLY when the header is an ISO/WINDOWS family, else header wins.
    if c_header and not c_html:
        picks = [(c_header, "header")]
    elif c_html and not c_header:
        picks = [(c_html, "html")]
    elif c_header and c_html:
        if c_header == c_html:
            picks = [(c_header, "header")]
        elif c_header.startswith("ISO") or c_header.startswith("WINDOWS"):
            picks = [(c_html, "html"), (c_header, "header")]
        else:
            picks = [(c_header, "header"), (c_html, "html")]
    else:
        picks = []
    # decode-fallback is ours (the reference decides the label without
    # decoding): if the winner's codec can't decode the payload, try the
    # loser, then the statistical guess.
    for cs, pos in picks:
        text = _try_decode(data, cs)
        if text is not None:
            return cs, pos, text
    cs = _guess(data)
    if cs:
        return cs, "guess", _try_decode(data, cs)
    return "", "", None


def _try_decode(data: bytes, charset: str) -> str | None:
    codec = _PY_CODEC.get(charset)
    if codec is None:
        return None
    try:
        return data.decode(codec)
    except Exception:  # noqa: BLE001
        return None


SNIFF_SCHEMA = StructType(
    [
        StructField("charset", StringType()),
        StructField("charset_pos", StringType()),
        StructField("decoded_text", StringType()),
    ]
)


@F.pandas_udf(SNIFF_SCHEMA)
def sniff_charset_udf(data: pd.Series, declared: pd.Series) -> pd.DataFrame:
    rows = [sniff_charset(b, d) for b, d in zip(data, declared)]
    return pd.DataFrame(rows, columns=["charset", "charset_pos", "decoded_text"])
