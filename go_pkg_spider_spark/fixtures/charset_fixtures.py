"""Fixture corpus for the charset statistical-guess value oracle
(`charset_guess_docs`) — the last model slot (F4/X5,
charset_bytes._guess + the header/html alias folds) under the driver
hash gate.

Unlike the audio fixtures there is NO frozen derived table: every
row's expectation is written BY CONSTRUCTION — the payload is a known
text encoded with a known codec, so (charset, charset_pos,
decoded_text) are ground truth independent of the sniffer. If the
guesser ever misidentifies a family or an alias fold drifts, the
oracle goes red.

Reference semantics: charset.go:183-193 (statistical guess slot),
charset.go:196-222 (convertCharset alias folds, incl. the MS-codepage
detector aliases), lang.go:27-38 (the CharsetLangMap encodings the
families cover).

Determinism: every row resolves either before the guess step or inside
the deterministic try-decode cascade (score >= 0.2 in the target
script) — no row may reach the charset_normalizer fallback, whose
answer depends on the installed library version.
tests/test_charset_fixtures.py asserts this by re-deriving with the
fallback monkeypatched to explode.
"""

from __future__ import annotations

# Script-pure sample texts (ground truth for the guess families).
ZH_SIMP = "汉语国家标准编码字符集测试文本内容数据处理系统程序设计"
ZH_TRAD = "繁體中文測試資料內容編碼系統網頁瀏覽器應用程式開發"
JA_TEXT = "日本語のテキストエンコーディング試験データです文字集合"
KO_TEXT = "한국어인코딩시험자료입니다안녕하세요문자집합검사"
RU_TEXT = "русскийтекстпроверкакодировкиданныхсистемы"

_GB = ZH_SIMP.encode("gb18030")
_B5 = ZH_TRAD.encode("big5")
_SJ = JA_TEXT.encode("shift_jis")
_EJ = JA_TEXT.encode("euc_jp")
_EK = KO_TEXT.encode("euc_kr")
_KR8 = RU_TEXT.encode("koi8_r")

_HTML5_GB = ('<meta charset="gbk"><p>' + ZH_SIMP + "</p>").encode("gb18030")
_HTML4_B5 = (
    '<meta http-equiv="Content-Type" content="text/html; charset=big5">'
    "<p>" + ZH_TRAD + "</p>"
).encode("big5")

# (fid, data, declared_header, expected_charset, expected_pos,
#  expected_decoded_text)
FIXTURES: list[tuple[int, bytes | None, str | None, str, str, str | None]] = [
    # empty / fast path
    (0, b"", None, "", "", None),
    (1, ZH_SIMP.encode("utf-8"), None, "UTF-8", "valid", ZH_SIMP),
    # valid UTF-8 beats a (wrong) header declaration — charset.go:43-47
    (2, ZH_SIMP.encode("utf-8"), "gbk", "UTF-8", "valid", ZH_SIMP),
    # pure statistical guesses, one per CharsetLangMap family
    (3, _GB, None, "GBK", "guess", ZH_SIMP),
    (4, _B5, None, "Big5", "guess", ZH_TRAD),
    (5, _SJ, None, "SHIFT_JIS", "guess", JA_TEXT),
    (6, _EJ, None, "EUC-JP", "guess", JA_TEXT),
    (7, _EK, None, "EUC-KR", "guess", KO_TEXT),
    (8, _KR8, None, "KOI8-R", "guess", RU_TEXT),
    # BOM shortcut (UTF-16 both byte orders; python codec eats the BOM)
    (9, b"\xff\xfe" + ZH_SIMP.encode("utf-16-le"), None, "UTF-16", "guess", ZH_SIMP),
    (10, b"\xfe\xff" + ZH_SIMP.encode("utf-16-be"), None, "UTF-16", "guess", ZH_SIMP),
    # header declarations through the alias folds (charset.go:196-222)
    (11, _GB, "gb2312", "GBK", "header", ZH_SIMP),
    (12, _GB, "CP936", "GBK", "header", ZH_SIMP),
    (13, _B5, "BIG5-HKSCS", "Big5", "header", ZH_TRAD),
    (14, _SJ, "Shift-JIS", "SHIFT_JIS", "header", JA_TEXT),
    (15, _EK, "CP949", "EUC-KR", "header", KO_TEXT),
    (16, _EK, "UHC", "EUC-KR", "header", KO_TEXT),
    (17, _SJ, "windows-31j", "SHIFT_JIS", "header", JA_TEXT),
    (18, _GB, "UTF8", "GBK", "guess", ZH_SIMP),  # utf8 alias declared but
    # payload isn't valid UTF-8: header decode fails -> guess recovers
    # embedded declarations (html5 / html4 shapes, charset.go:112-180)
    (19, _HTML5_GB, None, "GBK", "html", '<meta charset="gbk"><p>' + ZH_SIMP + "</p>"),
    (
        20,
        _HTML4_B5,
        None,
        "Big5",
        "html",
        '<meta http-equiv="Content-Type" content="text/html; charset=big5">'
        "<p>" + ZH_TRAD + "</p>",
    ),
    # header vs html conflicts (charset.go:70-106): ISO-family header
    # loses to the html declaration; a concrete header beats it
    (
        21,
        _HTML5_GB,
        "ISO-8859-1",
        "GBK",
        "html",
        '<meta charset="gbk"><p>' + ZH_SIMP + "</p>",
    ),
    (
        22,
        _HTML5_GB,
        "gb2312",
        "GBK",
        "header",
        '<meta charset="gbk"><p>' + ZH_SIMP + "</p>",
    ),
    # unknown header token: no codec for it -> decode-fallback -> guess
    (23, _GB, "X-USER-DEFINED", "GBK", "guess", ZH_SIMP),
    # ascii-mixed payloads (digits/punct dilute the script share but must
    # stay >= 0.2)
    (
        24,
        ("2024年3月 " + ZH_SIMP + " 第1页/共10页").encode("gb18030"),
        None,
        "GBK",
        "guess",
        "2024年3月 " + ZH_SIMP + " 第1页/共10页",
    ),
    (
        25,
        ("第123回 " + JA_TEXT + " ページ1").encode("shift_jis"),
        None,
        "SHIFT_JIS",
        "guess",
        "第123回 " + JA_TEXT + " ページ1",
    ),
    # ---- adversarial boundary rows (round 6, VERDICT r5 #7): pin the
    # frequency gate AT its decision boundary, not just on clean-family
    # text. Every score below was measured against _guess_score and each
    # row still resolves deterministically (best >= 0.2, fallback
    # unreachable — the test_charset_fixtures explode-pin covers these
    # rows too).
    # shortest possible multibyte payload: the euc_kr codec decodes the
    # two GB bytes to one valid hangul syllable (score 1.0) — GBK must
    # still win on the common-char bonus (1.25 vs 1.0)
    (26, "的".encode("gb18030"), None, "GBK", "guess", "的"),
    # pure RARE simplified Han (zero common-set hits): GBK evidence is
    # only the 0.25*han floor — just above the 0.2 gate; no other CJK
    # codec decodes these bytes
    (27, "龘齉龍龜鑫森淼焱垚".encode("gb18030"), None, "GBK", "guess", "龘齉龍龜鑫森淼焱垚"),
    # EXACT gate edge: 3 common of 15 cyrillic letters = score 0.2,
    # admitted by the >= comparison (the euc_kr garbage decode that
    # usually out-scores uncommon-heavy Russian fails on these bytes)
    (
        28,
        ("ъёющэфцчшжхб" + "оеа").encode("koi8_r"),
        None,
        "KOI8-R",
        "guess",
        "ъёющэфцчшжхбоеа",
    ),
    # mixed-script payload (simplified zh + kana, both representable in
    # gb18030): kana must not tip the answer to SHIFT_JIS (its decode is
    # byte-valid but scores 0.0095 vs GBK 0.80)
    (
        29,
        ("这是测试的内容" + "のデータ").encode("gb18030"),
        None,
        "GBK",
        "guess",
        "这是测试的内容のデータ",
    ),
    # ascii-heavy Japanese: _shares scores over NON-ascii chars only, so
    # markup/digit dilution must not starve the kana signal (share 1.0)
    (
        30,
        "price=123, item: の, qty=45 です ok".encode("shift_jis"),
        None,
        "SHIFT_JIS",
        "guess",
        "price=123, item: の, qty=45 です ok",
    ),
    # measured 0.25 vs 0.25 TIE: rare TRADITIONAL Han whose big5 bytes
    # also decode validly under gb18030 (garbage Han, same 0.25*han
    # floor) — the strict `>` keeps the FIRST candidate in _GUESS_ORDER,
    # where Big5 precedes GBK: the tie-break IS the correct answer here
    # and this row pins that ordering
    (31, "龜鑿鸞籲鬱靄釁".encode("big5"), None, "Big5", "guess", "龜鑿鸞籲鬱靄釁"),
    # the documented GB->EUC-JP confusion (charset_bytes.py header
    # comment): these GB bytes decode VALIDLY as euc_jp pure-Han garbage
    # — frequency weighting holds it to 0.09 vs GBK 1.25
    (
        32,
        "的一是了我不人在他有这上们来到时大".encode("gb18030"),
        None,
        "GBK",
        "guess",
        "的一是了我不人在他有这上们来到时大",
    ),
    # two-syllable Korean: shortest hangul payload over the gate
    (33, "안녕".encode("euc_kr"), None, "EUC-KR", "guess", "안녕"),
]


def build_rows() -> list[tuple[int, bytes | None, str | None]]:
    return [(fid, data, declared) for fid, data, declared, _c, _p, _t in FIXTURES]


def expected_rows() -> list[tuple[int, str, str, str | None]]:
    return [(fid, c, p, t) for fid, _d, _h, c, p, t in FIXTURES]
