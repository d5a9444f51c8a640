"""Frozen fixture corpus for the A11 similarity-argmax value
oracle (simtext.best_match_udf). Each row: (fid, candidates,
target, expected_best, expected_ratio) where the expectation is
difflib.SequenceMatcher.ratio's argmax (first max wins, ties to
the earliest candidate; ratio rounded to 6). The expectations are
FROZEN: tests/test_simtext.py re-derives them from difflib at
test time, and the DuckDB oracle returns them as literal truth —
the Spark UDF must reproduce them through the driver hash gate.
Reference semantics: extract/content.go:956-978 (argmax edit-
distance title pick). Fids 43-52 carry HAND-COMPUTED ratios (LCS
block arithmetic documented inline) so the oracle is not purely
difflib-checking-difflib.
"""

FIXTURES = [
    (0, ['上海市政府召开新闻发布会介绍疫情防控工作 - 上海发布', '首页', '相关新闻推荐', '上海市政府召开新闻发布会介绍疫情防控工作'], '上海市政府召开新闻发布会介绍疫情防控工作', '上海市政府召开新闻发布会介绍疫情防控工作', 1.0),
    (1, ['首页', '新闻中心', '联系我们'], '上海市政府召开新闻发布会介绍疫情防控工作', '新闻中心', 0.166667),
    (2, [], '上海市政府召开新闻发布会介绍疫情防控工作', None, 0.0),
    (3, ['上海市政府召开新闻发布会介绍疫情防控工作'], '上海市政府召开新闻发布会介绍疫情防控工作', '上海市政府召开新闻发布会介绍疫情防控工作', 1.0),
    (4, ['上海市政府召开新闻发布会介绍疫情防控工作', '上海市政府召开新闻发布会介绍疫情防控工作'], '上海市政府召开新闻发布会介绍疫情防控工作', '上海市政府召开新闻发布会介绍疫情防控工作', 1.0),
    (5, ['Global markets rally as inflation cools in September | Example News', 'Home', 'Subscribe now', 'GLOBAL MARKETS RALLY AS INFLATION COOLS IN SEPTEMBER'], 'Global markets rally as inflation cools in September', 'Global markets rally as inflation cools in September | Example News', 0.87395),
    (6, ['Breaking: Global markets rally as inflation cools in September', 'Global markets rally as inflation cools in September...', 'Global markets rally as inflation cools in Sept'], 'Global markets rally as inflation cools in September', 'Global markets rally as inflation cools in September...', 0.971963),
    (7, ['totally unrelated string', 'another one'], 'Global markets rally as inflation cools in September', 'totally unrelated string', 0.368421),
    (8, ['Global markets rally as in', 'flation cools in September'], 'Global markets rally as inflation cools in September', 'Global markets rally as in', 0.666667),
    (9, ['', '   ', 'Global markets rally as inflation cools in September'], 'Global markets rally as inflation cools in September', 'Global markets rally as inflation cools in September', 1.0),
    (10, ['Article number 0 about topic 0', 'article Number 0 About Topic 0 with details', 'Topic 0 details article', 'Site footer text'], 'Article number 0 about topic 0 with details', 'article Number 0 About Topic 0 with details', 0.906977),
    (11, ['Article number 1 about topic 2', 'article Number 1 About Topic 2 with details', 'Topic 2 details article', 'Site footer text'], 'Article number 1 about topic 2 with details', 'article Number 1 About Topic 2 with details', 0.906977),
    (12, ['Article number 2 about topic 4', 'article Number 2 About Topic 4 with details', 'Topic 4 details article', 'Site footer text'], 'Article number 2 about topic 4 with details', 'article Number 2 About Topic 4 with details', 0.906977),
    (13, ['Article number 3 about topic 1', 'article Number 3 About Topic 1 with details', 'Topic 1 details article', 'Site footer text'], 'Article number 3 about topic 1 with details', 'article Number 3 About Topic 1 with details', 0.906977),
    (14, ['Article number 4 about topic 3', 'article Number 4 About Topic 3 with details', 'Topic 3 details article', 'Site footer text'], 'Article number 4 about topic 3 with details', 'article Number 4 About Topic 3 with details', 0.906977),
    (15, ['Article number 5 about topic 0', 'article Number 5 About Topic 0 with details', 'Topic 0 details article', 'Site footer text'], 'Article number 5 about topic 0 with details', 'article Number 5 About Topic 0 with details', 0.906977),
    (16, ['Article number 6 about topic 2', 'article Number 6 About Topic 2 with details', 'Topic 2 details article', 'Site footer text'], 'Article number 6 about topic 2 with details', 'article Number 6 About Topic 2 with details', 0.906977),
    (17, ['Article number 7 about topic 4', 'article Number 7 About Topic 4 with details', 'Topic 4 details article', 'Site footer text'], 'Article number 7 about topic 4 with details', 'article Number 7 About Topic 4 with details', 0.906977),
    (18, ['Article number 8 about topic 1', 'article Number 8 About Topic 1 with details', 'Topic 1 details article', 'Site footer text'], 'Article number 8 about topic 1 with details', 'article Number 8 About Topic 1 with details', 0.906977),
    (19, ['Article number 9 about topic 3', 'article Number 9 About Topic 3 with details', 'Topic 3 details article', 'Site footer text'], 'Article number 9 about topic 3 with details', 'article Number 9 About Topic 3 with details', 0.906977),
    (20, ['第0届全国人民代表大会第1次会议在北京举行 - 新华网', '第0届人大会议在京举行', '网站地图', '第0届全国人民代表大会'], '第0届全国人民代表大会第1次会议在北京举行', '第0届全国人民代表大会第1次会议在北京举行 - 新华网', 0.875),
    (21, ['第1届全国人民代表大会第2次会议在北京举行 - 新华网', '第1届人大会议在京举行', '网站地图', '第1届全国人民代表大会'], '第1届全国人民代表大会第2次会议在北京举行', '第1届全国人民代表大会第2次会议在北京举行 - 新华网', 0.875),
    (22, ['第2届全国人民代表大会第3次会议在北京举行 - 新华网', '第2届人大会议在京举行', '网站地图', '第2届全国人民代表大会'], '第2届全国人民代表大会第3次会议在北京举行', '第2届全国人民代表大会第3次会议在北京举行 - 新华网', 0.875),
    (23, ['第3届全国人民代表大会第1次会议在北京举行 - 新华网', '第3届人大会议在京举行', '网站地图', '第3届全国人民代表大会'], '第3届全国人民代表大会第1次会议在北京举行', '第3届全国人民代表大会第1次会议在北京举行 - 新华网', 0.875),
    (24, ['第4届全国人民代表大会第2次会议在北京举行 - 新华网', '第4届人大会议在京举行', '网站地图', '第4届全国人民代表大会'], '第4届全国人民代表大会第2次会议在北京举行', '第4届全国人民代表大会第2次会议在北京举行 - 新华网', 0.875),
    (25, ['第5届全国人民代表大会第3次会议在北京举行 - 新华网', '第5届人大会议在京举行', '网站地图', '第5届全国人民代表大会'], '第5届全国人民代表大会第3次会议在北京举行', '第5届全国人民代表大会第3次会议在北京举行 - 新华网', 0.875),
    (26, ['第6届全国人民代表大会第1次会议在北京举行 - 新华网', '第6届人大会议在京举行', '网站地图', '第6届全国人民代表大会'], '第6届全国人民代表大会第1次会议在北京举行', '第6届全国人民代表大会第1次会议在北京举行 - 新华网', 0.875),
    (27, ['第7届全国人民代表大会第2次会议在北京举行 - 新华网', '第7届人大会议在京举行', '网站地图', '第7届全国人民代表大会'], '第7届全国人民代表大会第2次会议在北京举行', '第7届全国人民代表大会第2次会议在北京举行 - 新华网', 0.875),
    (28, ['第8届全国人民代表大会第3次会议在北京举行 - 新华网', '第8届人大会议在京举行', '网站地图', '第8届全国人民代表大会'], '第8届全国人民代表大会第3次会议在北京举行', '第8届全国人民代表大会第3次会议在北京举行 - 新华网', 0.875),
    (29, ['第9届全国人民代表大会第1次会议在北京举行 - 新华网', '第9届人大会议在京举行', '网站地图', '第9届全国人民代表大会'], '第9届全国人民代表大会第1次会议在北京举行', '第9届全国人民代表大会第1次会议在北京举行 - 新华网', 0.875),
    (30, ['Quarterly report Q1 2023', 'Revenue up 1% in Q1', 'quarterly report q1 2023: revenue up 1%'], 'Quarterly report Q1 2023: revenue up 1%', 'quarterly report q1 2023: revenue up 1%', 0.948718),
    (31, ['Quarterly report Q2 2023', 'Revenue up 2% in Q2', 'quarterly report q2 2023: revenue up 2%'], 'Quarterly report Q2 2023: revenue up 2%', 'quarterly report q2 2023: revenue up 2%', 0.948718),
    (32, ['Quarterly report Q3 2023', 'Revenue up 3% in Q3', 'quarterly report q3 2023: revenue up 3%'], 'Quarterly report Q3 2023: revenue up 3%', 'quarterly report q3 2023: revenue up 3%', 0.948718),
    (33, ['Quarterly report Q4 2023', 'Revenue up 4% in Q4', 'quarterly report q4 2023: revenue up 4%'], 'Quarterly report Q4 2023: revenue up 4%', 'quarterly report q4 2023: revenue up 4%', 0.948718),
    (34, ['Quarterly report Q1 2023', 'Revenue up 5% in Q1', 'quarterly report q1 2023: revenue up 5%'], 'Quarterly report Q1 2023: revenue up 5%', 'quarterly report q1 2023: revenue up 5%', 0.948718),
    (35, ['Quarterly report Q2 2023', 'Revenue up 6% in Q2', 'quarterly report q2 2023: revenue up 6%'], 'Quarterly report Q2 2023: revenue up 6%', 'quarterly report q2 2023: revenue up 6%', 0.948718),
    (36, ['Quarterly report Q3 2023', 'Revenue up 7% in Q3', 'quarterly report q3 2023: revenue up 7%'], 'Quarterly report Q3 2023: revenue up 7%', 'quarterly report q3 2023: revenue up 7%', 0.948718),
    (37, ['Quarterly report Q4 2023', 'Revenue up 8% in Q4', 'quarterly report q4 2023: revenue up 8%'], 'Quarterly report Q4 2023: revenue up 8%', 'quarterly report q4 2023: revenue up 8%', 0.948718),
    (38, ['a', 'ab', 'abc'], 'abc', 'abc', 1.0),
    (39, ['xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx', 'abcxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx'], 'abc', 'abcxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx', 0.056604),
    (40, ['café résumé naïve', 'cafe resume naive'], 'café résumé naïve', 'café résumé naïve', 1.0),
    (41, ['tab\there', 'newline segment'], 'tab here', 'tab\there', 0.875),
    (42, ['50% off sale!', '50 off sale'], '50% off sale!', '50% off sale!', 1.0),
    # ---- hand-computed ratio rows (round-4 verdict "what's wrong" #2):
    # the expectations below are derived BY HAND from the ratio formula
    # 2*M/(len(a)+len(b)), M = total matched chars across the recursive
    # longest-matching-block decomposition — NOT by running difflib —
    # breaking the difflib<->difflib circularity of the rows above.
    # 43: blocks('abcX','abcd'): longest 'abc' (3); right 'X'/'d' none.
    #     M=3 -> 2*3/(4+4) = 0.75
    (43, ['abcX'], 'abcd', 'abcX', 0.75),
    # 44: 'ab' vs 'abcd': M=2 -> 4/6 = 0.666666... -> 0.666667
    (44, ['ab'], 'abcd', 'ab', 0.666667),
    # 45: 'kitten' vs 'sitting': longest 'itt' (3); left 'k'/'s' none;
    #     right 'en'/'ing' -> longest 'n' (1), rest none. M=4 ->
    #     8/13 = 0.6153846... -> 0.615385
    (45, ['kitten'], 'sitting', 'kitten', 0.615385),
    # 46: 'abab' vs 'baba': longest 'aba' = a[0:3]/b[1:4] (3); left
    #     ''/'b'; right 'b'/''. M=3 -> 6/8 = 0.75
    (46, ['abab'], 'baba', 'abab', 0.75),
    # 47: 'aaab' vs 'baaa': longest 'aaa' = a[0:3]/b[1:4]. M=3 -> 0.75
    (47, ['aaab'], 'baaa', 'aaab', 0.75),
    # 48: no common character -> M=0, ratio 0.0; the strict > in the
    #     argmax means NO candidate is picked at ratio 0
    (48, ['xyz'], 'abc', None, 0.0),
    # 49: 'hello world' vs 'hello there': 'hello ' (6); then
    #     'world'/'there': longest 'r' (1), 'wo'/'the' none, 'ld'/'e'
    #     none. M=7 -> 14/22 = 0.6363... -> 0.636364
    (49, ['hello world'], 'hello there', 'hello world', 0.636364),
    # 50: exact ratio tie (both 0.75 by row-43 arithmetic; 'Xabc'
    #     matches block 'abc' = a[1:4]/b[0:3]) -> FIRST candidate wins
    (50, ['abcX', 'Xabc'], 'abcd', 'abcX', 0.75),
    # 51: case-sensitive: 'ABC' vs 'abc' share no chars -> (None, 0.0)
    (51, ['ABC'], 'abc', None, 0.0),
    # 52: later strictly-better candidate replaces: 0.666667 then 1.0
    (52, ['ab', 'abcd'], 'abcd', 'abcd', 1.0),
]
