"""Held-out corpus for the langid-cascade accuracy contract (round 8,
VERDICT r7 #2 — the ANN-recall precedent applied to the language-ID
model slot).

Every row is (lid, true_lang, title, text) with `true_lang` the actual
language of the text BY CONSTRUCTION (the sentences are authored for
this corpus and are disjoint from functions/langid.SEED_CORPUS — the
model never saw them). The corpus has two strata:

- NATURAL rows: ordinary sentences per language, covering both rule
  paths (zh/ja/en settle in the JVM cascade) and both model residual
  sets (latin {fr,de,es,pt,en}, other {ar,ru,hi,ko} — lang.go:81-94).
- BOUNDARY rows: engineered to straddle the cascade's published
  thresholds (lang.go:237/250/304/311/327 — han_rate 0.3, kana/han
  0.1, english rate 0.618, latinCount 5, title ja/ko body rate 0.2).
  A boundary row's true language does not change when its statistic
  crosses the threshold, so rows on the far side measure the cascade's
  REAL boundary cost — misses there are recorded, not hidden.

tools/model_accuracy.py runs the production cascade over this corpus
and publishes per-language precision/recall (BENCH/BASELINE.md);
tests/test_model_accuracy.py pins measured floors so a regression in
the rules, the model, or the seed corpus trips CI.
"""

from __future__ import annotations

# ---------------------------------------------------------- natural rows
# 4 sentences per language; >= 64 chars after punct-strip, authored
# disjoint from SEED_CORPUS.

_NATURAL: dict[str, list[str]] = {
    "en": [
        "yesterday evening my neighbour repaired an old wooden boat near the harbour while seagulls circled above the water",
        "scientists measured how mountain glaciers respond when winter snowfall arrives later than usual each year",
        "please remember to water the tomato plants before noon because strong sunshine dries the soil quickly",
        "several students finished reading novels during summer and wrote short reports about their favourite chapters",
    ],
    "fr": [
        "hier soir mon voisin a réparé une vieille barque en bois près du port pendant que les mouettes tournaient au-dessus de l'eau légère et agitée après la tempête",
        "les élèves ont terminé leurs devoirs avant le dîner puis ils ont regardé les étoiles depuis la fenêtre de la cuisine éclairée",
        "la boulangère préparait déjà les croissants quand la première cliente est entrée avec son parapluie mouillé par la pluie légère",
        "nous avons visité un petit musée à côté de la cathédrale et le guide nous a expliqué l'histoire étrange de la région française",
    ],
    "de": [
        "gestern abend reparierte mein nachbar ein altes holzboot am hafen während die möwen über dem grünen wasser ihre übungen flogen und später über die dächer der häuser zurückkehrten",
        "die schüler beendeten ihre hausaufgaben vor dem abendessen und schauten dann durch das küchenfenster auf die hellen straßen wo die mädchen fröhlich über die brücke zur mühle liefen",
        "der bäcker bereitete schon die brötchen vor als die erste kundin mit ihrem nassen schirm die tür öffnete und freundlich grüßte bevor sie die frischen brötchen für die größere familie wählte",
        "wir besuchten ein kleines museum neben der kirche und der führer erklärte uns die außergewöhnliche geschichte der süddeutschen dörfer",
    ],
    "es": [
        "ayer por la noche mi vecino reparó una vieja barca de madera cerca del puerto mientras las gaviotas giraban sobre el agua azulada y pequeña después del atardecer según la estación",
        "los alumnos terminaron sus tareas antes de la cena y después miraron las estrellas desde la ventana de la cocina con mucha atención y cariño mientras soñaban con el próximo día de vacación",
        "la panadera ya preparaba los bollos cuando la primera clienta entró con su paraguas mojado por la lluvia pequeña y saludó con alegría según costumbre después de un día difícil y melancólico",
        "visitamos un pequeño museo junto a la catedral y el guía nos explicó la historia única de la región andaluza con canciones antiguas y poesía",
    ],
    "pt": [
        "ontem à noite meu vizinho consertou um velho barco de madeira perto do porto enquanto as gaivotas giravam sobre a água azulada e pequena depois do pôr do sol numa estação tranquila e mágica",
        "os alunos terminaram as lições antes do jantar e depois olharam as estrelas pela janela da cozinha com muita atenção e coração tranquilo sonhando com as férias de verão numa região só deles",
        "a padeira já preparava os pães quando a primeira cliente entrou com seu guarda-chuva molhado pela chuva miúda e cumprimentou com alegria e atenção",
        "visitámos um pequeno museu ao lado da catedral e o guia explicou-nos a história única da região portuguesa com canções antigas e poesia",
    ],
    "ar": [
        "في المساء أصلح جاري قاربا خشبيا قديما قرب الميناء بينما كانت النوارس تدور فوق الماء الهادئ قبل غروب الشمس الجميل",
        "أنهى الطلاب واجباتهم قبل العشاء ثم نظروا الى النجوم من نافذة المطبخ المضيء في ليلة صيفية دافئة وجميلة جدا",
        "كانت الخبازة تجهز الخبز عندما دخلت أول زبونة تحمل مظلتها المبللة بالمطر الخفيف وسلمت على الجميع بابتسامة واسعة",
        "زرنا متحفا صغيرا بجانب المسجد القديم وشرح لنا المرشد تاريخ المنطقة العريق بقصص قديمة وأشعار جميلة ومؤثرة",
    ],
    "ru": [
        "вчера вечером мой сосед чинил старую деревянную лодку у гавани пока чайки кружили над тихой водой перед красивым закатом",
        "ученики закончили уроки перед ужином а потом смотрели на звезды из окна светлой кухни теплой летней ночью",
        "пекарь уже готовила хлеб когда первая покупательница вошла с мокрым зонтом после мелкого дождя и весело поздоровалась",
        "мы посетили маленький музей рядом со старой церковью и экскурсовод рассказал нам удивительную историю этого края",
    ],
    "hi": [
        "कल शाम मेरे पड़ोसी ने बंदरगाह के पास पुरानी लकड़ी की नाव की मरम्मत की जबकि समुद्री पक्षी शांत पानी के ऊपर उड़ रहे थे",
        "विद्यार्थियों ने रात के खाने से पहले अपना पाठ पूरा किया और फिर रसोई की खिड़की से आकाश के तारों को देर तक देखा",
        "हलवाई सुबह की रोटियां बना रहा था जब पहली ग्राहक बारिश से भीगा छाता लेकर दुकान के भीतर आई और सबको नमस्ते कहा",
        "हमने पुराने मंदिर के पास एक छोटा संग्रहालय देखा और गाइड ने हमें इस क्षेत्र का अद्भुत इतिहास पुरानी कहानियों से समझाया",
    ],
    "ko": [
        "어제 저녁 이웃 아저씨가 항구 근처에서 낡은 나무 배를 고치는 동안 갈매기들이 잔잔한 물 위를 천천히 맴돌았고 멀리서 등대가 빛나기 시작했습니다",
        "학생들은 저녁 식사 전에 숙제를 끝내고 부엌 창문으로 여름 밤하늘의 별들을 오랫동안 바라보았으며 어머니는 내일 아침 식사를 준비하셨습니다",
        "빵집 주인이 아침 빵을 준비하고 있을 때 첫 손님이 비에 젖은 우산을 들고 들어와 밝게 인사했고 가게 안은 따뜻한 차의 향기로 가득했습니다",
        "우리는 오래된 교회 옆의 작은 박물관을 방문했고 안내원이 이 지역의 놀라운 역사를 옛날 이야기로 설명해 주었으며 벽에는 흑백 사진이 걸려 있었습니다",
    ],
    # CJK rows are paragraph-length (>= 64 cleaned runes — the body
    # cascade's BODY_MIN_SIZE gate; shorter rows are a separate
    # boundary case below) and ja rows carry a REALISTIC kanji density
    # (~30-40%, normal Japanese prose) so the han-rate branch sees the
    # text real encoders would ship.
    "zh": [
        "昨天傍晚邻居在码头旁边修理一条旧木船海鸥在安静的水面上空盘旋等待美丽的日落来临晚风吹过街道带来海水和松树的味道远处的灯塔开始闪烁",
        "学生们在晚饭前完成了功课然后从明亮的厨房窗户长时间眺望夏夜的星空感觉十分安宁母亲在桌边准备明天的早餐父亲坐在旧沙发上安静地读着一本厚厚的历史书",
        "面包师正在准备早晨的面包这时第一位顾客拿着被小雨淋湿的伞走进店里微笑着向大家问好屋子里充满了新鲜面粉和热茶的香气窗外的街道渐渐热闹起来行人匆匆走过",
        "我们参观了老教堂旁边的小博物馆讲解员用古老的故事向我们说明了这个地区令人惊讶的历史墙上挂着许多黑白照片记录着过去的街道和码头老人们常常站在照片前回忆往事",
    ],
    "ja": [
        "昨日の夕方隣の人は港の近くで古い木の船を修理していて鴎が静かな水面の上をゆっくり回っていました遠くの灯台が光り始めて夜の風が町に吹きました",
        "生徒たちは夕食の前に宿題を終えてそれから明るい台所の窓から夏の夜空の星を眺めていました母は明日の朝食を準備して父は古い本を読んでいました",
        "パン屋の主人が朝のパンを準備している時最初のお客さんが雨に濡れた傘を持って店に入って挨拶をしました店の中は新しい粉と熱いお茶の香りで一杯でした",
        "私たちは古い教会の隣の小さな博物館を見学して案内の人がこの地方の驚くべき歴史を話してくれました壁には昔の街道を記録した白黒の写真が掛かっていました",
    ],
}

_ZH_24 = "春天的早晨街道安静孩子们在公园里慢慢散步看花"  # 24 han chars
_JA_KANJI_HEAVY = "東京都内博物館古代美術品展示会場毎日多数来場者記録更新中"  # 0 kana
_DIGITS = "0 1 2 3 4 5 6 7 8 9 "  # survives punct-strip, counts only in n


def _dilute(base: str, filler_chars: int) -> str:
    """base + enough digit filler to reach the target cleaned length."""
    f = (_DIGITS * 10)[:filler_chars]
    return base + " " + f


def build_rows() -> list[tuple[int, str, str | None, str]]:
    """(lid, true_lang, title, text) — pure function, no RNG."""
    rows: list[tuple[int, str, str | None, str]] = []
    lid = 0

    def add(lang: str, text: str, title: str | None = None):
        nonlocal lid
        rows.append((lid, lang, title, text))
        lid += 1

    for lang in sorted(_NATURAL):
        for s in _NATURAL[lang]:
            add(lang, s)

    # ---- boundary rows (thresholds from lang.go; lids 44+) ----
    # han_rate 0.3 gate (lang.go:304): 24 han chars + filler.
    # 24/(24+51)=0.32 -> zh branch; 24/(24+62)=0.279 -> falls through
    # to NEEDS_MODEL_OTHER (no ascii letters), a REAL boundary miss.
    add("zh", _dilute(_ZH_24, 50))  # 24/75 = 0.32  (above)
    add("zh", _dilute(_ZH_24, 61))  # 24/86 = 0.279 (below: measured miss)
    # kana/han 0.1 gate (lang.go:311): kanji-dense Japanese (headline /
    # legal register). 56 kanji + 9 kana = ratio 0.161 -> ja; 84 kanji
    # + 5 kana = 0.060 -> zh (the reference's own boundary behavior
    # for kanji-dense ja text — a documented miss).
    add("ja", _JA_KANJI_HEAVY * 2 + "とてもこのですから")
    add("ja", _JA_KANJI_HEAVY * 3 + "これです")
    # english rate 0.618 gate (lang.go:327): ascii letters vs digits.
    en_base = "the weather station recorded steady wind from the north all week"
    add("en", en_base)  # ~0.86 -> en
    add("en", _dilute(en_base, 30))  # diluted below 0.618 -> model(other): miss
    # latinCount 5 gate (lang.go:335): English text with accented chars
    # routes to the latin model set once latin supplement chars > 5.
    add("en", "the café near the naïve résumé atelier serves crêpes and soufflé to visitors from the région every day")
    add("en", "the cafe near the old bakery serves fresh bread and warm tea to visitors from the harbour every single day")
    # title ja/ko body-rate 0.2 gates (lang.go:237/250): a >=2-han title
    # forces the title path; the body's kana/hangul rate decides.
    ja_kana_body = "これはとてもきれいなまちでみんながゆっくりあるいています" * 3
    add("ja", ja_kana_body, title="東京案内")
    add("ko", "서울의 거리는 아침마다 조용하고 사람들은 천천히 걷습니다 " * 3, title="首爾案內")
    # a mostly-zh body under a han title stays zh on the title path
    add("zh", _NATURAL["zh"][0], title="城市历史")
    return rows


def shuffled_chars(text: str) -> str:
    """Deterministic character shuffle (digest-seeded Fisher-Yates) —
    destroys trigram structure while preserving the exact character
    multiset, for the perplexity separation statistic."""
    import hashlib

    chars = list(text)
    seed = int.from_bytes(hashlib.md5(text.encode()).digest()[:8], "little")
    # xorshift64* stream — dependency-free, stable across numpy versions
    x = seed or 0x9E3779B97F4A7C15
    for i in range(len(chars) - 1, 0, -1):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        j = x % (i + 1)
        chars[i], chars[j] = chars[j], chars[i]
    return "".join(chars)


def shuffled_words(text: str) -> str:
    """Deterministic word shuffle — keeps within-word trigrams, breaks
    cross-word structure (the milder separation probe)."""
    import hashlib

    words = text.split(" ")
    seed = int.from_bytes(hashlib.md5(b"w" + text.encode()).digest()[:8], "little")
    x = seed or 0x9E3779B97F4A7C15
    for i in range(len(words) - 1, 0, -1):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        j = x % (i + 1)
        words[i], words[j] = words[j], words[i]
    return " ".join(words)
