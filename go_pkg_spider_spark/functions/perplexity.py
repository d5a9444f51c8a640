"""KenLM-style character n-gram perplexity as an Arrow-batched UDF.

The reference's model slot is lingua-go (X4, /root/reference/lang.go:
335-355); the north-star adds a perplexity quality signal alongside it.
This is a self-contained, deterministic stand-in with KenLM semantics:
an order-3 character LM with add-k smoothing and backoff, trained once
per executor from the embedded seed corpus (the same public seed text
the langid model uses). `ppl = exp(-mean(log P(c_i | c_{i-2} c_{i-1})))`.

Production swap-in: replace `_train()` with loading real KenLM-exported
probs from a broadcast artifact; the UDF shape (Arrow batch in, float64
out) stays identical.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from .langid import SEED_CORPUS

_ORDER = 3
_ADD_K = 0.1
_model_cache: dict[str, object] = {}


def _train():
    """Character trigram counts with bigram backoff over all seed text."""
    tri: dict[str, dict[str, float]] = {}
    uni: dict[str, float] = {}
    text = " ".join(SEED_CORPUS.values()).lower()
    pad = "\x02" * (_ORDER - 1)
    t = pad + text
    for i in range(_ORDER - 1, len(t)):
        ctx, ch = t[i - _ORDER + 1 : i], t[i]
        tri.setdefault(ctx, {})[ch] = tri.get(ctx, {}).get(ch, 0.0) + 1.0
        uni[ch] = uni.get(ch, 0.0) + 1.0
    vocab = len(uni) + 1
    uni_total = sum(uni.values())
    log_uni = {c: math.log((n + _ADD_K) / (uni_total + _ADD_K * vocab)) for c, n in uni.items()}
    log_unk = math.log(_ADD_K / (uni_total + _ADD_K * vocab))
    log_tri = {}
    for ctx, dist in tri.items():
        total = sum(dist.values())
        log_tri[ctx] = (
            {c: math.log((n + _ADD_K) / (total + _ADD_K * vocab)) for c, n in dist.items()},
            math.log(_ADD_K / (total + _ADD_K * vocab)),
        )
    return log_tri, log_uni, log_unk


def _ppl_one(text: str) -> float | None:
    if not text:
        return None
    if "m" not in _model_cache:
        _model_cache["m"] = _train()
    log_tri, log_uni, log_unk = _model_cache["m"]
    t = ("\x02" * (_ORDER - 1)) + text.lower()[:2048]
    total, n = 0.0, 0
    for i in range(_ORDER - 1, len(t)):
        ctx, ch = t[i - _ORDER + 1 : i], t[i]
        entry = log_tri.get(ctx)
        if entry is not None and ch in entry[0]:
            total += entry[0][ch]
        else:
            # stupid-backoff to unigram (KenLM-style interpolation
            # simplified; deterministic and monotone in n-gram coverage)
            total += log_uni.get(ch, log_unk) + math.log(0.4)
        n += 1
    return float(math.exp(-total / n)) if n else None


@F.pandas_udf(DoubleType())
def ppl_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: _ppl_one(t) if t is not None else None)
