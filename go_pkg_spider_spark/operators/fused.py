"""Fused model stage: decode + langid-model + perplexity in ONE
Arrow-batched UDF.

The reference computes every per-page statistic in a single DOM pass
(computeInfo, /root/reference/extract/content.go:1020-1065); the Spark
analog (SURVEY.md §4 'single-pass ... compute all features in ONE
pandas UDF returning a struct') matters even more at high parallelism:
each ArrowEvalPython node is its own python-worker pool + localhost
socket round trip, and three separate nodes measured ~85% kernel time
at local[32] (fork/socket/page churn). One fused node cuts python
round trips 3x and never ships `bytes` past the first hop.

Inputs: bytes/codec/sr_hz (decode), cleaned text + NEEDS_MODEL marker
(langid residual), raw transcript + maybe_keep (ppl). Output: one
struct column with audio features, model_lang, ppl.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions.langid import (
    LATIN_SET,
    NEEDS_MODEL_LATIN,
    OTHER_SET,
    _score_text,
)
from ..functions.perplexity import _ppl_one
from .decode import DECODE_SCHEMA, _features, decode_blob

FUSED_SCHEMA = StructType(
    list(DECODE_SCHEMA.fields)
    + [
        StructField("model_lang", StringType()),
        StructField("ppl", DoubleType()),
    ]
)


@F.pandas_udf(FUSED_SCHEMA)
def fused_model_udf(
    blob: pd.Series,
    codec: pd.Series,
    sr_hz: pd.Series,
    model_text: pd.Series,
    marker: pd.Series,
    ppl_text: pd.Series,
) -> pd.DataFrame:
    rows = []
    for b, c, s, mt, mk, pt in zip(blob, codec, sr_hz, model_text, marker, ppl_text):
        pcm, sr, err = decode_blob(b, c, int(s) if not pd.isna(s) else None)
        if pcm is None:
            audio = (False, err, 0, 0, 0.0, 0.0, 0.0, 0.0, 0.0)
        else:
            audio = (True, None, *_features(pcm, sr))
        model_lang = None
        if mt is not None and mk is not None:
            langs = LATIN_SET if mk == NEEDS_MODEL_LATIN else OTHER_SET
            model_lang = _score_text(mt, langs)
        ppl = _ppl_one(pt) if pt else None
        rows.append((*audio, model_lang, ppl))
    return pd.DataFrame(rows, columns=[f.name for f in FUSED_SCHEMA.fields])
