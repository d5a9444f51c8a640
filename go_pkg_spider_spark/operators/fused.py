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


def _fused_row(b, c, s, mt, mk, pt) -> tuple:
    """One output row; b may be bytes OR a zero-copy memoryview (every
    decoder indexes/slices/frombuffers, which both types support)."""
    pcm, sr, err = decode_blob(b, c, s)
    if pcm is None:
        audio = (False, err, 0, 0, 0.0, 0.0, 0.0, 0.0, 0.0)
    else:
        audio = (True, None, *_features(pcm, sr))
    model_lang = None
    if mt is not None and mk is not None:
        langs = LATIN_SET if mk == NEEDS_MODEL_LATIN else OTHER_SET
        model_lang = _score_text(mt, langs)
    ppl = _ppl_one(pt) if pt else None
    return (*audio, model_lang, ppl)


@F.pandas_udf(FUSED_SCHEMA)
def fused_model_udf(
    blob: pd.Series,
    codec: pd.Series,
    sr_hz: pd.Series,
    model_text: pd.Series,
    marker: pd.Series,
    ppl_text: pd.Series,
) -> pd.DataFrame:
    rows = [
        _fused_row(b, c, int(s) if not pd.isna(s) else None, mt, mk, pt)
        for b, c, s, mt, mk, pt in zip(
            blob, codec, sr_hz, model_text, marker, ppl_text
        )
    ]
    return pd.DataFrame(rows, columns=[f.name for f in FUSED_SCHEMA.fields])


def _binary_views(arr):
    """Zero-copy per-row memoryviews over a pyarrow Binary array (None
    for null rows). to_pandas()/as_py() copy every ~100KB payload into a
    fresh Python bytes object — measured ~18ms per 256-row batch, about
    the cost of the decode work itself; the views cost ~0.07ms."""
    import numpy as np
    import pyarrow as pa

    n = len(arr)
    bufs = arr.buffers()
    if bufs[2] is None:
        return [None] * n
    width = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=width, count=arr.offset + n + 1)
    # cast('B'): pyarrow buffers expose format 'b' (SIGNED bytes); the
    # decoders index lookup tables with these values and must see the
    # same unsigned 0..255 ints a bytes object yields (ADVICE r5)
    mv = memoryview(bufs[2]).cast("B")
    if arr.null_count:
        nulls = arr.is_null().to_numpy(zero_copy_only=False)
    else:
        nulls = None
    out = []
    for i in range(n):
        if nulls is not None and nulls[i]:
            out.append(None)
            continue
        o0, o1 = offs[arr.offset + i], offs[arr.offset + i + 1]
        out.append(mv[o0:o1])
    return out


try:  # Spark >= 4.0 scalar Arrow UDF (no pandas materialization)
    from pyspark.sql.functions import arrow_udf as _arrow_udf
except ImportError:  # pragma: no cover — older runtimes
    _arrow_udf = None

if _arrow_udf is not None:
    import pyarrow as _pa

    @_arrow_udf(FUSED_SCHEMA)
    def fused_model_arrow_udf(
        blob: "_pa.Array",
        codec: "_pa.Array",
        sr_hz: "_pa.Array",
        model_text: "_pa.Array",
        marker: "_pa.Array",
        ppl_text: "_pa.Array",
    ) -> "_pa.Array":
        """The fused stage on raw Arrow batches: the ~100KB binary
        payloads are read as zero-copy memoryviews instead of being
        materialized into a pandas Series of bytes objects (the
        round-4 profile attributed ~85% of the stage to that
        serialization). Same plan node (ArrowEvalPython), same row
        semantics (_fused_row), no pandas on either side."""
        rows = [
            _fused_row(b, c, s, mt, mk, pt)
            for b, c, s, mt, mk, pt in zip(
                _binary_views(blob),
                codec.to_pylist(),
                sr_hz.to_pylist(),
                model_text.to_pylist(),
                marker.to_pylist(),
                ppl_text.to_pylist(),
            )
        ]
        cols = list(zip(*rows)) if rows else [[] for _ in FUSED_SCHEMA.fields]
        arrow_types = [
            _pa.bool_(), _pa.string(), _pa.int32(), _pa.int32(),
            _pa.float64(), _pa.float64(), _pa.float64(), _pa.float64(),
            _pa.float64(), _pa.string(), _pa.float64(),
        ]
        return _pa.StructArray.from_arrays(
            [_pa.array(list(c), t) for c, t in zip(cols, arrow_types)],
            names=[f.name for f in FUSED_SCHEMA.fields],
        )
else:  # pragma: no cover
    fused_model_arrow_udf = None

# measured winner (BENCH/R5_NOTES.md A/B at sf0.1): set by the bench
DEFAULT_FUSED_IMPL = "arrow" if _arrow_udf is not None else "pandas"


def fused_model_expr(blob, codec, sr_hz, model_text, marker, ppl_text, impl=None):
    """The fused-stage expression with a selectable transport:
    'arrow' (zero-copy scalar arrow_udf) or 'pandas' (pandas_udf).
    Both produce identical rows (parity-pinned in test_pipeline)."""
    impl = impl or DEFAULT_FUSED_IMPL
    if impl not in ("arrow", "pandas"):
        raise ValueError(f"fused_impl must be 'arrow' or 'pandas', got {impl!r}")
    if impl == "arrow" and fused_model_arrow_udf is None:
        raise RuntimeError(
            "fused_impl='arrow' requires pyspark.sql.functions.arrow_udf "
            "(Spark >= 4.0) — use fused_impl='pandas' on this runtime"
        )
    fn = fused_model_arrow_udf if impl == "arrow" else fused_model_udf
    return fn(blob, codec, sr_hz, model_text, marker, ppl_text)
