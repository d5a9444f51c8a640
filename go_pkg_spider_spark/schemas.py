"""Fixed, declared schemas (the Go-struct discipline of the reference,
SURVEY.md §1.2 — schemas are declared, never inferred)."""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# BASELINE.json input_hint
CLIPS_SCHEMA = StructType(
    [
        StructField("clip_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("sr_hz", IntegerType()),
        StructField("dur_ms", IntegerType()),
        StructField("codec", StringType()),
        StructField("transcript", StringType()),
    ]
)

# pipeline output (SURVEY.md §1.2)
DECISIONS_SCHEMA = StructType(
    [
        StructField("clip_id", StringType()),
        StructField("keep", BooleanType()),
        StructField("drop_reason", StringType()),
        StructField("scrubbed_transcript", StringType()),
        StructField("lang", StringType()),
        StructField("lang_pos", StringType()),
        StructField("ppl", DoubleType()),
        StructField("quality_score", DoubleType()),
    ]
)
