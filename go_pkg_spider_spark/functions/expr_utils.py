"""Expression-level let-binding.

Aliasing an expensive expression into its own column (withColumn) is
NOT a reliable materialization barrier: depending on what sits above
(Filter pushdown, Generate/explode extraction), CollapseProject can
inline the alias into every reference — including references INSIDE
higher-order-function lambdas, where the inlined expression then
re-evaluates once PER ARRAY ELEMENT. Measured blow-up: the winnowing
fingerprint query went from ~2s to >300s at sf0.01 when the normalized-
string alias was inlined into the per-gram lambda (2k grams x
regexp_replace over the whole 2KB text, per row).

`let_col` is the optimizer-proof form: wrap the value in a 1-element
array and bind it as a LAMBDA VARIABLE. Lambda variables are evaluated
exactly once per invocation and no Catalyst rule substitutes through
them, so the body can reference the bound value any number of times
(including inside nested lambdas) at attribute-read cost.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, functions as F


def let_col(value: Column, body: Callable[[Column], Column]) -> Column:
    """let v = value in body(v) — value evaluates exactly once."""
    return F.try_element_at(F.transform(F.array(value), body), F.lit(1))
