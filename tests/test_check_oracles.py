"""The local gate replica must be dtype-faithful to the driver: an
integer column and a float column with equal numeric values are a FAIL
(round-2's events_two_pass_stats/sessionize_events class), while width
drift within a kind (int32 vs int64, datetime ns vs us, float32 vs
float64) stays a PASS — the driver hashed all of those green in r02."""

import numpy as np
import pandas as pd

from tools.check_oracles import canon_frame, compare


def test_int_vs_float_mismatch_is_caught():
    # the exact round-2 failure: Spark int64 736 vs DuckDB HUGEINT->float64 736.0
    s = pd.DataFrame({"n": pd.array([736, 12], dtype="int64")})
    d = pd.DataFrame({"n": pd.array([736.0, 12.0], dtype="float64")})
    problems = compare(s, d)
    assert problems and "dtype kind mismatch" in problems[0]


def test_width_drift_within_kind_passes():
    s = pd.DataFrame(
        {
            "rk": pd.array([1, 2], dtype="int32"),
            "x": pd.array([1.5, 2.5], dtype="float32"),
            "t": pd.to_datetime(["2024-01-01", "2024-01-02"]).astype(
                "datetime64[ns]"
            ),
        }
    )
    d = pd.DataFrame(
        {
            "rk": pd.array([1, 2], dtype="int64"),
            "x": pd.array([1.5, 2.5], dtype="float64"),
            "t": pd.to_datetime(["2024-01-01", "2024-01-02"]).astype(
                "datetime64[us]"
            ),
        }
    )
    assert compare(s, d) == []


def test_row_order_and_column_order_insensitive():
    s = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    d = pd.DataFrame({"b": ["y", "x"], "a": [2, 1]})
    assert compare(s, d) == []


def test_value_diff_is_caught():
    s = pd.DataFrame({"a": [1, 2]})
    d = pd.DataFrame({"a": [1, 3]})
    problems = compare(s, d)
    assert problems and "values differ" in problems[0]


def test_float_rounding_to_6_sig_figs():
    s = pd.DataFrame({"x": [1.0000001]})
    d = pd.DataFrame({"x": [1.0000002]})
    assert compare(s, d) == []  # equal at 6 sig figs


def test_nan_and_none_canonical():
    s = pd.DataFrame({"x": [float("nan")], "o": [None]})
    d = pd.DataFrame({"x": [float("nan")], "o": [None]})
    assert compare(s, d) == []


def test_canon_frame_arrays():
    pdf = pd.DataFrame({"v": [np.array([1.0, 2.0]), np.array([3.0, 4.0])]})
    rows, kinds, cols = canon_frame(pdf)
    assert kinds == {"v": "O"} and len(rows) == 2


def test_ngram_cap_parity_guard_reports_headroom(spark):
    """ADVICE r7: the parity gate must read the ngram group cap's drop
    accounting — at the gate tier the corpus has headroom
    (dropped_members == 0) and the guard surfaces the observed max
    group size; tools/check_oracles.py fails the entry when drops > 0."""
    from go_pkg_spider_spark.entry_queries import ngram_cap_parity_guard

    m = ngram_cap_parity_guard(spark, "/root/testdata/sf0.01")
    assert m["dropped_members"] == 0
    assert 2 <= m["max_group_members"] < 1024
    assert m["n_groups"] >= 2
