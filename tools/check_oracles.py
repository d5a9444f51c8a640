"""Replicates the driver's correctness gate locally: runs every
queries() entry at sf0.01 in Spark and its oracle_sql() twin in DuckDB
and compares the two *as pandas frames* — row count, column names, and
dtype-aware canonical values.

Why pandas-to-pandas: the driver materializes both sides through pandas
and hashes dtype-sensitively. Round 2's two red entries were numerically
equal but hashed apart because DuckDB's bare integer SUM returns HUGEINT
(-> pandas float64, `736.0`) while Spark returns int64 (`736`).  The old
fetchall()+"%.6g" replica stringified both to "736" and could not see
it.  This version keys every cell on (dtype-kind, value): an integer
column and a float column NEVER compare equal, even when the numbers
match.  Within a kind, width is ignored (int32 == int64) but a WARN is
printed so drift can be swept.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entry
from go_pkg_spider_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _kind(dtype) -> str:
    """Collapse a pandas dtype to the comparison kind the gate cares
    about: i=integer, f=float, b=bool, M=datetime, O=object/other.
    int-vs-float MUST differ (the round-2 failure class); int widths
    within a kind do not."""
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "i"
    if k == "f":
        return "f"
    if k == "b":
        return "b"
    if k == "M":
        return "M"
    return "O"


def _canon_scalar(v):
    """Canonicalize one python object (object-dtype cells: Decimal,
    list, Timestamp, bytes, None)."""
    import decimal

    if v is None:
        return ("none",)
    if isinstance(v, decimal.Decimal):
        return ("dec", f"{float(v):.6f}")
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", f"{v:.6g}")
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("arr", tuple(_canon_scalar(x) for x in v))
    if isinstance(v, pd.Timestamp):
        t = v.tz_convert(None) if v.tzinfo is not None else v
        return ("ts", t.isoformat())
    if isinstance(v, bytes):
        return ("bytes", v)
    try:
        if isinstance(v, float) and math.isnan(v):  # pragma: no cover
            return ("f", "nan")
        if v != v:  # NaN-ish (e.g. pd.NA)
            return ("none",)
    except Exception:
        pass
    return ("O", str(v))


def canon_frame(pdf: pd.DataFrame):
    """-> (sorted list of canonical row tuples, {col: kind}).  Columns
    sorted by lowercase name, mirroring the driver's sort-by-name."""
    pdf = pdf.copy()
    pdf.columns = [c.lower() for c in pdf.columns]
    cols = sorted(pdf.columns)
    kinds = {}
    canon_cols = []
    for c in cols:
        s = pdf[c]
        k = _kind(s.dtype)
        kinds[c] = k
        if k == "i":
            canon_cols.append([("i", int(x)) for x in s])
        elif k == "f":
            canon_cols.append(
                [("f", "nan") if (x != x) else ("f", f"{x:.6g}") for x in s]
            )
        elif k == "b":
            canon_cols.append([("b", bool(x)) for x in s])
        elif k == "M":
            ss = s
            try:
                if getattr(ss.dt, "tz", None) is not None:
                    ss = ss.dt.tz_convert(None)
            except Exception:
                pass
            canon_cols.append(
                [("none",) if pd.isna(x) else ("ts", x.isoformat()) for x in ss]
            )
        else:
            canon_cols.append([_canon_scalar(x) for x in s])
    rows = sorted(zip(*canon_cols)) if canon_cols and len(pdf) else []
    return rows, kinds, cols


def compare(spdf: pd.DataFrame, dpdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    srows, skinds, scols = canon_frame(spdf)
    drows, dkinds, dcols = canon_frame(dpdf)
    if len(spdf) != len(dpdf):
        problems.append(f"rowcount spark={len(spdf)} duck={len(dpdf)}")
    if scols != dcols:
        problems.append(f"cols spark={scols} duck={dcols}")
        return problems
    # dtype-kind mismatches are exactly the class the driver hashes apart
    for c in scols:
        if skinds[c] != dkinds[c]:
            problems.append(
                f"dtype kind mismatch on '{c}': spark={spdf[c].dtype}"
                f" duck={dpdf[c].dtype}"
            )
        elif str(spdf[c].dtype) != str(dpdf[c].dtype):
            print(
                f"  WARN dtype width drift on '{c}':"
                f" spark={spdf[c].dtype} duck={dpdf[c].dtype}"
            )
    if not problems and srows != drows:
        diff = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
        extra = ""
        if len(srows) != len(drows):
            extra = f" (row canon counts {len(srows)}/{len(drows)})"
        problems.append(f"values differ{extra}, first diffs: {diff}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows-only ({len(spdf)} rows, no oracle)")
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        problems = compare(spdf, dpdf)
        if name == "ngram_jaccard_pairs_docs" and not problems:
            # ADVICE r7: the oracle does not model the group cap — the
            # parity PASS is only meaningful while no member was
            # dropped. A corpus past the cap must fail the gate loudly.
            from go_pkg_spider_spark.entry_queries import ngram_cap_parity_guard

            m = ngram_cap_parity_guard(spark, sf_dir)
            if m.get("dropped_members", 0) > 0:
                problems = [
                    f"group cap engaged (dropped_members={m['dropped_members']},"
                    f" max_group_members={m.get('max_group_members')}) — oracle"
                    " does not model the cap; this corpus belongs on the"
                    " minhash_lsh path"
                ]
            else:
                print(
                    f"  ngram cap headroom: max_group_members="
                    f"{m.get('max_group_members')}, dropped_members=0"
                )
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"PASS {name} ({len(spdf)} rows)")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
