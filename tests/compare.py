"""Order-insensitive result comparison between a Spark DataFrame and a
DuckDB relation — a faithful local stand-in for the driver's
row-count + schema + value-hash check, but with *exact* value equality
so any wobble the hash would catch fails loudly here first.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


def _norm(v):
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v  # exact — conventions in exprs.py make this safe
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    if hasattr(v, "to_pydatetime"):  # pandas Timestamp
        return _norm(v.to_pydatetime())
    return v


def _spark_rows(df):
    cols = sorted(df.columns)
    return cols, [tuple(_norm(r[c]) for c in cols) for r in df.collect()]


def _duck_rows(rel_df):
    cols = sorted(rel_df.columns)
    recs = rel_df.to_dict("records")
    out = []
    for r in recs:
        row = []
        for c in cols:
            v = r[c]
            try:
                import pandas as pd

                if v is pd.NaT or (v is not None and not isinstance(v, (list, tuple)) and pd.isna(v)):
                    v = None
            except (TypeError, ValueError):
                pass
            row.append(_norm(v))
        out.append(tuple(row))
    return cols, out


def assert_same_result(spark_df, duck_con, oracle_sql: str, name: str = "?"):
    s_cols, s_rows = _spark_rows(spark_df)
    d_df = duck_con.execute(oracle_sql).fetch_df()
    d_cols, d_rows = _duck_rows(d_df)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    s_sorted = sorted(s_rows, key=repr)
    d_sorted = sorted(d_rows, key=repr)
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        assert a == b, (
            f"{name}: first differing row #{i} (cols {s_cols}):\n"
            f"  spark  : {a}\n  duckdb : {b}"
        )
