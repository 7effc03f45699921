"""Exactness proofs for ``win_percent_rank_twostage``
(operators/analytics21.py, skew-playbook family ELEVEN).

The rewrite claims value-identical output to the flat
win_percent_rank for ANY input. The decisive observation: the flat
window orders by the UNIQUE (o_totalprice, o_orderkey) pair, so
percent_rank and cume_dist degenerate to row-position arithmetic —
the crafted cases pin exactly the seams of the position fold:

- rows straddling a kilobucket boundary (offset composition);
- equal prices with different orderkeys (unique-order tiebreak:
  still distinct positions, NOT peers — the property a tie-aware
  peer fold would get wrong, caught live during development);
- a single-row status (n=1: pct_rank guards the 0/0 to 0.0 —
  engine-native semantics both sides);
- empty buckets between occupied ones.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhousebackup_spark.registry import all_specs

ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate date, o_orderpriority string"
)


def _mk(rows, tmp_path, spark):
    """rows: list of (orderkey, status, totalprice)."""
    import datetime as dt

    data = [
        (k, k % 7, s, float(p), dt.date(2024, 1, 1), "1-URGENT")
        for k, s, p in rows
    ]
    d = str(tmp_path)
    spark.createDataFrame(data, ORDERS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(f"{d}/orders.parquet")
    return d


def _rows_of(spark, d, key):
    return sorted(
        tuple(r) for r in all_specs()[key].fn(spark, d).collect()
    )


def _brute(rows):
    out = []
    by_s: dict = {}
    for k, s, p in rows:
        by_s.setdefault(s, []).append((float(p), k))
    for s, items in by_s.items():
        items.sort()
        n = len(items)
        for rn, (p, k) in enumerate(items, start=1):
            pct = (rn - 1) / (n - 1) if n > 1 else 0.0
            out.append((k, s, p, pct, rn / n))
    return sorted(out)


def test_seams_and_singletons(spark, tmp_path):
    rows = [
        # status A: rows straddling the 1000-kilobucket boundary,
        # with an equal-price pair (distinct keys -> distinct ranks)
        (1, "A", 999.5),
        (2, "A", 1000.5),
        (3, "A", 1000.5),
        (4, "A", 3500.0),   # empty bucket 2 in between
        # status B: single row -> pct_rank 0.0 by the n=1 guard
        (5, "B", 42.0),
    ]
    d = _mk(rows, tmp_path, spark)
    got = _rows_of(spark, d, "win_percent_rank_twostage")
    assert got == _brute(rows)
    assert got == _rows_of(spark, d, "win_percent_rank")


prices = st.sampled_from(
    [10.0, 999.5, 1000.0, 1000.5, 1999.99, 2000.0, 2000.0, 5251.25]
)
order_sets = st.lists(
    st.tuples(st.sampled_from(["A", "B"]), prices),
    min_size=1,
    max_size=12,
)


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(os_=order_sets)
def test_property_matches_brute_force(spark, tmp_path_factory, os_):
    rows = [(i + 1, s, p) for i, (s, p) in enumerate(os_)]
    d = _mk(rows, tmp_path_factory.mktemp("pr"), spark)
    assert _rows_of(spark, d, "win_percent_rank_twostage") == _brute(rows)


def test_oracle_object_shared():
    s = all_specs()
    assert (
        s["win_percent_rank"].oracle
        is s["win_percent_rank_twostage"].oracle
    )
