"""Exactness proofs for ``win_running_sum_twostage``.

The two-stage rewrite (operators/analytics16.py) claims hash-identical
output to the flat per-customer ``win_running_sum`` for ANY input.
The decomposition invariant: DECIMAL(38,6) addition is exact and
associative, so prefix(order) = offset(bucket) + local_prefix(order)
exactly, where offset is the sum of all earlier day-buckets' totals
for that customer. Crafted fixtures pin what the decomposition lives
or dies on:

- orders spanning several day buckets, including single-order and
  empty buckets (the offset window skips non-existent buckets by
  construction);
- orders at exactly midnight (first µs of a day belongs to the new
  bucket — and the running order is unaffected because day truncation
  is monotone in o_orderdate);
- same-date orders resolved by the o_orderkey tiebreak WITHIN a
  bucket (the only place the tiebreak can matter);
- cent values whose doubles are inexact (0.1-style) — the decimal
  grid absorbs them identically in both stages.

A hypothesis property compares against a brute-force Python prefix
over Decimal values.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhousebackup_spark.registry import all_specs

DAY0 = datetime(2024, 1, 1)

ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _mk(rows, tmp_path, spark):
    """rows: list of (orderkey, custkey, price, day_offset_hours)."""
    data = [
        (ok, ck, "O", float(price), DAY0 + timedelta(hours=h), "1-URGENT")
        for ok, ck, price, h in rows
    ]
    d = str(tmp_path)
    spark.createDataFrame(data, ORDERS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(f"{d}/orders.parquet")
    return d


def _brute(rows):
    """Exact decimal prefix under the (o_orderdate, o_orderkey) order."""
    by_cust: dict = {}
    for ok, ck, price, h in rows:
        by_cust.setdefault(ck, []).append((h, ok, price))
    out = {}
    for ck, orders in by_cust.items():
        orders.sort()
        acc = Decimal(0)
        for h, ok, price in orders:
            # mirror the engines' double->DECIMAL(38,6) cast
            acc += Decimal(repr(float(price))).quantize(Decimal("0.000001"))
            out[ok] = float(acc)
    return out


def _engine(spark, d, key):
    return {
        r["o_orderkey"]: r["running_total"]
        for r in all_specs()[key].fn(spark, d).collect()
    }


def test_buckets_boundaries_and_tiebreak(spark, tmp_path):
    rows = [
        # cust 1: three buckets incl. a midnight order and a same-date
        # tiebreak pair (orderkeys 12 < 13 on the same timestamp)
        (10, 1, 100.25, 1),
        (11, 1, 50.50, 25),      # next day
        (12, 1, 10.10, 48),      # exactly midnight of day 3
        (13, 1, 20.01, 48),      # same instant -> orderkey tiebreak
        (14, 1, 5.00, 6 * 24),   # empty buckets in between
        # cust 2: single order
        (20, 2, 0.10, 3),
    ]
    d = _mk(rows, tmp_path, spark)
    got = _engine(spark, d, "win_running_sum_twostage")
    assert got == _brute(rows)
    assert got == _engine(spark, d, "win_running_sum")


def test_oracle_is_shared_object():
    specs = all_specs()
    assert (
        specs["win_running_sum"].oracle
        is specs["win_running_sum_twostage"].oracle
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),          # cust
            st.integers(min_value=0, max_value=3),          # day
            st.sampled_from([0, 1, 23]),                    # hour in day
            st.integers(min_value=0, max_value=99999),      # cents
        ),
        min_size=1,
        max_size=24,
    )
)
def test_property_matches_brute_and_flat(spark, tmp_path_factory, raw):
    rows = [
        (i, ck, cents / 100.0, day * 24 + hour)
        for i, (ck, day, hour, cents) in enumerate(raw)
    ]
    d = _mk(rows, tmp_path_factory.mktemp("runsum"), spark)
    got = _engine(spark, d, "win_running_sum_twostage")
    assert got == _brute(rows)
