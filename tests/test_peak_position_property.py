"""Property-based exactness proof for ``intervals_peak_position``
tie handling (VERDICT r11 item 8, second family).

The key claims: deltas are pre-aggregated to NET change per distinct
timestamp (so same-instant start/end collisions cancel — half-open
[s, e) semantics where a hand-off at t never counts 2), and the peak
argmax under (conc DESC, t) picks the EARLIEST peak day when the
maximum is reached multiple times. The fixture rarely collides
endpoints; hypothesis generates dense tiny interval sets on a 7-day
domain (collisions and ties routine) and compares against a
brute-force Python sweep. Interval length is encoded through the
key's own ``o_orderkey % 30 + 1`` rule, so the test drives the
registered function itself, not a lookalike.
"""

from __future__ import annotations

from datetime import date, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhousebackup_spark.registry import all_specs

pytestmark = pytest.mark.slow

BASE = date(2024, 3, 1)


def _orders_dir(spark, tmp_path, ivs):
    """ivs: list of (start_day 0..6, length_days 1..5, pri). Encodes
    length via o_orderkey = i*30 + (length-1) so key % 30 + 1 == length."""
    rows = [
        (
            i * 30 + (ln - 1),
            1,
            "O",
            100.0,
            BASE + timedelta(days=sd),
            pri,
            "clerk",
            0,
            "",
        )
        for i, (sd, ln, pri) in enumerate(ivs)
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string, "
        "o_clerk string, o_shippriority int, o_comment string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    return d


def _brute(ivs):
    by_pri: dict = {}
    for sd, ln, pri in ivs:
        by_pri.setdefault(pri, []).append((sd, sd + ln))
    out = []
    for pri, spans in by_pri.items():
        points = sorted({t for s, e in spans for t in (s, e)})
        best = None
        for t in points:
            conc = sum(1 for s, e in spans if s <= t < e)
            if best is None or conc > best[0]:
                best = (conc, t)  # strict > keeps the EARLIEST argmax
        out.append(
            (
                pri,
                best[0],
                (BASE + timedelta(days=best[1])).strftime("%Y-%m-%d"),
            )
        )
    return sorted(out)


def _run(spark, d):
    return sorted(
        (r["pri"], r["max_concurrent"], r["first_peak_day"])
        for r in all_specs()["intervals_peak_position"].fn(spark, d).collect()
    )


def test_handoff_never_counts_two(spark, tmp_path):
    """[0,2) then [2,4): the hand-off day 2 has conc 1, peak day 0."""
    ivs = [(0, 2, "a"), (2, 2, "a")]
    d = _orders_dir(spark, tmp_path, ivs)
    assert _run(spark, d) == [("a", 1, "2024-03-01")] == _brute(ivs)


def test_tie_takes_earliest_peak_day(spark, tmp_path):
    """Two disjoint concurrency-2 towers: the earlier day wins."""
    ivs = [(0, 1, "a"), (0, 1, "a"), (3, 1, "a"), (3, 1, "a")]
    d = _orders_dir(spark, tmp_path, ivs)
    assert _run(spark, d) == [("a", 2, "2024-03-01")] == _brute(ivs)


intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),  # start day
        st.integers(min_value=1, max_value=5),  # length
        st.sampled_from(["a", "b"]),
    ),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ivs=intervals)
def test_property_peak_matches_brute(spark, tmp_path_factory, ivs):
    d = _orders_dir(spark, tmp_path_factory.mktemp("peak"), ivs)
    assert _run(spark, d) == _brute(ivs)
