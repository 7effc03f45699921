"""Exactness proofs for ``agg_weighted_median_twostage``
(operators/analytics21.py, skew-playbook family TEN).

The rewrite claims value-identical output to the flat
``agg_weighted_median`` for ANY input; the shared oracle pins that at
the fixture scales, but the fixture rarely exercises the seams the
histogram selection lives or dies on:

- the weighted-median rank landing exactly ON a bucket boundary
  (2·cum_excl == tw: the crossing row is the target bucket's FIRST);
- all of a group's weight in ONE bucket (degenerate histogram —
  pass 2 sorts the whole group, the irreducible case);
- duplicate values inside the target bucket (event_id tiebreak);
- even vs odd total weight around the 2·cw >= tw crossing.

Crafted fixtures pin each; a hypothesis property compares the engine
key against a brute-force Python weighted median over adversarial
weight/value sets (and flat-vs-twostage engine-to-engine).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhousebackup_spark.registry import all_specs

from .conftest import write_events_fixture

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _mk(rows, tmp_path, spark):
    """rows: list of (event_id, user_id, event_type, value);
    weight = user_id % 5 + 1 (the key's deterministic weights)."""
    data = [
        (eid, EPOCH + timedelta(seconds=eid), uid, etype, float(v), "")
        for eid, uid, etype, v in rows
    ]
    return write_events_fixture(spark, tmp_path, data)


def _rows_of(spark, d, key):
    return sorted(
        tuple(r) for r in all_specs()[key].fn(spark, d).collect()
    )


def _brute(rows):
    """Lower weighted median per type: smallest value whose inclusive
    cumulative weight (over the (value, event_id) total order)
    doubled reaches the total."""
    out = []
    by_type: dict = {}
    for eid, uid, etype, v in rows:
        by_type.setdefault(etype, []).append((float(v), eid, uid % 5 + 1))
    for etype, items in by_type.items():
        items.sort(key=lambda t: (t[0], t[1]))
        total = sum(w for _, _, w in items)
        cw = 0
        for v, _, w in items:
            cw += w
            if 2 * cw >= total:
                out.append((etype, v))
                break
    return sorted(out)


def test_crossing_on_bucket_boundary(spark, tmp_path):
    """Weights placed so 2·cum_excl == tw at a bucket seam: bucket
    [1,2) holds weight 3, bucket [2,3) holds weight 3 — the crossing
    row is bucket 2's FIRST row, and the target-bucket filter
    (2·cum_excl < tw) must select bucket 1 (its inclusive cumulative
    6 == tw... ) — pinned against brute force rather than intuition."""
    rows = [
        # user_id 2 -> weight 3 each; two rows in different buckets
        (1, 2, "A", 1.5),
        (2, 2, "A", 2.5),
    ]
    d = _mk(rows, tmp_path, spark)
    got = _rows_of(spark, d, "agg_weighted_median_twostage")
    assert got == _brute(rows)
    assert got == _rows_of(spark, d, "agg_weighted_median")


def test_single_bucket_degenerate(spark, tmp_path):
    """All values of a group inside one floor-bucket: the histogram
    collapses to one row and pass 2 sorts the whole group — still
    exact (the irreducible mass-at-one-bucket case)."""
    rows = [(i, i, "B", 7.0 + i * 0.01) for i in range(20)]
    d = _mk(rows, tmp_path, spark)
    got = _rows_of(spark, d, "agg_weighted_median_twostage")
    assert got == _brute(rows)
    assert got == _rows_of(spark, d, "agg_weighted_median")


def test_duplicate_values_tiebreak(spark, tmp_path):
    """Identical values with different weights: the (value, event_id)
    total order decides which copy's cumulative weight crosses; both
    plans and the brute force must agree."""
    rows = [
        (1, 4, "C", 3.0),   # weight 5
        (2, 0, "C", 3.0),   # weight 1
        (3, 1, "C", 3.0),   # weight 2
        (4, 0, "C", 9.0),   # weight 1
    ]
    d = _mk(rows, tmp_path, spark)
    got = _rows_of(spark, d, "agg_weighted_median_twostage")
    assert got == _brute(rows) == [("C", 3.0)]


event_sets = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),      # user -> weight
        st.sampled_from(["A", "B"]),
        st.sampled_from([0.25, 0.75, 1.0, 1.5, 2.0, 2.25, 5.5, 5.75]),
    ),
    min_size=1,
    max_size=12,
)


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(evs=event_sets)
def test_property_matches_brute_force(spark, tmp_path_factory, evs):
    rows = [
        (i, uid, etype, v) for i, (uid, etype, v) in enumerate(evs)
    ]
    d = _mk(rows, tmp_path_factory.mktemp("wm"), spark)
    assert _rows_of(spark, d, "agg_weighted_median_twostage") == _brute(rows)


def test_oracle_object_shared():
    s = all_specs()
    assert (
        s["agg_weighted_median"].oracle
        is s["agg_weighted_median_twostage"].oracle
    )
