"""Exactness proofs for the two-pass histogram quantile rewrite
(operators/analytics18.py — skew playbook family six).

``agg_percentile_exact_twostage`` claims BIT-identical output to the
flat ``agg_percentile_exact`` for ANY input: the histogram pass
locates each needed global rank's value bucket (floor(value) is
monotone, so bucket order is value order and equal values never
straddle a bucket), the selection pass ranks only inside straddling
buckets, and the interpolation replays the flat key's expression tree
verbatim. Crafted fixtures pin what the decomposition lives or dies
on:

- lo/hi ranks of one quartile landing in DIFFERENT buckets (the
  cum_start seam must be exact on both sides);
- values exactly ON an integer bucket boundary (3.0) next to values
  just below it (2.999…);
- a group collapsed into ONE bucket (repeated value — the degenerate
  corpus the module docstring declares irreducible);
- single-row and two-row groups (hi rank capped at n);
- negative values (floor(-0.5) = -1 ordering below bucket 0).

A hypothesis property compares the two-stage key against BOTH the
flat engine key and a pure-Python brute force that replays the same
double arithmetic, over adversarially small corpora (quantized values
so ties and boundary hits are common).

The tie-aware cousin ``win_cume_dist_nth_twostage`` (analytics17.py)
is proven at the bottom of this file — it shares the events fixture
helpers and the same value-bucket invariant, with peer-group ties
and the rank-2 recovery as the extra surfaces under test.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhousebackup_spark.registry import all_specs

DAY0 = datetime(2024, 1, 1)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

QS = (0.25, 0.5, 0.75)


def _mk(rows, tmp_path, spark):
    """rows: list of (event_id, event_type, value)."""
    data = [
        (eid, DAY0 + timedelta(minutes=eid), eid % 7, et, float(v), "{}")
        for eid, et, v in rows
    ]
    d = str(tmp_path)
    spark.createDataFrame(data, EVENTS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(f"{d}/events.parquet")
    return d


def _brute(rows):
    """{event_type: (q25, q50, q75)} replaying the exact double ops
    of the registered keys: pos = (n-1)*q, g = pos - floor(pos),
    out = lo + g*(hi - lo) with hi rank capped at n."""
    by_type: dict = {}
    for eid, et, v in rows:
        by_type.setdefault(et, []).append((float(v), eid))
    out = {}
    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        qs = []
        for q in QS:
            pos = (n - 1) * q
            lo = vals[math.floor(pos)][0]
            hi = vals[min(math.floor(pos) + 1, n - 1)][0]
            g = pos - math.floor(pos)
            qs.append(lo + g * (hi - lo))
        out[et] = tuple(qs)
    return out


def _engine(spark, d, key):
    return {
        r["event_type"]: (r["q25"], r["q50"], r["q75"])
        for r in all_specs()[key].fn(spark, d).collect()
    }


def test_crafted_bucket_seams(spark, tmp_path):
    rows = [
        # type A: 5 rows spread so q25's lo/hi straddle buckets 1 and
        # 2 (ranks 2 and 3 hold 1.75 and 2.25) and q75's straddle
        # buckets 2 and 3 (3.0 sits exactly ON a boundary).
        (0, "A", 0.5),
        (1, "A", 1.75),
        (2, "A", 2.25),
        (3, "A", 2.999),
        (4, "A", 3.0),
        # type B: one bucket only — every value identical (the
        # declared degenerate collapse; pass 2 sorts the whole
        # bucket, exactness unaffected).
        (10, "B", 7.0),
        (11, "B", 7.0),
        (12, "B", 7.0),
        # type C: single row — all quartiles equal it, hi capped at n.
        (20, "C", 42.5),
        # type D: two rows with a negative value (floor(-0.5) = -1
        # bucket sorts below bucket 0).
        (30, "D", -0.5),
        (31, "D", 0.25),
    ]
    d = _mk(rows, tmp_path, spark)
    want = _brute(rows)
    assert _engine(spark, d, "agg_percentile_exact_twostage") == want
    assert _engine(spark, d, "agg_percentile_exact") == want


def test_oracle_is_shared_object():
    specs = all_specs()
    assert (
        specs["agg_percentile_exact"].oracle
        is specs["agg_percentile_exact_twostage"].oracle
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw=st.lists(
        st.tuples(
            st.sampled_from(["A", "B", "C"]),
            # quarter-unit grid in [-2, 8]: ties, integer-boundary
            # values, and multi-value buckets are all common
            st.integers(min_value=-8, max_value=32),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_property_matches_flat_and_brute(spark, tmp_path_factory, raw):
    rows = [(i, et, quarters / 4.0) for i, (et, quarters) in enumerate(raw)]
    d = _mk(rows, tmp_path_factory.mktemp("pcttwo"), spark)
    got = _engine(spark, d, "agg_percentile_exact_twostage")
    assert got == _brute(rows)
    assert got == _engine(spark, d, "agg_percentile_exact")


def _brute_cume(rows):
    """{event_id: (cd, second)} — tie-aware cume_dist over value ASC
    and nth_value(event_id, 2) under (value, event_id), per type."""
    by_type: dict = {}
    for eid, et, v in rows:
        by_type.setdefault(et, []).append((float(v), eid))
    out = {}
    for vals in by_type.values():
        vals.sort()
        n = len(vals)
        second = vals[1][1] if n >= 2 else None
        for v, eid in vals:
            peers_le = sum(1 for v2, _ in vals if v2 <= v)
            out[eid] = (peers_le / n, second)
    return out


def test_cume_dist_twostage_crafted(spark, tmp_path):
    rows = [
        # type A: heavy ties at 2.0 (cd must count ALL peers), a
        # bucket-boundary pair, and the rank-2 row inside the lowest
        # bucket.
        (0, "A", 2.0),
        (1, "A", 2.0),
        (2, "A", 2.0),
        (3, "A", 0.5),
        (4, "A", 0.75),
        (5, "A", 3.0),
        # type B: single row — cd = 1.0, second is NULL.
        (10, "B", 9.25),
        # type C: the two lowest rows split across buckets (rank 2
        # lives in the SECOND non-empty bucket).
        (20, "C", 0.25),
        (21, "C", 5.5),
        (22, "C", 7.0),
    ]
    d = _mk(rows, tmp_path, spark)
    want = _brute_cume(rows)
    got = {
        r["event_id"]: (r["cd"], r["second_event_id"])
        for r in all_specs()["win_cume_dist_nth_twostage"]
        .fn(spark, d)
        .collect()
    }
    assert got == want
    flat = {
        r["event_id"]: (r["cd"], r["second_event_id"])
        for r in all_specs()["win_cume_dist_nth"].fn(spark, d).collect()
    }
    assert flat == want
    specs = all_specs()
    assert (
        specs["win_cume_dist_nth"].oracle
        is specs["win_cume_dist_nth_twostage"].oracle
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw=st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),
            # quarter-grid values: ties and unit-boundary hits common
            st.integers(min_value=-8, max_value=32),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_cume_dist_property_matches_flat_and_brute(
    spark, tmp_path_factory, raw
):
    rows = [(i, et, q / 4.0) for i, (et, q) in enumerate(raw)]
    d = _mk(rows, tmp_path_factory.mktemp("cdtwo"), spark)
    got = {
        r["event_id"]: (r["cd"], r["second_event_id"])
        for r in all_specs()["win_cume_dist_nth_twostage"]
        .fn(spark, d)
        .collect()
    }
    assert got == _brute_cume(rows)
    flat = {
        r["event_id"]: (r["cd"], r["second_event_id"])
        for r in all_specs()["win_cume_dist_nth"].fn(spark, d).collect()
    }
    assert got == flat
