"""Property-based exactness proofs for the sweep-line / frame-array
/ merge-state families (sibling of test_ppjoin_property.py).

``intervals_union_length`` claims the two-window gaps-and-islands
pass computes the EXACT union length of arbitrary overlapping
interval sets; ``win_moving_median`` claims the sorted-frame-array
readout equals the true centered median with mean-of-middles edge
interpolation; ``merge_versioned_collapsing`` claims its net-then-
newest two-stage plan equals VersionedCollapsingMergeTree FINAL
replay. All are algorithmic identities, so hypothesis generates
adversarial inputs (nested/identical/abutting intervals; tied values
and tied timestamps; net-zero and delete-only versions) and compares
against brute-force Python.
"""

from __future__ import annotations

import os
from datetime import date, datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhousebackup_spark.registry import all_specs

pytestmark = pytest.mark.slow

#: interval generator: keys drive both the span start (day offset
#: 0-29) and, through the operator's own o_orderkey%30+1 rule, the
#: span length — so nesting, identity, abutment (s == prev e, which
#: must MERGE: half-open [s, e) semantics), and containment all occur.
interval_corpora = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=400),  # o_orderkey
        st.integers(min_value=0, max_value=29),   # start-day offset
        st.sampled_from(["1-URGENT", "3-MEDIUM"]),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


def _brute_union(rows):
    by_pri = {}
    for okey, off, pri in rows:
        s = off
        e = off + (okey % 30 + 1)
        by_pri.setdefault(pri, []).append((s, e, okey))
    out = {}
    for pri, iv in by_pri.items():
        iv.sort()
        islands = []
        for s, e, _ in iv:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        out[pri] = (len(islands), sum(e - s for s, e in islands))
    return out


@given(interval_corpora)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_union_length_matches_brute_force(spark, tmp_path_factory, rows):
    d = str(tmp_path_factory.mktemp("ivl"))
    base = datetime(2024, 1, 1)
    spark.createDataFrame(
        [
            (okey, 1, "O", 1.0, base + timedelta(days=off), pri)
            for okey, off, pri in rows
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    got = {
        r["pri"]: (r["n_islands"], r["union_days"])
        for r in all_specs()["intervals_union_length"].fn(spark, d).collect()
    }
    assert got == _brute_union(rows)


#: per-user value series with heavy ties (3-value domain) and
#: duplicate timestamps broken by event_id — the median edge cases.
median_series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user
        st.sampled_from([1.0, 2.0, 4.0]),       # value (ties common)
        st.integers(min_value=0, max_value=3),  # minute (ts ties)
    ),
    min_size=1,
    max_size=14,
)


def _brute_med5(rows):
    per_user = {}
    for eid, (u, v, minute) in enumerate(rows):
        per_user.setdefault(u, []).append((minute, eid, v))
    want = {}
    for u, series in per_user.items():
        series.sort()
        vals = [v for _, _, v in series]
        for i, (_, eid, _) in enumerate(series):
            frame = sorted(vals[max(0, i - 2) : i + 3])
            n = len(frame)
            if n % 2 == 1:
                want[eid] = frame[n // 2]
            else:
                want[eid] = (frame[n // 2 - 1] + frame[n // 2]) / 2
    return want


@given(median_series)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_moving_median_matches_brute_force(spark, tmp_path_factory, rows):
    d = str(tmp_path_factory.mktemp("med"))
    base = datetime(2024, 1, 1)
    spark.createDataFrame(
        [
            (eid, base + timedelta(minutes=minute), u, "t", v, "")
            for eid, (u, v, minute) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r["event_id"]: r["med5"]
        for r in all_specs()["win_moving_median"].fn(spark, d).collect()
    }
    assert got == _brute_med5(rows)


#: versioned-collapsing generator: few keys, few versions, signs
#: chosen by the operator's own event_id%4 rule — so net-zero
#: versions, multiply-inserted versions, delete-only versions, and
#: keys with no survivors all occur.
vc_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),  # event_id (id%4==0 -> -1)
        st.integers(min_value=0, max_value=1),   # user
        st.integers(min_value=0, max_value=2),   # version slot (minute)
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


def _brute_versioned_collapse(rows):
    from collections import defaultdict

    net = defaultdict(int)
    keep = {}
    for eid, u, ver in rows:
        sign = -1 if eid % 4 == 0 else 1
        k = (u, ver)
        net[k] += sign
        if sign == 1 and (k not in keep or eid > keep[k]):
            keep[k] = eid
    out = {}
    for (u, ver), n in net.items():
        if n > 0:
            cur = out.get(u)
            if cur is None or ver > cur[0]:
                out[u] = (ver, keep[(u, ver)])
    return {u: eid for u, (ver, eid) in out.items()}


@given(vc_events)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_versioned_collapsing_matches_replay(spark, tmp_path_factory, rows):
    """merge_versioned_collapsing's two-stage plan (net signs per
    version, newest surviving version wins) must equal a direct
    python replay of VersionedCollapsingMergeTree FINAL semantics,
    including net-zero cancellation and delete-only versions."""
    d = str(tmp_path_factory.mktemp("vc"))
    base = datetime(2024, 1, 1)
    spark.createDataFrame(
        [
            (eid, base + timedelta(minutes=ver), u, "t", float(eid), "")
            for eid, u, ver in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r["user_id"]: r["event_id"]
        for r in all_specs()["merge_versioned_collapsing"].fn(spark, d).collect()
    }
    assert got == _brute_versioned_collapse(rows)
