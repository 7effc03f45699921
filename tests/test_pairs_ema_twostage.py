"""Seam-exactness proofs for the round-14 two-stage siblings
(operators/analytics20.py): sequence_count_pairs_twostage and
agg_ema_twostage.

Both claim hash-identical output to their flat keys for ANY input;
the shared oracles pin that at the fixture scales, but the fixtures
rarely exercise the seams the rewrites live or die on:

- a (view, purchase) pair whose members sit in DIFFERENT day buckets
  (the cross-bucket term), including pairs spanning EMPTY buckets;
- a purchase with zero prior views (must emit 0, not drop the user);
- a user whose trailing-K window spans 2+ buckets (the EMA selection
  seam), including the exact boundary where bucket pruning must keep
  a bucket contributing exactly ONE row;
- duplicate timestamps at a bucket boundary (event_id tiebreak).

Crafted fixtures pin each seam; a hypothesis property compares both
engine keys flat-vs-twostage over adversarial event sets clustered
near bucket boundaries (engine-vs-engine — no oracle needed, which is
exactly the two-stage contract: same rows, same bits).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhousebackup_spark.operators.analytics16 import BUCKET_US
from clickhousebackup_spark.operators.behavior import EMA_HORIZON
from clickhousebackup_spark.registry import all_specs

from .conftest import write_events_fixture

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
DAY = BUCKET_US


def _mk(rows_us, tmp_path, spark):
    """rows_us: list of (event_id, us, user_id, type, value)."""
    rows = [
        (eid, EPOCH + timedelta(microseconds=us), uid, etype, val, "")
        for eid, us, uid, etype, val in rows_us
    ]
    return write_events_fixture(spark, tmp_path, rows)


def _rows_of(spark, d, key):
    return sorted(
        tuple(r) for r in all_specs()[key].fn(spark, d).collect()
    )


def _pairs_brute(rows_us):
    by_user: dict = {}
    for eid, us, uid, etype, _ in rows_us:
        by_user.setdefault(uid, []).append((us, eid, etype))
    out = []
    for uid, evs in by_user.items():
        evs.sort()
        views = 0
        pairs = 0
        purchases = 0
        for _, _, etype in evs:
            if etype == "view":
                views += 1
            elif etype == "purchase":
                pairs += views
                purchases += 1
        if purchases:
            out.append((uid, pairs))
    return sorted(out)


def test_pairs_cross_bucket_and_zero_view_purchase(spark, tmp_path):
    rows = [
        # user 1: view on day 0, purchase on day 2 (empty day between)
        (1, 10, 1, "view", 0.0),
        (2, 2 * DAY + 5, 1, "purchase", 0.0),
        # user 2: purchase with NO prior views -> emits 0
        (3, 5, 2, "purchase", 0.0),
        # user 3: views both sides of a seam + two purchases
        (4, DAY - 2, 3, "view", 0.0),
        (5, DAY - 1, 3, "purchase", 0.0),   # 1 pair (same bucket)
        (6, DAY + 1, 3, "view", 0.0),
        (7, DAY + 2, 3, "purchase", 0.0),   # 2 pairs (1 cross + 1 local)
        # user 4: views only -> no output row
        (8, 7, 4, "view", 0.0),
    ]
    d = _mk(rows, tmp_path, spark)
    got = _rows_of(spark, d, "sequence_count_pairs_twostage")
    assert got == _pairs_brute(rows) == [(1, 1), (2, 0), (3, 3)]
    assert got == _rows_of(spark, d, "sequence_count_pairs")


def test_ema_selection_spans_buckets(spark, tmp_path):
    """Trailing-K rows straddle a bucket seam: K=100, user has 60
    events on day 0 and 60 on day 1 -> the selection takes all 60 of
    day 1 and the NEWEST 40 of day 0; flat and two-stage must agree
    to the bit."""
    rows = []
    for i in range(60):
        rows.append((i, i * 1000, 9, "t", float(i % 7) + 0.125))
    for i in range(60):
        rows.append((100 + i, DAY + i * 1000, 9, "t", float(i % 5) + 0.25))
    d = _mk(rows, tmp_path, spark)
    flat = _rows_of(spark, d, "agg_ema")
    two = _rows_of(spark, d, "agg_ema_twostage")
    assert flat == two and len(flat) == 1


def test_ema_bucket_pruning_boundary(spark, tmp_path):
    """excl_newer == K-1 keeps a bucket contributing exactly one row;
    excl_newer == K prunes it. 100 events on day 2, 1 on day 1, 50 on
    day 0: day-1's single event is the 101st-newest -> pruned, and
    day 0 entirely pruned; the EMA folds exactly the 100 day-2 rows."""
    rows = [(i, 2 * DAY + i * 1000, 5, "t", 1.0 + i * 0.001) for i in range(100)]
    rows += [(500, DAY + 5, 5, "t", 99.0)]
    rows += [(600 + i, i * 1000, 5, "t", 42.0) for i in range(50)]
    d = _mk(rows, tmp_path, spark)
    flat = _rows_of(spark, d, "agg_ema")
    two = _rows_of(spark, d, "agg_ema_twostage")
    assert flat == two and len(flat) == 1
    # the pruned rows (99.0 / 42.0) must not influence the fold: the
    # flat key's rn<=100 keeps only day-2 rows, so both agree there
    # by construction; this asserts the two-stage pruning matched it.


event_sets = st.lists(
    st.tuples(
        st.sampled_from([0, 1, DAY - 1, DAY, DAY + 1, 2 * DAY, 3 * DAY - 1]),
        st.integers(min_value=0, max_value=3),    # extra microseconds
        st.integers(min_value=1, max_value=2),    # user
        st.sampled_from(["view", "purchase", "click"]),
        st.sampled_from([0.0, 1.5, 2.25, -3.125]),
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
def test_property_flat_equals_twostage(spark, tmp_path_factory, evs):
    rows = [
        (i, base + extra, uid, etype, val)
        for i, (base, extra, uid, etype, val) in enumerate(evs)
    ]
    d = _mk(rows, tmp_path_factory.mktemp("pe"), spark)
    assert _rows_of(spark, d, "sequence_count_pairs_twostage") == _pairs_brute(
        rows
    )
    assert _rows_of(spark, d, "agg_ema_twostage") == _rows_of(
        spark, d, "agg_ema"
    )


def test_horizon_constant_shared():
    """The selection bound is ONE constant: a drifted copy would break
    the bit-identical claim silently."""
    import clickhousebackup_spark.operators.analytics20 as a20

    assert a20.EMA_HORIZON is EMA_HORIZON
