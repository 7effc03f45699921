"""Cut-bucket boundary proofs for ``funnel_steps_twostage``.

The rewrite's exactness rests on: the strict-after rule at the cut
timestamp (an event AT t1 never counts as step 2), coarse/fine
agreement at the day-bucket seam (a click 1µs into the next bucket is
coarse, 1µs after t1 in the SAME bucket is fine — both must win when
they are the minimum), chained cuts landing in different buckets, and
users stalling at every depth. Crafted fixtures pin each; a
hypothesis property compares the full output against a brute-force
Python funnel over boundary-dense corpora. The engine-vs-engine check
asserts equality with the flat ``funnel_steps`` on the real fixture.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhousebackup_spark.operators.analytics16 import BUCKET_US
from clickhousebackup_spark.registry import all_specs

from .conftest import write_events_fixture

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
DAY = BUCKET_US


def _mk(evs, tmp_path, spark):
    """evs: list of (event_id, us, user_id, type)."""
    rows = [
        (eid, EPOCH + timedelta(microseconds=us), uid, etype, 0.0, "")
        for eid, us, uid, etype in evs
    ]
    return write_events_fixture(spark, tmp_path, rows)


def _brute(evs):
    by_user: dict = {}
    for _, us, uid, etype in evs:
        by_user.setdefault(uid, []).append((us, etype))
    out = []
    for uid, rows in by_user.items():
        t1 = min((us for us, t in rows if t == "view"), default=None)
        t2 = (
            min(
                (us for us, t in rows if t == "click" and us > t1),
                default=None,
            )
            if t1 is not None
            else None
        )
        t3 = (
            min(
                (us for us, t in rows if t == "purchase" and us > t2),
                default=None,
            )
            if t2 is not None
            else None
        )
        depth = 0 if t1 is None else 1 if t2 is None else 2 if t3 is None else 3
        out.append((uid, depth))
    return sorted(out)


def _run(spark, d, key="funnel_steps_twostage"):
    return sorted(
        (r["user_id"], r["funnel_depth"])
        for r in all_specs()[key].fn(spark, d).collect()
    )


def test_strict_after_at_cut_and_seams(spark, tmp_path):
    """user 1: click AT t1 doesn't count, click 1µs later does;
    user 2: the only qualifying click is 1µs into the NEXT bucket
    (pure coarse path); user 3: clicks both 1µs after t1 (fine,
    same bucket) and next-bucket (coarse) — fine must win the min;
    user 4: full depth with each cut in a different bucket."""
    evs = [
        (1, 100, 1, "view"),
        (2, 100, 1, "click"),            # AT the cut: ignored
        (3, 101, 1, "click"),            # strict after: t2
        (4, DAY - 1, 2, "view"),
        (5, DAY, 2, "click"),            # next bucket, 1µs later
        (6, 50, 3, "view"),
        (7, 51, 3, "click"),             # fine candidate (same bucket)
        (8, DAY + 5, 3, "click"),        # coarse candidate (later)
        (9, 10, 4, "view"),
        (10, DAY + 10, 4, "click"),      # cut t2 in bucket 1
        (11, 3 * DAY, 4, "purchase"),    # t3 in bucket 3
    ]
    d = _mk(evs, tmp_path, spark)
    got = _run(spark, d)
    assert got == _brute(evs) == [(1, 2), (2, 2), (3, 2), (4, 3)]


def test_depth_zero_and_stalls(spark, tmp_path):
    """No view -> 0 even with clicks/purchases; view-only -> 1;
    purchase before the click cut -> stalls at 2."""
    evs = [
        (1, 5, 1, "click"),
        (2, 6, 1, "purchase"),           # user 1: no view -> 0
        (3, 5, 2, "view"),               # user 2: view only -> 1
        (4, 5, 3, "view"),
        (5, 10, 3, "purchase"),          # before t2 exists
        (6, 20, 3, "click"),             # t2 = 20; no purchase after
    ]
    d = _mk(evs, tmp_path, spark)
    got = _run(spark, d)
    assert got == _brute(evs) == [(1, 0), (2, 1), (3, 2)]


def test_matches_flat_key_on_fixture(spark, sf_dir):
    assert _run(spark, sf_dir) == _run(spark, sf_dir, "funnel_steps")


offsets = st.sampled_from(
    [0, 1, 2, DAY - 1, DAY, DAY + 1, 2 * DAY, 2 * DAY + 1]
)
event_sets = st.lists(
    st.tuples(
        offsets,
        st.sampled_from(["view", "click", "purchase"]),
        st.integers(min_value=1, max_value=2),
    ),
    min_size=1,
    max_size=10,
)


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=event_sets)
def test_property_matches_brute(spark, tmp_path_factory, raw):
    evs = [(i, us, uid, t) for i, (us, t, uid) in enumerate(raw)]
    d = _mk(evs, tmp_path_factory.mktemp("funl"), spark)
    assert _run(spark, d) == _brute(evs)


def test_oracle_is_shared_object():
    """The flat and two-stage funnel keys promise hash-identical
    results, so their oracle must be ONE object (behavior.FUNNEL_ORACLE)
    — a copy could silently drift. Same contract as the sessionize trio
    sharing analytics5.SESSIONIZE_ORACLE."""
    from clickhousebackup_spark.registry import all_specs

    specs = all_specs()
    assert specs["funnel_steps"].oracle is specs["funnel_steps_twostage"].oracle
    assert (
        specs["sessionize_gap"].oracle
        is specs["sessionize_gap_twostage"].oracle
        is specs["sessionize_gap_adaptive"].oracle
    )
    assert (
        specs["path_transitions"].oracle
        is specs["path_transitions_twostage"].oracle
    )
