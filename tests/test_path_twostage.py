"""Seam exactness proofs for ``path_transitions_twostage``.

The two-stage rewrite (operators/analytics16.py) claims hash-identical
output to the flat per-user ``path_transitions`` for ANY input. The
decomposition invariant: every consecutive pair of a user's
(ts, event_id)-ordered journey is counted EXACTLY once — within-bucket
pairs by the (user, day-bucket) local lag, cross-bucket pairs by the
summary-level lag that pairs each bucket's first event with the
previous NON-EMPTY bucket's last event. Crafted fixtures pin the seams
that decomposition lives or dies on:

- a journey spanning 3+ day buckets (each seam contributes exactly one
  transition, locals contribute the rest);
- single-event buckets (the event is both first and last — it must
  feed BOTH its backward and forward seam, and no local pair);
- empty buckets between events (seam partner is the previous non-empty
  bucket, not the calendar-adjacent one);
- events exactly on a bucket boundary (first µs of a day belongs to
  the new bucket);
- interleaved users (transitions never cross users).

A hypothesis property then compares the engine result against a
brute-force Python transition counter over adversarial event sets
clustered near bucket boundaries.
"""

from __future__ import annotations

from collections import Counter
from datetime import datetime, timedelta, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhousebackup_spark.operators.analytics16 import BUCKET_US
from clickhousebackup_spark.registry import all_specs

from .conftest import write_events_fixture

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
EPOCH_US = int(EPOCH.timestamp()) * 1_000_000
assert EPOCH_US % BUCKET_US == 0  # offsets below stay bucket-aligned

DAY = BUCKET_US
HOUR = 60 * 60 * 1_000_000


def _at(us: int) -> datetime:
    return EPOCH + timedelta(microseconds=us)


def _mk(rows_us, tmp_path, spark):
    """rows_us: list of (event_id, us, user_id, type)."""
    rows = [
        (eid, _at(us), uid, etype, 0.0, "")
        for eid, us, uid, etype in rows_us
    ]
    return write_events_fixture(spark, tmp_path, rows)


def _brute(rows_us):
    """Flat Python transition counter — the reference semantics."""
    by_user: dict = {}
    for eid, us, uid, etype in rows_us:
        by_user.setdefault(uid, []).append((us, eid, etype))
    pairs: Counter = Counter()
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            pairs[(a, b)] += 1
    return sorted((p, n, c) for (p, n), c in pairs.items())


def _rows_of(spark, d, key):
    return sorted(
        (r["prev_type"], r["next_type"], r["n"])
        for r in all_specs()[key].fn(spark, d).collect()
    )


def test_multi_bucket_chain_and_single_event_buckets(spark, tmp_path):
    """One user, four events in four consecutive buckets (all
    single-event buckets): zero local pairs, three seam pairs."""
    rows = [
        (1, 0 * DAY + HOUR, 7, "a"),
        (2, 1 * DAY + HOUR, 7, "b"),
        (3, 2 * DAY + HOUR, 7, "c"),
        (4, 3 * DAY + HOUR, 7, "d"),
    ]
    d = _mk(rows, tmp_path, spark)
    got = _rows_of(spark, d, "path_transitions_twostage")
    assert got == [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)]
    assert got == _brute(rows)


def test_empty_buckets_between_events(spark, tmp_path):
    """Days 0 and 5 only: the seam partner is the previous NON-EMPTY
    bucket — a calendar-adjacency lag would miss the pair entirely."""
    rows = [(1, HOUR, 3, "x"), (2, 5 * DAY + HOUR, 3, "y")]
    d = _mk(rows, tmp_path, spark)
    assert _rows_of(spark, d, "path_transitions_twostage") == [("x", "y", 1)]


def test_bucket_boundary_event_belongs_to_new_day(spark, tmp_path):
    """An event at exactly midnight is the NEXT bucket's first event:
    the (day0-last -> midnight) pair must be a seam pair, and the
    (midnight -> day1-later) pair a local pair — both counted once."""
    rows = [
        (1, DAY - 1, 9, "a"),   # last µs of day 0
        (2, DAY, 9, "b"),       # first µs of day 1
        (3, DAY + HOUR, 9, "c"),
    ]
    d = _mk(rows, tmp_path, spark)
    got = _rows_of(spark, d, "path_transitions_twostage")
    assert got == [("a", "b", 1), ("b", "c", 1)]
    assert got == _brute(rows)


def test_mixed_local_and_seam_with_interleaved_users(spark, tmp_path):
    """Two users interleaved in time; user 1 has local pairs in two
    buckets plus one seam, user 2 spans a seam only. Counts aggregate
    across users into the shared matrix."""
    rows = [
        (1, 0 * DAY + 1 * HOUR, 1, "a"),
        (2, 0 * DAY + 2 * HOUR, 1, "b"),   # local a->b (day 0)
        (3, 1 * DAY + 1 * HOUR, 1, "a"),   # seam  b->a
        (4, 1 * DAY + 2 * HOUR, 1, "b"),   # local a->b (day 1)
        (5, 0 * DAY + 3 * HOUR, 2, "a"),
        (6, 2 * DAY + 3 * HOUR, 2, "b"),   # seam  a->b (empty day 1)
    ]
    d = _mk(rows, tmp_path, spark)
    got = _rows_of(spark, d, "path_transitions_twostage")
    assert got == [("a", "b", 3), ("b", "a", 1)]
    assert got == _brute(rows)


def test_matches_flat_key_on_fixture(spark, sf_dir):
    """Direct no-oracle cross-check on the real fixture (the oracle
    pins each key against DuckDB; this pins them against each other)."""
    flat = _rows_of(spark, sf_dir, "path_transitions")
    two = _rows_of(spark, sf_dir, "path_transitions_twostage")
    assert flat == two and len(two) > 0


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),          # user
            st.integers(min_value=0, max_value=4),          # day bucket
            # offsets hug the bucket edges to stress the seam rule
            st.sampled_from(
                [0, 1, HOUR, DAY - 2, DAY - 1]
            ),
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=1,
        max_size=28,
    )
)
def test_property_matches_brute(spark, tmp_path_factory, raw):
    rows = [
        (i, day * DAY + min(off, DAY - 1), uid, etype)
        for i, (uid, day, off, etype) in enumerate(raw)
    ]
    d = _mk(rows, tmp_path_factory.mktemp("path"), spark)
    assert _rows_of(spark, d, "path_transitions_twostage") == _brute(rows)
