"""Seam-merge exactness proofs for ``sessionize_gap_twostage``.

The two-stage rewrite (operators/analytics16.py) claims hash-identical
output to the flat per-user ``sessionize_gap`` for ANY input — the
oracle pins that at the three fixture scales, but the fixture rarely
exercises the seams the rewrite lives or dies on:

- a session CHAIN spanning 3+ day buckets (each bucket's only session
  merges backward, introducing zero new sessions),
- the exact-gap boundary at a bucket seam (gap == 30m stays one
  session; 30m + 1µs splits — same strict-> rule as the flat key),
- empty buckets between events (the previous NON-EMPTY bucket's last
  event is the seam predecessor; calendar adjacency is irrelevant),
- events landing exactly ON a bucket boundary (first µs of a day).

Crafted fixtures pin each seam; a hypothesis property then compares
the full engine result against a brute-force Python sessionizer over
adversarial event sets clustered near bucket boundaries.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhousebackup_spark.operators.analytics5 import SESSION_GAP_US
from clickhousebackup_spark.operators.analytics16 import BUCKET_US
from clickhousebackup_spark.registry import all_specs

from .conftest import write_events_fixture

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
#: Absolute epoch-µs of EPOCH — 2024-01-01 is midnight UTC, so the
#: relative seam offsets used below stay day-bucket-aligned after the
#: shift (the engine buckets on ABSOLUTE µs).
EPOCH_US = int(EPOCH.timestamp()) * 1_000_000
assert EPOCH_US % (24 * 60 * 60 * 1_000_000) == 0


def _events_dir(spark, tmp_path, rows):
    return write_events_fixture(spark, tmp_path, rows)


def _rows_of(spark, sf_dir, key):
    return sorted(
        tuple(r)
        for r in all_specs()[key].fn(spark, sf_dir).collect()
    )


def _at(us: int) -> datetime:
    """Naive UTC timestamp at epoch-2024 + us microseconds (written
    as tz-aware so parquet's UTC-normalized micros are exact)."""
    return EPOCH + timedelta(microseconds=us)


def _mk(rows_us, tmp_path, spark):
    """rows_us: list of (event_id, us, user_id, type)."""
    rows = [
        (eid, _at(us), uid, etype, 0.0, "")
        for eid, us, uid, etype in rows_us
    ]
    return _events_dir(spark, tmp_path, rows)


def _brute(rows_us):
    """Flat Python sessionizer: the reference semantics (new session
    iff gap > SESSION_GAP_US under the (us, event_id) total order),
    returning the same aggregate tuples as the engine keys."""
    out = {}
    by_user: dict = {}
    for eid, us, uid, etype in rows_us:
        by_user.setdefault(uid, []).append((us, eid, etype))
    for uid, evs in by_user.items():
        evs.sort()
        sid = 0
        prev = None
        sess: dict = {}
        for us, eid, etype in evs:
            if prev is None or us - prev > SESSION_GAP_US:
                sid += 1
            prev = us
            sess.setdefault(sid, []).append((us, etype))
        for sid, items in sess.items():
            uss = [u for u, _ in items]
            out[(uid, sid)] = (
                uid,
                sid,
                len(items),
                EPOCH_US + min(uss),  # engine emits ABSOLUTE epoch-µs
                EPOCH_US + max(uss),
                len({t for _, t in items}),
            )
    return sorted(out.values())


DAY = BUCKET_US
GAP = SESSION_GAP_US


def test_chain_spans_three_buckets(spark, tmp_path):
    """One session walking across 3 day seams at 29-minute strides
    (every gap < 30m): the merged session must be a single row, and
    its id must be 1."""
    step = GAP - 60_000_000  # 29 minutes
    rows = []
    us = DAY - step  # start just before the first midnight seam
    for i in range(3 * DAY // step):
        rows.append((i, us, 7, "t"))
        us += step
    d = _mk(rows, tmp_path, spark)
    got = _rows_of(spark, d, "sessionize_gap_twostage")
    assert got == _brute(rows)
    assert len(got) == 1 and got[0][1] == 1 and got[0][2] == len(rows)


def test_exact_gap_boundary_at_seam(spark, tmp_path):
    """At a bucket seam, gap == 30m merges (strict > splits), and
    gap == 30m + 1µs splits — identical to the flat rule."""
    rows = [
        (1, DAY - GAP, 1, "a"),        # user 1: last event of day 0
        (2, DAY, 1, "a"),              # exactly 30m later -> merge
        (3, 2 * DAY - GAP, 2, "a"),    # user 2: last event of day 1
        (4, 2 * DAY + 1, 2, "a"),      # 30m + 1µs -> split
    ]
    d = _mk(rows, tmp_path, spark)
    got = _rows_of(spark, d, "sessionize_gap_twostage")
    assert got == _brute(rows)
    by_user = {}
    for r in got:
        by_user.setdefault(r[0], []).append(r)
    assert len(by_user[1]) == 1  # merged
    assert len(by_user[2]) == 2  # split


def test_empty_buckets_between_events(spark, tmp_path):
    """Events 3 calendar days apart: the seam check must compare the
    previous NON-EMPTY bucket's last event (gap >> 30m -> split into
    sessions 1 and 2, not an id gap)."""
    rows = [(1, 0, 5, "a"), (2, 3 * DAY, 5, "b")]
    d = _mk(rows, tmp_path, spark)
    got = _rows_of(spark, d, "sessionize_gap_twostage")
    assert got == _brute(rows)
    assert [r[1] for r in got] == [1, 2]


def test_event_on_bucket_boundary(spark, tmp_path):
    """An event at exactly µs 0 of a day belongs to that day's bucket;
    a predecessor 1µs before midnight merges (gap 1µs)."""
    rows = [(1, DAY - 1, 9, "a"), (2, DAY, 9, "b"), (3, DAY + 1, 9, "a")]
    d = _mk(rows, tmp_path, spark)
    got = _rows_of(spark, d, "sessionize_gap_twostage")
    assert got == _brute(rows)
    assert len(got) == 1 and got[0][2] == 3 and got[0][5] == 2


def test_matches_flat_key_on_fixture(spark, sf_dir):
    """Engine-vs-engine: the rewrite and the flat key agree row-for-row
    on the real fixture (the oracle pins each against DuckDB; this is
    the direct no-oracle cross-check)."""
    assert _rows_of(spark, sf_dir, "sessionize_gap_twostage") == _rows_of(
        spark, sf_dir, "sessionize_gap"
    )


#: Adversarial event sets: µs offsets clustered around day seams and
#: gap multiples so merges, splits, chains, and exact boundaries all
#: occur; 2 users; duplicate timestamps allowed (event_id tiebreak).
seam_points = st.sampled_from(
    [0, 1, GAP - 1, GAP, GAP + 1, DAY - GAP, DAY - 1, DAY, DAY + GAP]
)
event_sets = st.lists(
    st.tuples(
        seam_points,
        st.integers(min_value=0, max_value=2),  # extra gap multiples
        st.integers(min_value=1, max_value=2),  # user
        st.sampled_from(["a", "b"]),
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
@given(evs=event_sets)
def test_property_matches_brute_force(spark, tmp_path_factory, evs):
    rows = [
        (i, base + mult * GAP, uid, etype)
        for i, (base, mult, uid, etype) in enumerate(evs)
    ]
    d = _mk(rows, tmp_path_factory.mktemp("sess"), spark)
    assert _rows_of(spark, d, "sessionize_gap_twostage") == _brute(rows)


def test_adaptive_dispatch_boundary(spark, tmp_path, monkeypatch):
    """The adaptive key picks the two-stage plan iff the hottest
    user's share exceeds ADAPTIVE_HOT_SHARE — proven by spying on
    both branch functions with crafted skewed vs uniform corpora;
    output equals the brute-force sessionizer either way."""
    from clickhousebackup_spark.operators import analytics5, analytics16

    calls = []

    real_flat = analytics5.sessionize_gap
    real_two = analytics16.sessionize_gap_twostage

    def spy_flat(spark_, d):
        calls.append("flat")
        return real_flat(spark_, d)

    def spy_two(spark_, d):
        calls.append("twostage")
        return real_two(spark_, d)

    monkeypatch.setattr(analytics5, "sessionize_gap", spy_flat)
    monkeypatch.setattr(analytics16, "sessionize_gap_twostage", spy_two)

    # skewed: user 7 owns 30 of 40 events (75% >> 5%)
    skewed = [(i, i * GAP * 2, 7, "a") for i in range(30)] + [
        (100 + i, i * GAP * 2, 100 + i, "b") for i in range(10)
    ]
    d = _mk(skewed, tmp_path / "skew", spark)
    got = _rows_of(spark, d, "sessionize_gap_adaptive")
    assert got == _brute(skewed)
    assert calls[-1] == "twostage"

    # uniform: 40 users, one event each (2.5% < 5%)
    uniform = [(i, i * GAP, i, "a") for i in range(40)]
    d = _mk(uniform, tmp_path / "uni", spark)
    got = _rows_of(spark, d, "sessionize_gap_adaptive")
    assert got == _brute(uniform)
    assert calls[-1] == "flat"


def test_adaptive_probe_is_memoized(spark, tmp_path, monkeypatch):
    """The adaptive key's hot-share probe runs ONCE per dataset: the
    two-integer result is memoized on the events file's identity, so
    repeated plan construction (explain loops, plan-shape tests) never
    re-reads the table. Proven by poisoning the probe after the first
    call — a second probe would raise. The first call itself is also
    Spark-free: it is made with spark=None, which only a pure
    driver-side (pyarrow / sidecar-stats) probe survives."""
    from clickhousebackup_spark.operators import analytics16

    uniform = [(i, i * GAP, i, "a") for i in range(40)]
    d = _mk(uniform, tmp_path / "memo", spark)
    analytics16._HOT_SHARE_CACHE.clear()
    first = analytics16._events_hot_share(None, d)
    assert first == (1, 40)

    def _boom(*a, **k):
        raise AssertionError("probe re-ran for a cached dataset")

    monkeypatch.setattr(analytics16, "_hot_share_probe", _boom)
    assert analytics16._events_hot_share(spark, d) == first
    # Full plan construction re-probes through the cache; the uniform
    # corpus dispatches to the flat branch (analytics5's loader), so
    # the poisoned analytics16 loader proves no second probe ran.
    got = sorted(
        tuple(r)
        for r in analytics16.sessionize_gap_adaptive(spark, d).collect()
    )
    assert got == _brute(uniform)


def test_adaptive_probe_sidecar_stats(spark, tmp_path):
    """A ``events.parquet.stats.json`` sidecar short-circuits the probe
    entirely — the production hook where a 100 TB deployment
    materializes the two dispatch integers at ingest. The sidecar's
    numbers win even when they contradict the data, proving no scan
    happened."""
    import json

    from clickhousebackup_spark.operators import analytics16

    uniform = [(i, i * GAP, i, "a") for i in range(40)]
    d = _mk(uniform, tmp_path / "sidecar", spark)
    import os

    sidecar = os.path.join(d, "events.parquet.stats.json")
    with open(sidecar, "w") as fh:
        json.dump({"hot_user_events": 999, "total_events": 1000}, fh)
    analytics16._HOT_SHARE_CACHE.clear()
    assert analytics16._events_hot_share(None, d) == (999, 1000)
    analytics16._HOT_SHARE_CACHE.clear()


def test_adaptive_probe_sampling_bound(spark, tmp_path, monkeypatch):
    """Past the row budget the probe samples row groups by even stride
    instead of reading the column whole: with the cap forced below the
    fixture size, the basis shrinks but the hot/basis ratio still
    dispatches the 75%-hot corpus to the two-stage branch (sampling can
    only misdispatch on near-threshold shares — and both branches are
    oracle-identical anyway)."""
    from clickhousebackup_spark.operators import analytics16

    skewed = [(i, i * GAP * 2, 7, "a") for i in range(30)] + [
        (100 + i, i * GAP * 2, 100 + i, "b") for i in range(10)
    ]
    d = _mk(skewed, tmp_path / "sample", spark)
    analytics16._HOT_SHARE_CACHE.clear()
    exact_hot, exact_basis = analytics16._events_hot_share(None, d)
    assert (exact_hot, exact_basis) == (30, 40)

    monkeypatch.setattr(analytics16, "_PROBE_ROWS_CAP", 8)
    analytics16._HOT_SHARE_CACHE.clear()
    hot, basis = analytics16._events_hot_share(None, d)
    assert 0 < basis <= 40
    assert 0 < hot <= basis
    analytics16._HOT_SHARE_CACHE.clear()
