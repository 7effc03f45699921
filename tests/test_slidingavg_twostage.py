"""Exactness proofs for the bounded-frame two-stage rewrite
(operators/analytics19.py — skew playbook family seven).

``win_sliding_avg_twostage`` claims BIT-identical output to the flat
``win_sliding_avg`` for ANY input, on the bounded-frame invariant: a
day bucket is wider than the 1-hour frame, so a row's frame spans at
most its own and the previous bucket; DECIMAL(38,6) sums and BIGINT
counts recombine associatively and the final CAST(sum AS
DOUBLE)/count replays the flat expression. Crafted fixtures pin what
the decomposition lives or dies on:

- a frame REACHING ACROSS MIDNIGHT (target in the first hour of day
  2, sources in the last hour of day 1 — the seam join's whole job);
- a source exactly AT the 1-hour boundary (ts_r = t − 1h inclusive)
  and one 1 µs outside it;
- a target exactly at offset 1h after midnight (its frame floor is
  exactly midnight — must take NO seam rows, since midnight rows
  belong to its own bucket);
- same-timestamp peers (RANGE frame includes all peers; equal ts ⇒
  equal bucket ⇒ local pass, never double-counted by the seam);
- single-event users and users idle across whole buckets.

A hypothesis property compares the two-stage key against BOTH the
flat engine key and a Decimal brute force that replays the
double→DECIMAL(38,6) cast, over corpora clustered tightly around a
midnight boundary so seam cases are the common case, not the tail.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhousebackup_spark.registry import all_specs

#: 2024-01-02 00:00:00 UTC — the midnight the crafted fixtures and
#: the property corpus cluster around.
MIDNIGHT = datetime(2024, 1, 2)
HOUR = timedelta(hours=1)
US = timedelta(microseconds=1)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _mk(rows, tmp_path, spark):
    """rows: list of (event_id, user_id, ts, value)."""
    data = [
        (eid, ts, uid, "view", float(v), "{}") for eid, uid, ts, v in rows
    ]
    d = str(tmp_path)
    spark.createDataFrame(data, EVENTS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(f"{d}/events.parquet")
    return d


def _brute(rows):
    """{event_id: moving_avg} — frame = same user, ts in [t-1h, t],
    DECIMAL(38,6) sum cast to double, divided by the count."""
    out = {}
    for eid, uid, ts, v in rows:
        acc, cnt = Decimal(0), 0
        for eid2, uid2, ts2, v2 in rows:
            if uid2 == uid and ts - HOUR <= ts2 <= ts:
                acc += Decimal(repr(float(v2))).quantize(
                    Decimal("0.000001")
                )
                cnt += 1
        out[eid] = float(acc) / cnt
    return out


def _engine(spark, d, key):
    return {
        r["event_id"]: r["moving_avg"]
        for r in all_specs()[key].fn(spark, d).collect()
    }


def test_crafted_midnight_seams(spark, tmp_path):
    rows = [
        # user 1: sources in the last hour of day 1...
        (0, 1, MIDNIGHT - HOUR, 10.25),          # exactly t-1h for eid 3
        (1, 1, MIDNIGHT - HOUR + US, 20.5),      # just inside
        (2, 1, MIDNIGHT - 30 * US, 30.75),       # just before midnight
        # ...and targets in the first hour of day 2.
        (3, 1, MIDNIGHT, 1.5),                   # frame = {0,1,2,3}
        (4, 1, MIDNIGHT + HOUR - US, 2.25),      # frame floor lands
        # 1 µs before row 0 — rows 1,2 (seam) and 3 (local) are in
        # target exactly at offset 1h: frame floor is exactly
        # midnight — seam must contribute NOTHING (midnight row 3 is
        # its bucket-mate, handled locally).
        (5, 1, MIDNIGHT + HOUR, 3.125),
        # user 2: same-timestamp peers straddling nothing — RANGE
        # includes both peers for BOTH rows.
        (10, 2, MIDNIGHT + 2 * HOUR, 5.0),
        (11, 2, MIDNIGHT + 2 * HOUR, 7.0),
        # user 3: single event, first hour of a bucket, no sources.
        (20, 3, MIDNIGHT + US, 9.875),
        # user 4: events in buckets two days apart (idle bucket
        # between) — seam pairs with the EMPTY previous bucket only.
        (30, 4, MIDNIGHT - 2 * HOUR, 4.5),
        (31, 4, MIDNIGHT + 47 * HOUR, 6.5),
    ]
    d = _mk(rows, tmp_path, spark)
    want = _brute(rows)
    assert _engine(spark, d, "win_sliding_avg_twostage") == want
    assert _engine(spark, d, "win_sliding_avg") == want


def test_oracle_is_shared_object():
    specs = all_specs()
    assert (
        specs["win_sliding_avg"].oracle
        is specs["win_sliding_avg_twostage"].oracle
    )
    assert (
        specs["win_sliding_avg"].oracle
        is specs["win_sliding_avg_adaptive"].oracle
    )


def test_adaptive_dispatch_boundary(spark, tmp_path, monkeypatch):
    """win_sliding_avg_adaptive picks the two-stage plan iff the
    hottest user's share exceeds ADAPTIVE_HOT_SHARE — proven by
    spying on both branch functions; output equals the brute force
    either way (same contract as the adaptive sessionizer's test)."""
    from clickhousebackup_spark.operators import analytics16, analytics19, windows

    calls = []
    real_flat = windows.win_sliding_avg
    real_two = analytics19.win_sliding_avg_twostage

    def spy_flat(spark_, d):
        calls.append("flat")
        return real_flat(spark_, d)

    def spy_two(spark_, d):
        calls.append("twostage")
        return real_two(spark_, d)

    monkeypatch.setattr(windows, "win_sliding_avg", spy_flat)
    monkeypatch.setattr(analytics19, "win_sliding_avg_twostage", spy_two)
    analytics16._HOT_SHARE_CACHE.clear()

    # skewed: user 7 owns 30 of 40 events (75% >> 5%)
    skewed = [
        (i, 7, MIDNIGHT + timedelta(minutes=i), 1.25) for i in range(30)
    ] + [
        (100 + i, 100 + i, MIDNIGHT + timedelta(minutes=i), 2.5)
        for i in range(10)
    ]
    d = _mk(skewed, tmp_path / "skew", spark)
    got = _engine(spark, d, "win_sliding_avg_adaptive")
    assert got == _brute(skewed)
    assert calls[-1] == "twostage"

    # uniform: 40 users, one event each (2.5% < 5%)
    uniform = [
        (i, i, MIDNIGHT + timedelta(minutes=i), 0.75) for i in range(40)
    ]
    d = _mk(uniform, tmp_path / "uni", spark)
    got = _engine(spark, d, "win_sliding_avg_adaptive")
    assert got == _brute(uniform)
    assert calls[-1] == "flat"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),        # user
            # minutes in [-120, +120] around midnight: frames
            # constantly straddle the bucket boundary
            st.integers(min_value=-120, max_value=120),
            st.integers(min_value=0, max_value=400),      # quarter-units
        ),
        min_size=1,
        max_size=30,
    ),
    # the sweep decomposition claims exactness for ANY prefix-bucket
    # width — exercise widths from frame-sized (1 h) down to 10 min
    # (markers and carriers routinely in different buckets) and up
    # past the corpus span
    bucket_us=st.sampled_from(
        [600_000_000, 3_600_000_000, 7_200_000_000, 86_400_000_000]
    ),
)
def test_property_matches_flat_and_brute(
    spark, tmp_path_factory, monkeypatch, raw, bucket_us
):
    from clickhousebackup_spark.operators import analytics19

    monkeypatch.setattr(analytics19, "BUCKET_US", bucket_us)
    rows = [
        (i, uid, MIDNIGHT + timedelta(minutes=mins), q / 4.0)
        for i, (uid, mins, q) in enumerate(raw)
    ]
    d = _mk(rows, tmp_path_factory.mktemp("slidetwo"), spark)
    got = _engine(spark, d, "win_sliding_avg_twostage")
    assert got == _brute(rows)
    assert got == _engine(spark, d, "win_sliding_avg")
