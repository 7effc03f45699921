"""Property-based exactness proofs for the as-of join family
(VERDICT r11 item 8).

``join_asof_tolerance`` and ``join_asof_nearest`` (operators/joins.py)
implement pandas-merge_asof semantics through the linear union +
single-window plan; their correctness rests on boundary rules that
the fixture only samples: the at-the-same-instant click (visible to
the backward frame, invisible to the forward frame), the exact
tolerance edge (gap == 1h matches, 1h + 1µs does not), the
equal-distance nearest tie (backward wins), same-(user, ts) click
de-duplication (highest event_id survives), and users with clicks
only / purchases only. Hypothesis generates adversarial micro-corpora
clustered on those edges and compares the FULL engine output against
a brute-force Python model of the declared semantics.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhousebackup_spark.registry import all_specs

from .conftest import write_events_fixture

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
EPOCH_US = int(EPOCH.timestamp()) * 1_000_000
TOL_US = 3_600_000_000  # the keys' 1-hour attribution window

pytestmark = pytest.mark.slow


def _events_dir(spark, tmp_path, rows):
    return write_events_fixture(spark, tmp_path, rows)


def _mk(evs, tmp_path, spark):
    """evs: list of (event_id, us, user_id, 'click'|'purchase')."""
    rows = [
        (eid, EPOCH + timedelta(microseconds=us), uid, etype, 0.0, "")
        for eid, us, uid, etype in evs
    ]
    return _events_dir(spark, tmp_path, rows)


def _us(ts) -> int | None:
    if ts is None:
        return None
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=timezone.utc)
    return int(ts.timestamp() * 1_000_000)


def _dedup_clicks(evs):
    """Engine rule: one click per (user, ts), highest event_id."""
    best: dict = {}
    for eid, us, uid, etype in evs:
        if etype != "click":
            continue
        key = (uid, us)
        if key not in best or eid > best[key]:
            best[key] = eid
    return [(eid, us, uid) for (uid, us), eid in best.items()]


def _brute_tolerance(evs):
    clicks = _dedup_clicks(evs)
    out = []
    for eid, us, uid, etype in evs:
        if etype != "purchase":
            continue
        cands = [c for c in clicks if c[2] == uid and c[1] <= us]
        if cands:
            c_eid, c_us, _ = max(cands, key=lambda c: c[1])
            if us - c_us <= TOL_US:
                out.append((eid, uid, us, c_eid, c_us))
                continue
        out.append((eid, uid, us, None, None))
    return sorted(out)


def _brute_nearest(evs):
    clicks = _dedup_clicks(evs)
    out = []
    for eid, us, uid, etype in evs:
        if etype != "purchase":
            continue
        mine = [c for c in clicks if c[2] == uid]
        back = [c for c in mine if c[1] <= us]  # equal ts sorts before
        fwd = [c for c in mine if c[1] > us]
        b = max(back, key=lambda c: c[1]) if back else None
        f = min(fwd, key=lambda c: c[1]) if fwd else None
        if b is None and f is None:
            out.append((eid, uid, us, -1, -1))
        elif b is None:
            out.append((eid, uid, us, f[0], f[1] - us))
        elif f is None or us - b[1] <= f[1] - us:  # tie -> backward
            out.append((eid, uid, us, b[0], us - b[1]))
        else:
            out.append((eid, uid, us, f[0], f[1] - us))
    return sorted(out)


def _run_tolerance(spark, d):
    return sorted(
        (
            r["p_id"],
            r["user_id"],
            _us(r["p_ts"]) - EPOCH_US,
            r["c_id"],
            None if r["c_ts"] is None else _us(r["c_ts"]) - EPOCH_US,
        )
        for r in all_specs()["join_asof_tolerance"].fn(spark, d).collect()
    )


def _run_nearest(spark, d):
    return sorted(
        (
            r["p_id"],
            r["user_id"],
            _us(r["p_ts"]) - EPOCH_US,
            r["c_id"],
            r["gap_us"],
        )
        for r in all_specs()["join_asof_nearest"].fn(spark, d).collect()
    )


def test_tolerance_boundary_is_closed(spark, tmp_path):
    """gap == 1h matches; 1h + 1µs nulls; the same-instant click
    matches with gap 0; a duplicate click at the same (user, ts)
    resolves to the higher event_id."""
    evs = [
        (1, 0, 1, "click"),
        (2, TOL_US, 1, "purchase"),          # exactly 1h -> match
        (3, 0, 2, "click"),
        (4, TOL_US + 1, 2, "purchase"),      # 1h + 1µs -> NULL
        (5, 7, 3, "click"),
        (6, 7, 3, "purchase"),               # same instant -> match
        (7, 5, 4, "click"),
        (8, 5, 4, "click"),                  # dup ts: eid 8 survives
        (9, 6, 4, "purchase"),
    ]
    d = _mk(evs, tmp_path, spark)
    got = _run_tolerance(spark, d)
    assert got == _brute_tolerance(evs)
    by_p = {r[0]: r for r in got}
    assert by_p[2][3] == 1          # closed boundary
    assert by_p[4][3] is None       # strict beyond
    assert by_p[6][3] == 5          # same-instant visible
    assert by_p[9][3] == 8          # dedup keeps max event_id


def test_nearest_tie_prefers_backward(spark, tmp_path):
    """Equidistant clicks: backward wins; same-instant click is the
    backward side with gap 0; one-sided users fall through to the
    other side; no-click users carry the -1 sentinel."""
    evs = [
        (1, 0, 1, "click"),
        (2, 100, 1, "purchase"),     # back gap 100
        (3, 200, 1, "click"),        # fwd gap 100 -> tie -> back (1)
        (4, 50, 2, "purchase"),      # user 2: forward only
        (5, 90, 2, "click"),
        (6, 30, 3, "purchase"),      # user 3: no clicks -> -1
        (7, 40, 4, "click"),
        (8, 40, 4, "purchase"),      # same instant -> backward, gap 0
    ]
    d = _mk(evs, tmp_path, spark)
    got = _run_nearest(spark, d)
    assert got == _brute_nearest(evs)
    by_p = {r[0]: r for r in got}
    assert by_p[2][3] == 1 and by_p[2][4] == 100
    assert by_p[4][3] == 5 and by_p[4][4] == 40
    assert by_p[6][3] == -1 and by_p[6][4] == -1
    assert by_p[8][3] == 7 and by_p[8][4] == 0


#: µs offsets concentrated on the boundary structure: the tolerance
#: edge, zero gaps, and small equidistant pairs.
offsets = st.sampled_from(
    [0, 1, 2, 100, 200, TOL_US - 1, TOL_US, TOL_US + 1, 2 * TOL_US]
)
event_sets = st.lists(
    st.tuples(
        offsets,
        st.sampled_from(["click", "purchase"]),
        st.integers(min_value=1, max_value=2),
    ),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=event_sets)
def test_property_tolerance_matches_brute(spark, tmp_path_factory, raw):
    evs = [(i, us, uid, t) for i, (us, t, uid) in enumerate(raw)]
    d = _mk(evs, tmp_path_factory.mktemp("asof"), spark)
    assert _run_tolerance(spark, d) == _brute_tolerance(evs)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=event_sets)
def test_property_nearest_matches_brute(spark, tmp_path_factory, raw):
    evs = [(i, us, uid, t) for i, (us, t, uid) in enumerate(raw)]
    d = _mk(evs, tmp_path_factory.mktemp("asofn"), spark)
    assert _run_nearest(spark, d) == _brute_nearest(evs)
