"""Property-based CronSpec laws (hypothesis): for arbitrary specs and
start times, next_fire is strictly-future, minute-aligned, and lands
on a matching (minute, hour, day) per the spec's own field sets."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from clickhousebackup_spark.streaming.engine import CronSpec


def _field(lo, hi):
    return st.one_of(
        st.just("*"),
        st.integers(lo, hi).map(str),
        st.tuples(st.integers(lo, hi), st.integers(lo, hi)).map(
            lambda ab: f"{min(ab)}-{max(ab)}"
        ),
        st.integers(1, 15).map(lambda n: f"*/{n}"),
    )


specs = st.tuples(
    _field(0, 59), _field(0, 23), _field(1, 28), _field(1, 12), _field(0, 6)
).map(" ".join)

starts = st.datetimes(
    min_value=dt.datetime(2020, 1, 1), max_value=dt.datetime(2030, 12, 31)
)


@given(specs, starts)
@settings(max_examples=150, deadline=None)
def test_next_fire_is_future_aligned_and_matching(spec_s, start):
    spec = CronSpec.parse(spec_s)
    fire = spec.next_fire(start)
    assert fire > start
    assert fire.second == 0 and fire.microsecond == 0
    assert fire.minute in spec.minutes
    assert fire.hour in spec.hours
    assert spec._day_matches(fire.date())
    # minimality: firing one minute before `fire` schedules `fire` again
    assert spec.next_fire(fire - dt.timedelta(minutes=1)) == fire
    # consecutive fires are strictly increasing
    assert spec.next_fire(fire) > fire
