"""Hypothesis property tests for round-3 operators whose laws go
beyond fixture coverage: compaction bin-packing and geohash encoding.
Both properties are pure-Python replays of the SQL arithmetic, so
they run without a SparkSession (fast, wide input coverage); the
Spark plans themselves are pinned by the oracle-parity suite.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

TARGET = 262144.0


def _bins(sizes: list[int]) -> dict[int, list[int]]:
    """Replay compaction_plan's next-fit rule: largest-first order,
    bin = floor(prev_cumsum / target)."""
    ordered = sorted(sizes, reverse=True)
    out: dict[int, list[int]] = {}
    cum = 0
    for s in ordered:
        b = int(math.floor(cum / TARGET))
        out.setdefault(b, []).append(s)
        cum += s
    return out


@given(st.lists(st.integers(min_value=0, max_value=500_000), max_size=200))
@settings(max_examples=200, deadline=None)
def test_compaction_nextfit_laws(sizes):
    bins = _bins(sizes)
    if not sizes:
        assert bins == {}
        return
    # every file assigned exactly once
    assert sorted(s for b in bins.values() for s in b) == sorted(sizes)
    # first bin is 0; ids strictly increase (NOT necessarily dense:
    # a file larger than the target advances the cumulative sum past
    # whole bins — hypothesis found this, and it is the intended
    # floor-rule semantics, so the law is monotonicity, not density)
    ids = sorted(bins)
    assert ids[0] == 0
    # a bin only overflows the target by (at most) its own last file:
    # total(bin b) <= target + max file in b  — the next-fit guarantee
    for b, items in bins.items():
        assert sum(items) <= TARGET + max(items)
    # monotone: earlier bins hold larger-or-equal files first
    firsts = [items[0] for _, items in sorted(bins.items())]
    assert firsts == sorted(firsts, reverse=True)


def _grid_geohash(lat: float, lon: float) -> str:
    """Replay geo_geohash's grid-scaling construction."""
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    a = int(math.floor((lon + 180.0) / 360.0 * 1048576.0))
    b = int(math.floor((lat + 90.0) / 180.0 * 1048576.0))
    z = 0
    for i in range(20):
        z += ((a >> i) & 1) << (2 * i + 1)
        z += ((b >> i) & 1) << (2 * i)
    return "".join(b32[(z >> (5 * k)) & 31] for k in range(7, -1, -1))


def _textbook_geohash(lat: float, lon: float, length: int = 8) -> str:
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
    bits, out, even, nbits = 0, [], True, 0
    for _ in range(length * 5):
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits, lon_lo = (bits << 1) | 1, mid
            else:
                bits, lon_hi = bits << 1, mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits, lat_lo = (bits << 1) | 1, mid
            else:
                bits, lat_hi = bits << 1, mid
        even, nbits = not even, nbits + 1
        if nbits == 5:
            out.append(b32[bits])
            bits, nbits = 0, 0
    return "".join(out)


@given(st.integers(min_value=0, max_value=10**12))
@settings(max_examples=300, deadline=None)
def test_grid_geohash_equals_textbook_on_synthesis_domain(user_id):
    """The 20-bit grid-scaling shortcut must agree with the textbook
    interval-halving encoder across the operator's entire input
    domain (1e-6-grid coords synthesized from any user_id) — not just
    fixture ids. (Arbitrary floats can disagree within ~1e-30 deg of
    a cell boundary, where the grid form's `lon+180` rounding loses a
    denormal sign — hypothesis found lat=0, lon=-1.2e-38; the
    operator never emits such coords, so the contract is the grid
    domain.)"""
    lat = ((user_id * 2654435761) % 180000000) / 1000000.0 - 90.0
    lon = ((user_id * 1779033703) % 360000000) / 1000000.0 - 180.0
    assert _grid_geohash(lat, lon) == _textbook_geohash(lat, lon)
