#!/usr/bin/env python
"""Annotate an sf1 sweep artifact's FAIL rows from the driver_sim
shard logs, so every committed FAIL carries its specific divergence
(the columns, both engines' values, and the digit position) instead of
generic prose — the row form tests/test_sweep_artifacts.py's
KNOWN_LIMIT_FAILS allowlist then verifies phrase-by-phrase.

Usage:
    python scripts/annotate_sf1_sweep.py MERGED.json LOG [LOG...] > OUT.json

Reads the merged ``--emit-json`` artifact, scans the shard logs for
each FAIL key's "first differing row" block (or row-count line), and
attaches a ``note`` built from the measured values. Keys whose logs
show no parsable diff keep a placeholder note that the committer must
replace by hand — an unexplained FAIL must never ship.
"""

from __future__ import annotations

import json
import re
import sys


def _sig_digit_of_divergence(a: float, b: float) -> int:
    """1-based significant-digit position where two floats part ways."""
    if a == b:
        return 0
    if a == 0 or b == 0:
        return 1  # one side exactly zero = total disagreement
    rel = abs(a - b) / max(abs(a), abs(b))
    pos = 1
    while rel < 1 and pos < 18:
        rel *= 10
        pos += 1
    return pos


def parse_fails(log_paths):
    """key -> dict(cols=[...], spark=line, duckdb=line) or rowcount."""
    fails = {}
    for path in log_paths:
        with open(path, errors="replace") as fh:
            lines = fh.read().splitlines()
        for i, line in enumerate(lines):
            m = re.search(r"\[\d+/\d+\] (\w+): FAIL", line)
            if not m:
                continue
            key = m.group(1)
            info: dict = {}
            for j in range(i + 1, min(i + 8, len(lines))):
                t = lines[j].strip()
                if t.startswith(f"{key}: row count"):
                    info["rowcount"] = t
                cm = re.search(r"first differing row #\d+ \(cols (\[.*?\])\)", t)
                if cm:
                    info["cols"] = eval(cm.group(1))  # noqa: S307 - our own log
                if t.startswith("spark  :"):
                    info["spark"] = t[9:]
                if t.startswith("duckdb :"):
                    info["duckdb"] = t[9:]
                if re.match(r"\[\d+/\d+\] ", t):
                    break
            fails[key] = info
    return fails


def _float_pair(info: dict):
    """(digit, a, b) of the earliest-significant float divergence."""
    sv = re.findall(r"\('float', ([-0-9.e+]+)\)", info.get("spark", ""))
    dv = re.findall(r"\('float', ([-0-9.e+]+)\)", info.get("duckdb", ""))
    worst, pair = 99, None
    for a, b in zip(sv, dv):
        fa, fb = float(a), float(b)
        if fa != fb:
            d = _sig_digit_of_divergence(fa, fb)
            if d < worst:
                worst, pair = d, (a, b)
    return (worst, *pair) if pair else None


#: The float note unlocks a KNOWN_LIMIT_FAILS phrase, so it is only
#: auto-written when the measured divergence sits at or beyond this
#: significant-digit position — the committed frontier is 13-17, and
#: anything earlier is a REAL regression that must never be
#: auto-labeled as a known bound.
MIN_FRONTIER_DIGIT = 12

def build_note(key: str, info: dict) -> str:
    # (round 15 removed the scan_file_metadata special case: the key
    # is layout-normalized now — a cardinality mismatch on it is a
    # real regression and must NOT be auto-excused.)
    fp = _float_pair(info)
    if fp and fp[0] >= MIN_FRONTIER_DIGIT:
        worst, a, b = fp
        pair = (a, b)
        cols = info.get("cols", [])
        return (
            "known float-summation bound, not an engine defect: at the "
            f"sf1 arm's ~1-2M-row groups the first differing row (cols "
            f"{cols}) parts between Spark and DuckDB at the {worst}th "
            f"significant digit of a double ({pair[0]} vs {pair[1]}) — "
            "the decimal "
            "sums are order-free, so the divergence is confined to the "
            "per-row double->DECIMAL(38,6) cast rounding of COMPUTED "
            "products and the final pow/sqrt/divide steps, whose "
            "boundary-rounding opportunities grow with row count. Exact "
            "at every driver-gate scale (sf0.001/0.01/0.1); the "
            "repo-wide exact-at-any-scale convention is the integer "
            "floor-grid family (q1_pricing_summary_grid, NOTES r5/r6)."
        )
    return "UNEXPLAINED FAIL — do not commit without a hand-written note"


def main() -> int:
    merged_path, *logs = sys.argv[1:]
    with open(merged_path) as fh:
        artifact = json.load(fh)
    fails = parse_fails(logs)
    for key, row in artifact.items():
        if row["match"].startswith("FAIL"):
            row["note"] = build_note(key, fails.get(key, {}))
    json.dump(artifact, sys.stdout, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
