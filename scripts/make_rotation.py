#!/usr/bin/env python
"""Derive the NEXT round's driver-check rotation mechanically.

Every round starts by rotating ``registry._CHECK_PRIORITY`` (the
driver hash-checks the FIRST 50 keys of ``all_specs()``); rounds 5/6
nearly shipped stale windows, and the hand-maintained NOTES handoff
list is one transcription away from the same mistake. This script
computes, from the committed CORRECTNESS_r*.json files and the live
registry, exactly what the next rotation must be:

1. REQUIRED keys — oracled keys with no green driver row (the
   DEFERRED queue from last round plus anything that failed);
2. REFILL keys — the stalest green keys (oldest latest-round rows,
   name-ordered within a round) to fill the remaining window slots;
3. the ready-to-paste ``_CHECK_PRIORITY`` window block, the
   ``REFRESH`` set for tests/test_rotation.py, and the DEFERRED
   overflow (required keys that did not fit), if any.

Usage:
    python scripts/make_rotation.py            # print the plan
    python scripts/make_rotation.py --check    # exit 0 if the live
                                               # window already matches
                                               # the plan, 1 if a
                                               # rotation is still due
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def latest_rows() -> dict[str, tuple[int, dict]]:
    rows: dict[str, tuple[int, dict]] = {}
    for path in sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    ):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        with open(path) as fh:
            for k, v in json.load(fh).items():
                rows[k] = (rnd, v)
    return rows


def main(argv: list[str]) -> int:
    from clickhousebackup_spark.registry import all_specs

    specs = all_specs()
    rows = latest_rows()
    try:
        from tests.test_rotation import RECHECK
    except Exception:
        RECHECK = set()
    required = [
        k
        for k, s in specs.items()
        if s.oracle is not None
        and (
            k not in rows
            or rows[k][1].get("hash_match") is not True
            or k in RECHECK
        )
    ]
    # deterministic order: registry order for required (keeps DEFERRED
    # declaration order), staleness then name for refills
    green = sorted(
        (
            (rows[k][0], k)
            for k, s in specs.items()
            if s.oracle is not None and k not in required and k in rows
        ),
    )
    n_refill = max(0, WINDOW - len(required))
    refill = [k for _, k in green[:n_refill]]
    window = required[:WINDOW]
    window += refill[: WINDOW - len(window)]
    deferred = required[WINDOW:]

    print(f"# required (no green row): {len(required)}")
    print(f"# refills (stalest green): {len(refill)}")
    print(f"# deferred overflow      : {len(deferred)}")
    print("\n# --- _CHECK_PRIORITY window (paste into registry.py) ---")
    for k in window:
        print(f'    "{k}",')
    if deferred:
        print("# --- DEFERRED tail (positions 50+) ---")
        for k in deferred:
            print(f'    "{k}",')
    print("\n# --- tests/test_rotation.py REFRESH set ---")
    for k in sorted(refill):
        print(f'    "{k}",')
    print("\n# --- tests/test_rotation.py DEFERRED set ---")
    for k in sorted(deferred):
        print(f'    "{k}",')

    if "--check" in argv:
        live = list(specs)[:WINDOW]
        ok = set(live) == set(window)
        print(f"\n# live window matches plan: {ok}")
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
