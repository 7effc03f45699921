#!/usr/bin/env python
"""Classify the registry for the round-16 sf10-arm sweep (PLANS_r16
§4) and emit the shard key lists.

Buckets, in priority order (a key lands in the first that matches):

- EXCLUDED_R15     — the 65 keys already executed at the sf10 arm in
                     SWEEP_r15_sf10_slice.json; re-running costs
                     ~12.5k s wall for no new information.
- EXCLUDED_NAMED   — dedup_containment (its sliced oracle's CASE
                     needs both sides' gram counts, so DuckDB cannot
                     push the slice to one scan side; the unsliced
                     gram-match enumeration is ~100x the sf1 arm's
                     123 s) and sketch_recall_probe (composed oracle
                     embeds the UNsliced minhash/simhash banded
                     all-pairs truth — ~2.5e11 comparisons at 500k
                     docs). Both carry exact sf1-arm bounded rows in
                     scripts/probe_r16_caps.json.
- EXCLUDED_ROWSCALED — keys whose OUTPUT is row-scaled (latest
                     driver-gate run returned > 2000 rows at sf0.01,
                     i.e. 2M-180M-row collects at the 1000x arm);
                     the COMPARE, not the engine plan, is the bound.
                     The class is already demonstrated at sf10 by
                     r15's join_inner / win_running_sum rows.
- HEAVY            — window-function oracles over the 10M-row events
                     / 60M-row lineitem clones (DuckDB peaked
                     25-28 GB EACH at the 10M-event arm — NOTES r15
                     trap). Run sequentially (--shards=1) after the
                     light pass, with CBS_SIM_DUCK_MEM set.
- LIGHT            — everything else; safe at --shards=4.

Emits /tmp/sf10_light.txt, /tmp/sf10_heavy.txt and prints the
excluded buckets with reasons (recorded in NOTES and the artifact
doc).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from clickhousebackup_spark.registry import all_specs  # noqa: E402

NAMED = {
    "dedup_containment": "sliced oracle CASE needs both sides' gram counts; "
    "unsliced gram-join ~100x the sf1 arm's 123 s",
    "sketch_recall_probe": "composed oracle embeds unsliced banded all-pairs "
    "truth: ~2.5e11 comparisons at 500k docs",
}
ROWS_CAP = 2000

WINDOW_RE = re.compile(r"\bover\s*\(", re.I)
BIG_TABLES_RE = re.compile(r"\b(events|lineitem|orders)\b", re.I)


def latest_rows() -> dict[str, int]:
    rows: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        for k, v in json.load(open(f)).items():
            if isinstance(v, dict) and v.get("spark_rows") is not None:
                rows[k] = v["spark_rows"]
    return rows


def main() -> None:
    specs = all_specs()
    r15 = set(json.load(open(os.path.join(REPO, "SWEEP_r15_sf10_slice.json"))))
    rows = latest_rows()

    buckets: dict[str, list[str]] = {
        "EXCLUDED_R15": [],
        "EXCLUDED_NAMED": [],
        "EXCLUDED_ROWSCALED": [],
        "HEAVY": [],
        "LIGHT": [],
    }
    for k, spec in specs.items():
        if k in r15:
            buckets["EXCLUDED_R15"].append(k)
        elif k in NAMED:
            buckets["EXCLUDED_NAMED"].append(k)
        elif rows.get(k, 0) > ROWS_CAP:
            buckets["EXCLUDED_ROWSCALED"].append(k)
        elif spec.oracle and WINDOW_RE.search(spec.oracle) and BIG_TABLES_RE.search(
            spec.oracle
        ):
            buckets["HEAVY"].append(k)
        else:
            buckets["LIGHT"].append(k)

    for name, keys in buckets.items():
        print(f"{name}: {len(keys)}")
    for k in buckets["EXCLUDED_NAMED"]:
        print(f"  named exclusion {k}: {NAMED[k]}")
    with open("/tmp/sf10_light.txt", "w") as f:
        f.write("\n".join(sorted(buckets["LIGHT"])) + "\n")
    with open("/tmp/sf10_heavy.txt", "w") as f:
        f.write("\n".join(sorted(buckets["HEAVY"])) + "\n")
    with open("/tmp/sf10_excluded.json", "w") as f:
        json.dump(
            {
                "r15_covered": sorted(buckets["EXCLUDED_R15"]),
                "named": NAMED,
                "row_scaled_gt2k_sf001": sorted(buckets["EXCLUDED_ROWSCALED"]),
            },
            f,
            indent=1,
            sort_keys=True,
        )
    print("wrote /tmp/sf10_light.txt /tmp/sf10_heavy.txt /tmp/sf10_excluded.json")


if __name__ == "__main__":
    main()
