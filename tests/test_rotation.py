"""Mechanical driver-window rotation check.

Rounds 5 and 6 both nearly shipped with ``registry._CHECK_PRIORITY``
still holding the previous round's window, leaving new operators
unproven (the driver only checks the FIRST 50 keys of ``all_specs()``
per round). This test makes rotation structural: it derives the set of
keys that REQUIRE a driver row from the committed CORRECTNESS_r*.json
files and asserts the pinned window covers exactly that set.

A key requires a driver slot when it is oracled and its latest driver
row is not a hash-pass (no row at all, a FAIL/ERR row, or a stale
``no_oracle`` rows-only row from before the key gained an oracle), or
when it is listed in ``RECHECK`` because its semantics changed after
its last green row. If more keys require slots than fit in one window,
the overflow must be named in ``DEFERRED`` (they lead the next round's
window); silence is what this test forbids.
"""

from __future__ import annotations

import glob
import json
import os
import re

from clickhousebackup_spark.registry import _CHECK_PRIORITY, all_specs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50  # the driver checks the first 50 keys of all_specs()

#: Keys whose semantics changed AFTER their latest green driver row
#: (so that row is stale and they must re-enter the window).
#: The four round-7 degeneracy-audit keys (str_multisearch,
#: stats_proportions_ztest, bitmap_set_ops, dq_expectations) got
#: post-fix green rows in CORRECTNESS_r08 and left this set.
RECHECK: set[str] = set()
# (empty after round 9: agg_hll_merge and stats_spearman got green
#  rows in CORRECTNESS_r09 under their re-anchored contracts.)

#: Regression refills: green keys whose evidence is the STALEST in the
#: registry (latest driver row = CORRECTNESS_r01), pulled back into the
#: window whenever fewer required keys exist than window slots. Unlike
#: RECHECK these are not suspected-stale semantics — they are routine
#: re-verification so no key's driver evidence ages without bound.
REFRESH: set[str] = {
    "agg_basic",
    "agg_count_distinct",
    "agg_rollup",
    "agg_having",
    "filter_age",
    "join_inner",
    "join_broadcast",
    "join_asof",
    "join_skew_salted",
    "win_keep_newest",
    "win_running_sum",
    "sort_multi",
    "topk_per_group",
    "set_union_distinct",
    "pivot_counts",
    "scd2_merge",
    "scan_partition_pruned",
}

#: Keys that require a slot but are consciously pushed past position
#: ``WINDOW`` this round (they must still appear in _CHECK_PRIORITY,
#: right after the window, so they lead the next round's rotation).
#: Round 10 promoted the entire 32-key round-9 continuation queue into
#: the window (positions 0-31), followed by the round-10
#: rows-only→oracled conversion emb_kmeans (32) and the 17 REFRESH
#: refills (33-49). The eight round-10 additions below overflow the
#: window; they sit right after it in _CHECK_PRIORITY, lead the
#: round-11 queue, and are judge-sim exact-verified at three scales
#: meanwhile (NOTES round 10).
DEFERRED: set[str] = {
    "agg_argmax_argmin",
    "stats_covariance",
    "win_session_window_builtin",
    "text_quality_gopher",
    "url_canonical_dedup",
    "scan_dpp_join",
    "math_round_families",
    "text_blocklist_filter",
}


def _latest_driver_rows() -> dict[str, dict]:
    rows: dict[str, dict] = {}
    for path in sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    ):
        with open(path) as fh:
            rows.update(json.load(fh))
    return rows


def _required_keys() -> set[str]:
    specs = all_specs()
    latest = _latest_driver_rows()
    required = set()
    for key, spec in specs.items():
        if spec.oracle is None:
            continue  # rows-only by design; driver can't hash-check it
        row = latest.get(key)
        if row is None or row.get("hash_match") is not True:
            required.add(key)
    required |= RECHECK & set(specs)
    required |= REFRESH & set(specs)
    return required


def test_window_covers_required_keys():
    required = _required_keys()
    ordered = list(all_specs())
    window = set(ordered[:WINDOW])
    missing = required - window - DEFERRED
    assert not missing, (
        f"{len(missing)} keys require a driver row but are outside the "
        f"first-{WINDOW} window and not declared DEFERRED: "
        f"{sorted(missing)} — rotate registry._CHECK_PRIORITY"
    )


def test_window_wastes_no_slots():
    # Every window slot should go to a key that needs proving; a green
    # key occupying a slot while `required` overflows is a wasted run.
    required = _required_keys()
    ordered = list(all_specs())
    if len(required) >= WINDOW:
        stale = set(ordered[:WINDOW]) - required
        assert not stale, (
            f"window slots spent on already-green keys while "
            f"{len(required)} keys need rows: {sorted(stale)}"
        )


def test_deferred_keys_lead_next_round():
    ordered = list(all_specs())
    for key in DEFERRED:
        assert key in _CHECK_PRIORITY, f"{key} deferred but not pinned"
        pos = ordered.index(key)
        assert WINDOW <= pos < WINDOW + len(DEFERRED), (
            f"{key} deferred but sits at position {pos}; it must sit "
            f"just past the window so it leads the round-8 rotation"
        )


def test_priority_keys_are_registered():
    specs = all_specs()
    unknown = [k for k in _CHECK_PRIORITY if k not in specs]
    assert not unknown, f"_CHECK_PRIORITY names unregistered keys: {unknown}"
