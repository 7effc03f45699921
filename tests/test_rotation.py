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
#: Round 15 re-contracted scan_file_metadata to the layout-normalized
#: rollup; its post-normalization green row landed in CORRECTNESS_r15,
#: clearing that entry. Round 16 gave the four exact-baseline dedup
#: long-poles scale self-bounds (probe-slice past their footer-
#: metadata caps — VERDICT r15 item 1). Driver-gate scales sit far
#: below every cap, so the sf0.01 outputs are argued unchanged — but
#: the functions' code changed, so each must re-earn its green row
#: rather than silently keep the pre-change one.
RECHECK: set[str] = {
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_embedding_cosine",
    "dedup_fuzzy_blocked",
}

#: Regression refills: green keys whose evidence is the STALEST in the
#: registry (latest driver row = CORRECTNESS_r06), pulled back into
#: the window whenever fewer required keys exist than window slots.
#: Unlike RECHECK these are not suspected-stale semantics — they are
#: routine re-verification so no key's driver evidence ages without
#: bound. This is the 45-key list emitted by scripts/make_rotation.py
#: for round 16 (stalest greens: latest driver row = r6).
REFRESH: set[str] = {
    "agg_array_intersect",
    "agg_bit_group",
    "agg_group_array_last",
    "agg_hll_set_ops",
    "agg_minmax_map",
    "agg_retention_flags",
    "agg_sparkbar",
    "agg_uniq_array",
    "agg_uniq_upto",
    "array_compact_dedup",
    "array_fill_forward",
    "array_moving_agg",
    "array_rotate_zip",
    "corpus_pack_sequences",
    "curation_funnel_report",
    "date_timeslots",
    "emb_dim_slice_search",
    "emb_vector_distances",
    "funnel_time_to_convert",
    "graph_bfs_hops",
    "intervals_open_per_day",
    "intervals_union_length",
    "join_interval_overlap",
    "json_schema_stats",
    "quantile_timing_grid",
    "sequence_match_flag",
    "sequence_next_node",
    "stats_ks_test",
    "stats_linregress",
    "stats_mad",
    "stats_mean_ci",
    "stats_roc_auc",
    "str_extract_groups",
    "str_keyvalue_parse",
    "str_ngram_similarity",
    "str_normalized_query_hash",
    "table_column_stats",
    "text_cdc_chunks",
    "text_minhash_export",
    "text_ngram_lm_score",
    "text_simhash_export",
    "text_word_cooccurrence",
    "ts_autocorr_lag1",
    "win_ratio_to_report",
    "with_totals",
}

#: Keys that require a slot but are consciously pushed past position
#: ``WINDOW`` this round (they must still appear in _CHECK_PRIORITY,
#: right after the window, so they lead the next round's rotation).
#: Round 16 put the four dedup RECHECK keys and sketch_recall_probe's
#: oracle promotion in window positions 0-4 and filled slots 5-49
#: with the 45 REFRESH refills (stalest greens, latest driver row =
#: r6). Empty unless keys are registered mid-round after the window
#: is frozen.
DEFERRED: set[str] = set()


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


def _latest_round() -> int:
    rounds = [
        int(re.search(r"_r(\d+)", p).group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    ]
    return max(rounds) if rounds else 0


def test_window_wastes_no_slots():
    # Every window slot should go to a key that needs proving; a green
    # key occupying a slot while `required` overflows is a wasted run.
    # EXCEPT keys FIRST proven green by the LATEST driver file: those
    # were proven BY the current window doing its job, and the window
    # legitimately holds them until the next round's first commit
    # rotates (the judge runs this suite on the tree that already
    # contains the round's own CORRECTNESS file — the window must not
    # be declared stale by its own success). The exemption is
    # deliberately narrow — first-green in the latest file only, not
    # any-green — so a FORGOTTEN rotation trips here at most one
    # round later: once the stale window re-runs and its keys' green
    # rows stop being first-greens, the slots read stale again (and
    # scripts/make_rotation.py --check flags the mismatch
    # immediately, without waiting).
    required = _required_keys()
    ordered = list(all_specs())
    if len(required) >= WINDOW:
        r_now = _latest_round()
        earlier_green = set()
        latest_green = set()
        for path in sorted(
            glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
            key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
        ):
            rnd = int(re.search(r"_r(\d+)", path).group(1))
            with open(path) as fh:
                for k, v in json.load(fh).items():
                    if v.get("hash_match") is True:
                        (latest_green if rnd == r_now else earlier_green).add(k)
        just_proven = latest_green - earlier_green
        stale = set(ordered[:WINDOW]) - required - just_proven
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
