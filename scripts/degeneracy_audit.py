"""Registry-wide COLUMN degeneracy audit — the round-7 upgrade of the
round-6 row-count audit.

A 0-row result passes the driver's rows/schema/hash checks trivially;
round 6 started asserting non-zero row counts. But a numeric column
that is ALL-ZERO (or all-NULL) across every row is the same hazard one
level down: both engines compute the same wrong zero, so a broken
predicate/regex/counter hash-passes forever. Round 7 ran this audit
and caught seven real degenerates (NOTES.md "column degeneracy
audit"): absent funnel steps, absent search needles, everyone-active
churn, zero-variance z-tests, everyone-in-both-sets XOR, all-passing
DQ suites, and a WITH FILL grid with nothing to fill.

Run it after registering new keys AND once per round over everything:

    python scripts/degeneracy_audit.py              # all keys, sf0.01
    python scripts/degeneracy_audit.py key1 key2    # subset
    CBS_SIM_SF_DIR=/root/testdata/sf0.1 python scripts/degeneracy_audit.py

Findings need TRIAGE, not reflex fixes — three legitimate classes:
REAL degenerate (fix the key; if it had a green driver row, add it to
tests/test_rotation.py RECHECK), CORPUS-TRUTH zero (prove the dormant
expression fires on crafted input in a unit test instead), and
INFORMATIVE zero (document in NOTES.md). The ALLOW set below names
the columns triaged as the latter two classes so reruns stay quiet.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("CBS_SIM_SF_DIR", "/root/testdata/sf0.01")

#: (key, column) pairs triaged in round 7 as corpus-truth or
#: informative zeros (NOTES.md has the reasoning per entry).
ALLOW: set[tuple[str, str]] = {
    # CORPUS-TRUTH zero: the fixture has no byte-exact duplicate texts
    # below sf0.1 (8 dups at sf0.1 — round-6 finding, re-measured
    # round 9); the expression is proven live on crafted input in
    # tests/test_props_r9c.py::test_datasheet_counts_crafted_dups and
    # fires at sf0.1.
    ("corpus_datasheet", "n_exact_dups"),
    ("text_c4_gates", "n_digit"),
    ("text_c4_gates", "digit_permille"),
    ("text_c4_gates", "flag_long_word"),
    ("text_c4_gates", "flag_lorem"),
    ("text_c4_gates", "flag_curly"),
    ("text_c4_gates", "flag_terminal_punct"),
    ("text_quality_score", "n_punct"),
    ("table_column_stats", "n_nulls"),
    ("safe_casts", "bad_num"),
    ("dedup_threshold_sweep", "n_ge_50"),
    ("agg_bit_group", "band"),
    ("emb_dim_slice_search", "agree"),
    ("backup_verify_integrity", "n_missing"),
    ("backup_verify_integrity", "n_extra"),
    # top-5 ADC result rows coincidentally share code3=0 (the codes
    # vary across the full table; emb_pq_codes checks them all)
    ("sim_pq_adc_topk", "code3"),
    # corpus truth (round 8): events.value is bounded at 0 on the
    # left, so nothing sits 1.5 IQR below Q1 at any sf; the low-fence
    # branch is pinned on a crafted series in tests/test_determinism_r8.py
    ("ts_outliers_tukey", "n_low"),
}

#: Keys whose sf0.1 ZERO-ROW result is CORPUS-STRUCTURAL (triaged
#: round 7; the driver's sf0.01 gate has independent non-zero
#: evidence). This set gates ONLY the 0-row branch — column-level
#: sf0.1 triage lives in SF01_ALLOW so a NEW all-zero column in one
#: of these keys still gets reported:
#: - contamination_overlap returns 0 rows at sf0.1 because the
#:   fixture's bigram vocabulary is CLOSED (~930 grams at every sf),
#:   so document frequencies scale with corpus size and no gram
#:   stays under the rarity cutoff — real corpora grow vocabulary
#:   heavy-tailed, which is what rare-gram decontamination exploits;
#:   the sibling decontam_span_stats still fires at sf0.1.
SF01_STRUCTURAL: dict[str, str] = {
    "contamination_overlap": "closed fixture vocabulary",
}

#: (key, column) pairs triaged as structural zeros AT sf0.1 ONLY
#: (sf0.01 has non-zero evidence for the same column):
#: - dq_volume_anomaly.anomaly: the |delta|*2>prev flag finds nothing
#:   at sf0.1 — 10x events per day smooth the relative day-over-day
#:   swings below the alert threshold (statistically correct).
SF01_ALLOW: set[tuple[str, str]] = {
    ("dq_volume_anomaly", "anomaly"),
}

NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double",
           "long", "integer", "short"}


def main(argv: list[str]) -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from clickhousebackup_spark.registry import all_specs

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("degeneracy-audit")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    specs = all_specs()
    keys = [a for a in argv if not a.startswith("--")] or list(specs)
    findings: list[str] = []
    for k in keys:
        try:
            df = specs[k].fn(spark, SF_DIR)
            cols = [c for c, t in df.dtypes if t in NUMERIC]
            if df.isStreaming or not cols:
                continue
            row = df.agg(
                F.count(F.lit(1)).alias("__n"),
                *[F.max(F.abs(F.col(c))).alias(c) for c in cols],
            ).collect()[0]
            if row["__n"] == 0:
                if "sf0.1" in SF_DIR and k in SF01_STRUCTURAL:
                    continue  # documented corpus-structural zero
                findings.append(f"{k}: 0 ROWS")
                continue
            for c in cols:
                if (k, c) in ALLOW:
                    continue
                if "sf0.1" in SF_DIR and (k, c) in SF01_ALLOW:
                    continue
                if row[c] is None:
                    findings.append(f"{k}.{c}: all-NULL")
                elif float(row[c]) == 0.0:
                    findings.append(f"{k}.{c}: all-zero")
        except Exception as e:  # noqa: BLE001
            findings.append(f"{k}: ERROR {str(e)[:100]}")
    for f in findings:
        print("DEGENERATE", f)
    print(f"{len(keys)} keys audited at {SF_DIR}; "
          f"{len(findings)} findings")
    spark.stop()
    return min(len(findings), 120)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
