"""Data-quality audit over a snapshot — the pre-backup gate, end to end.

The reference's operator runs `BACKUP DATABASE` and trusts the source;
a production pipeline audits the snapshot FIRST. This example chains
the engine's DQ vertical — every stage a driver-checked registry key —
into the report that decides whether the snapshot is publishable:

  1. referential integrity over the FK spine     (dq_referential_integrity)
  2. primary-key uniqueness                      (dq_uniqueness_audit)
  3. declarative expectations                    (dq_expectations)
  4. sequence-gap scan on the ingest keys        (seq_gaps_islands)
  5. per-source datasheet + corpus share         (corpus_datasheet)
  6. first-digit Benford screen on money columns (dq_benford_law)
  7. distribution drift between week halves      (dq_histogram_drift)
  8. volume anomaly flags                        (dq_volume_anomaly)
  9. orders<->lineitem totals reconciliation     (dq_orders_lineitem_reconcile)

Run: python examples/data_quality_audit.py  (sf0.001, a few seconds)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("CBS_EXAMPLE_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from pyspark.sql import functions as F

    from clickhousebackup_spark.registry import all_specs
    from clickhousebackup_spark.session import get_spark

    spark = get_spark("dq-audit")
    q = {k: s.fn for k, s in all_specs().items()}

    print(f"== data-quality audit over {SF} ==")

    fk = q["dq_referential_integrity"](spark, SF)
    bad = fk.filter(F.col("ok") == 0).count()
    print(f"1. FK spine: {fk.count()} relations, {bad} with orphans")

    uniq = q["dq_uniqueness_audit"](spark, SF)
    # events.user_id is audited as a DECLARED non-unique baseline; only
    # declared-unique keys count against the verdict. The fixture's
    # lineitem (l_orderkey, l_linenumber) composite genuinely fails —
    # a real generator quirk this audit is for (verified vs DuckDB).
    dup_keys = uniq.filter(
        (F.col("unique_ok") == 0)
        & ~F.col("key_name").contains("expected non-unique")
    ).count()
    print(f"2. PK uniqueness: {uniq.count()} audited, {dup_keys} violated")

    exp = q["dq_expectations"](spark, SF)
    failed = exp.filter(F.col("n_violations") > 0).count()
    print(f"3. expectations: {exp.count()} rules, {failed} failing")

    gaps = q["seq_gaps_islands"](spark, SF)
    top = gaps.limit(1).collect()
    widest = top[0]["gap_len"] if top else 0
    print(f"4. ingest-key gaps (URGENT stream): top-20 kept, widest {widest}")

    sheet = q["corpus_datasheet"](spark, SF)
    dups = sheet.agg(F.sum("n_exact_dups").alias("d")).collect()[0]["d"]
    print(f"5. datasheet: {sheet.count()} sources, {dups} exact dup docs")

    benford = q["dq_benford_law"](spark, SF)
    worst = benford.orderBy(F.col("chi2_contrib_micro").desc()).limit(1)
    w = worst.collect()[0]
    print(
        f"6. Benford screen: digit {w['digit']} deviates most "
        f"(observed {w['observed_micro'] / 10000:.1f}% vs expected "
        f"{w['benford_micro'] / 10000:.1f}%) — synthetic totals, as expected"
    )

    drift = q["dq_histogram_drift"](spark, SF)
    moved = drift.filter(F.abs(F.col("gap_pm")) > 50).count()
    print(f"7. drift: {drift.count()} bins, {moved} moved >50 permille")

    vol = q["dq_volume_anomaly"](spark, SF)
    anom = vol.filter(F.col("anomaly") == 1).count()
    print(f"8. volume: {vol.count()} day-type cells, {anom} anomalous")

    rec = q["dq_orders_lineitem_reconcile"](spark, SF).collect()[0]
    print(
        f"9. orders<->lineitem reconcile: {rec['n_exact']} exact, "
        f"{rec['n_within_1pct']} within 1%, {rec['n_beyond_1pct']} "
        f"beyond, {rec['n_orders_no_lines']} no-lines, "
        f"{rec['n_orphan_lines']} orphan lines (synthetic fixture: "
        f"totals are independent draws, so mismatches are expected)"
    )

    verdict = "PUBLISH" if (bad == 0 and dup_keys == 0) else "HOLD"
    print(f"== audit verdict: {verdict} ==")
    spark.stop()


if __name__ == "__main__":
    main()
