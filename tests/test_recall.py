"""Recall-probe determinism + floor tests (VERDICT r2 item #4): the
driver sees row counts; these pin the underlying recall values."""

from __future__ import annotations


def _rows(df):
    return {r["method"]: (r["recall"], r["floor"]) for r in df.collect()}


def test_sketch_recall_probe_floors_and_determinism(spark, sf_dir):
    from clickhousebackup_spark.extensions.recall import (
        RECALL_FLOOR,
        sketch_recall_probe,
    )

    got = _rows(sketch_recall_probe(spark, sf_dir))
    # every method clears its floor → all four rows present
    assert set(got) == set(RECALL_FLOOR)
    for m, (recall, floor) in got.items():
        assert recall >= floor >= 0.0
        assert floor == RECALL_FLOOR[m]
    # the exact-rerank sketches should be near-perfect on fixture data
    assert got["minhash"][0] >= 0.95
    assert got["ivf"][0] >= 0.85
    # deterministic: identical values on a rerun (fixed seeds, no RNG)
    assert _rows(sketch_recall_probe(spark, sf_dir)) == got
