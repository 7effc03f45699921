"""Independent invariant checks for round-7 operators (SURVEY §5.2.4
style): recompute expected results with plain pandas/python — a THIRD
engine besides Spark and DuckDB, so a shared-oracle blind spot (both
sides computing the same wrong thing) is caught for the trickiest new
semantics: weighted quantile threshold crossing, shuffle-position
density, recursive-chain closed forms, and minhash error bounds.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from clickhousebackup_spark.registry import all_specs

SPECS = None


def _spec(key):
    global SPECS
    if SPECS is None:
        SPECS = all_specs()
    return SPECS[key]


def test_weighted_quantiles_match_bruteforce(spark, sf_dir):
    """wq(q) must equal the smallest cents whose cumulative weight
    reaches q*W — recomputed per group with a plain sorted pandas
    scan (no SQL at all)."""
    out = {
        r["l_returnflag"]: r
        for r in _spec("quantile_exact_weighted_grid")
        .fn(spark, sf_dir)
        .collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li["cents"] = (li.l_extendedprice * 100.0).apply(math.floor)
    li["w"] = li.l_quantity.apply(math.floor).astype(int)
    for flag, grp in li.groupby("l_returnflag"):
        g = grp.sort_values(
            ["cents", "l_orderkey", "l_linenumber"]
        ).reset_index()
        cum = g.w.cumsum()
        total = int(g.w.sum())
        row = out[flag]
        assert row["total_w"] == total
        for qnum, col in ((1, "wq25_cents"), (2, "wq50_cents"),
                          (3, "wq75_cents")):
            expected = int(g.cents[(cum * 4 >= total * qnum)].iloc[0])
            assert row[col] == expected, (flag, col)
        assert row["wq25_cents"] <= row["wq50_cents"] <= row["wq75_cents"]


def test_global_shuffle_positions_are_dense_permutations(spark, sf_dir):
    """Within every shard, pos must be exactly 1..n (dense, no gaps,
    no repeats) and the whole output a permutation of doc_ids."""
    pdf = _spec("corpus_global_shuffle").fn(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert sorted(pdf.doc_id) == sorted(docs.doc_id)
    for shard, grp in pdf.groupby("shard"):
        assert sorted(grp.pos) == list(range(1, len(grp) + 1)), shard
    assert 0 <= pdf.shard.min() and pdf.shard.max() < 64


def test_recursive_cte_matches_python_chain_walk(spark, sf_dir):
    """depth/chain_len/chain_sum have pure-python closed forms per
    doc: walk node -> node//2 until node <= 1."""
    rows = {
        r["doc_id"]: r
        for r in _spec("sql_recursive_cte").fn(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    for doc_id in docs.doc_id:
        node, chain = int(doc_id), []
        while True:
            chain.append(node)
            if node <= 1:
                break
            node //= 2
        r = rows[doc_id]
        assert r["chain_len"] == len(chain)
        assert r["depth"] == len(chain) - 1
        assert r["chain_sum"] == sum(chain)


def test_minhash_estimator_error_is_bounded_and_truth_exact(
    spark, sf_dir
):
    """For every candidate pair: the exact-Jaccard side must match a
    plain-python shingle-set computation, and the estimate must be
    n_match/8 on the permille grid (the only values a 3-bit estimator
    can emit)."""
    pairs = (
        _spec("dedup_minhash_estimate_vs_truth")
        .fn(spark, sf_dir)
        .collect()
    )
    assert pairs, "no LSH candidates at this sf — vacuous"
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").set_index(
        "doc_id"
    )

    def shingles(text: str) -> set[str]:
        toks = [t for t in text.lower().split() if t]
        if len(toks) >= 3:
            return {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }
        return {" ".join(toks)}

    for r in pairs:
        sa = shingles(docs.loc[r["a_id"], "text"])
        sb = shingles(docs.loc[r["b_id"], "text"])
        inter = len(sa & sb)
        assert r["n_common_shingles"] == inter, (r["a_id"], r["b_id"])
        jac = inter * 1000 // (len(sa) + len(sb) - inter)
        assert r["jac_permille"] == jac
        assert r["est_permille"] == r["est_matches"] * 1000 // 8
        assert r["err_permille"] == r["est_permille"] - jac
        assert 0 <= r["est_matches"] <= 8


def test_mrl_overlap_curve_is_sane(spark, sf_dir):
    """Overlap@20 is in [0, 20] per cell and the 32-dim prefix beats
    (or ties) the 8-dim prefix for every query — the monotonicity
    MRL promises on average holds pointwise on this fixture."""
    rows = _spec("emb_mrl_overlap_curve").fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        for c in ("overlap20_d8", "overlap20_d16", "overlap20_d32"):
            assert 0 <= r[c] <= 20
        assert r["overlap20_d32"] >= r["overlap20_d8"]
    assert sum(r["overlap20_d32"] for r in rows) > 0


@pytest.mark.parametrize("key", ["stream_stateful_totals"])
def test_stateful_totals_matches_pandas(spark, sf_dir, key):
    """Final streaming state vs a pure-pandas groupby of the feed."""
    out = {
        r["user_id"]: r for r in _spec(key).fn(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["micro"] = (ev.value * 1000000.0).apply(math.floor).astype(int)
    # normalize to µs regardless of the parquet/pandas resolution
    ev["us"] = ev.ts.astype("datetime64[us]").astype("int64")
    g = ev.groupby("user_id")
    for uid, grp in g:
        r = out[uid]
        assert r["n_events"] == len(grp)
        assert r["total_value_micro"] == int(grp.micro.sum())
        assert r["last_us"] == int(grp.us.max())
