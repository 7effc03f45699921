"""Round-9 ground-truth pinning (VERDICT r8 item 8): every new key
whose oracle shares the engine's formula gets an INDEPENDENT
third-engine recompute (pandas/numpy/pure python) so a shared wrong
formula cannot pass parity silently.
"""

from __future__ import annotations

import pandas as pd

from clickhousebackup_spark.registry import all_specs


def _spec(key):
    return all_specs()[key]


def test_referential_integrity_matches_set_difference(spark, sf_dir):
    out = {
        r["relation"]: r
        for r in _spec("dq_referential_integrity").fn(spark, sf_dir).collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    cases = {
        "lineitem.l_orderkey->orders": (
            li["l_orderkey"], set(orders["o_orderkey"])
        ),
        "orders.o_custkey->customer": (
            orders["o_custkey"], set(cust["c_custkey"])
        ),
        "customer.c_nationkey->nation": (
            cust["c_nationkey"], set(nation["n_nationkey"])
        ),
        "supplier.s_nationkey->nation": (
            supp["s_nationkey"], set(nation["n_nationkey"])
        ),
    }
    assert set(out) == set(cases)
    for rel, (child, parents) in cases.items():
        n_orphan = int((~child.isin(parents)).sum())
        assert out[rel]["n_child"] == len(child), rel
        assert out[rel]["n_orphan"] == n_orphan, rel
        assert out[rel]["ok"] == int(n_orphan == 0), rel
        # fixture truth: the TPC-H generator emits a consistent spine
        assert out[rel]["ok"] == 1, rel


def test_longest_increase_matches_python_scan(spark, sf_dir):
    out = {
        r["best_run"]: r["n_users"]
        for r in _spec("seq_longest_increase").fn(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    best: dict[int, int] = {}
    for uid, g in ev.groupby("user_id"):
        run = longest = 0
        prev = None
        for v in g["value"]:
            run = run + 1 if (prev is not None and v > prev) else 1
            longest = max(longest, run)
            prev = v
        best[uid] = longest
    want = pd.Series(best).value_counts().to_dict()
    assert out == {int(k): int(v) for k, v in want.items()}


def test_degree_histogram_matches_pandas_nunique(spark, sf_dir):
    out = {
        r["degree"]: r["n_suppliers"]
        for r in _spec("graph_degree_histogram").fn(spark, sf_dir).collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    deg = li.groupby("l_suppkey")["l_partkey"].nunique()
    want = deg.value_counts().to_dict()
    assert out == {int(k): int(v) for k, v in want.items()}


def test_backlog_aging_matches_pandas(spark, sf_dir):
    rows = _spec("orders_backlog_aging").fn(spark, sf_dir).collect()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o = o[o["o_orderstatus"] != "F"].copy()
    ref = pd.read_parquet(f"{sf_dir}/orders.parquet")["o_orderdate"].max()
    days = (ref - o["o_orderdate"]).dt.days
    o["bucket"] = (days // 180).clip(upper=4)
    g = o.groupby(["o_orderpriority", "bucket"])
    want_n = g.size().to_dict()
    want_v = g["o_totalprice"].sum().to_dict()
    assert len(rows) == len(want_n)
    for r in rows:
        k = (r["o_orderpriority"], r["age_bucket"])
        assert r["n_orders"] == want_n[k], k
        assert abs(r["backlog_value"] - want_v[k]) < 1e-4 * max(
            1.0, abs(want_v[k])
        ), k


def test_cramers_v_corrected_matches_numpy(spark, sf_dir):
    import numpy as np

    row = (
        _spec("stats_cramers_v_corrected").fn(spark, sf_dir).collect()[0]
    )
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    tab = pd.crosstab(ev["event_type"], ev["user_id"] % 4).to_numpy(
        dtype=float
    )
    n = tab.sum()
    exp = tab.sum(1, keepdims=True) @ tab.sum(0, keepdims=True) / n
    chi2 = ((tab - exp) ** 2 / exp).sum()
    kr, kc = tab.shape
    phi2c = max(chi2 / n - (kr - 1) * (kc - 1) / (n - 1), 0.0)
    krc = kr - (kr - 1) ** 2 / (n - 1)
    kcc = kc - (kc - 1) ** 2 / (n - 1)
    vc = (phi2c / min(krc - 1, kcc - 1)) ** 0.5
    assert abs(row["chi2"] - chi2) < 1e-6
    assert abs(row["phi2_corr"] - phi2c) < 1e-9
    assert abs(row["cramers_v_corr"] - vc) < 1e-9
    assert 0.0 <= row["cramers_v_corr"] <= 1.0


def test_bitset_prefilter_matches_pandas_semi_join(spark, sf_dir):
    rows = {
        r["l_returnflag"]: r
        for r in _spec("join_bitset_prefilter").fn(spark, sf_dir).collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    urgent = set(
        orders.loc[orders["o_orderpriority"] == "1-URGENT", "o_orderkey"]
    )
    kept = li[li["l_orderkey"].isin(urgent)]
    g = kept.groupby("l_returnflag")
    want_n = g.size().to_dict()
    want_rev = g["l_extendedprice"].sum().to_dict()
    assert set(rows) == set(want_n)
    for k in want_n:
        assert rows[k]["n_lines"] == want_n[k]
        assert abs(rows[k]["revenue"] - want_rev[k]) < 1e-4 * max(
            1.0, abs(want_rev[k])
        )


def test_contamination_bitset_invariants(spark, sf_dir):
    """The estimator contract, recomputed independently: exact hits
    = eval-sample size plus any duplicate texts, flagged ⊇ exact,
    and the false-positive count is exactly the difference."""
    row = _spec("contamination_bitset").fn(spark, sf_dir).collect()[0]
    import hashlib

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    h = docs["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
    b = h.map(lambda x: int(x[:8], 16) % 65536)
    ev_mask = docs["doc_id"] % 20 == 0
    ev_h, ev_b = set(h[ev_mask]), set(b[ev_mask])
    assert row["n_train"] == len(docs)
    assert row["n_exact"] == int(h.isin(ev_h).sum())
    assert row["n_flagged"] == int(b.isin(ev_b).sum())
    assert row["n_false_pos"] == row["n_flagged"] - row["n_exact"]
    assert row["n_exact"] >= int(ev_mask.sum())  # the leak is real


def test_ornull_combinators_empty_group_semantics(spark, sf_dir):
    rows = {
        r["event_type"]: r
        for r in _spec("agg_combinators_ornull").fn(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    import math

    for et, g in ev.groupby("event_type"):
        sel = g.loc[g["value"] > 400, "value"].map(
            lambda v: math.floor(v * 100)
        )
        r = rows[et]
        if len(sel) == 0:
            assert r["sum_cents_ornull"] is None
            assert r["sum_cents_ordefault"] == 0
            assert r["min_cents_ornull"] is None
            assert r["count_ornull"] is None
        else:
            assert r["sum_cents_ornull"] == sel.sum()
            assert r["sum_cents_ordefault"] == sel.sum()
            assert r["min_cents_ornull"] == sel.min()
            assert r["count_ornull"] == len(sel)


def test_uniqueness_audit_matches_pandas(spark, sf_dir):
    out = {
        r["key_name"]: r
        for r in _spec("dq_uniqueness_audit").fn(spark, sf_dir).collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    # the composite-key packing invariant the audit relies on
    assert int(li["l_linenumber"].max()) < 16
    cases = {
        "orders.o_orderkey": pd.read_parquet(f"{sf_dir}/orders.parquet")[
            "o_orderkey"
        ],
        "customer.c_custkey": pd.read_parquet(
            f"{sf_dir}/customer.parquet"
        )["c_custkey"],
        "lineitem.(l_orderkey,l_linenumber)": li["l_orderkey"] * 16
        + li["l_linenumber"],
        "events.user_id (expected non-unique)": pd.read_parquet(
            f"{sf_dir}/events.parquet"
        )["user_id"],
    }
    for name, s in cases.items():
        r = out[name]
        assert r["n_rows"] == len(s)
        assert r["n_keys"] == s.nunique()
        assert r["n_dup_rows"] == len(s) - s.nunique()
        assert r["unique_ok"] == int(len(s) == s.nunique())
    assert out["orders.o_orderkey"]["unique_ok"] == 1
    # the non-unique probe column proves the counter counts
    assert out["events.user_id (expected non-unique)"]["n_dup_rows"] > 0


def test_fulfillment_latency_matches_pandas(spark, sf_dir):
    rows = {
        r["o_orderpriority"]: r
        for r in _spec("orders_fulfillment_latency")
        .fn(spark, sf_dir)
        .collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    days = (j["l_shipdate"] - j["o_orderdate"]).dt.days
    j = j.assign(days=days)
    for pri, g in j.groupby("o_orderpriority"):
        r = rows[pri]
        assert r["n_lines"] == len(g)
        assert r["min_days"] == g["days"].min()
        assert r["max_days"] == g["days"].max()
        assert r["total_days"] == g["days"].sum()
        assert r["n_over_90d"] == int((g["days"] > 90).sum())
