"""Third-engine pins for the round-11 batch-3 keys (numpy/pandas/
pure-Python recomputation over the same parquet bytes at sf0.001)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pandas as pd

from clickhousebackup_spark.registry import all_specs

SPECS = all_specs()


def _pd(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def test_welch_anova_matches_pure_python(spark, sf_dir):
    out = SPECS["stats_welch_anova"].fn(spark, sf_dir).collect()[0]
    ev = _pd(sf_dir, "events")
    groups = {
        t: g["value"].to_numpy(np.float64)
        for t, g in ev.groupby("event_type")
        if len(g) > 1
    }
    w, m, n = {}, {}, {}
    for t, x in groups.items():
        n[t] = len(x)
        m[t] = float(x.sum()) / n[t]
        s2 = float(((x - m[t]) ** 2).sum()) / (n[t] - 1)
        w[t] = n[t] / s2
    k = len(groups)
    W = sum(w.values())
    mw = sum(w[t] * m[t] for t in groups) / W
    between = sum(w[t] * (m[t] - mw) ** 2 for t in groups)
    lam = sum((1 - w[t] / W) ** 2 / (n[t] - 1) for t in groups)
    f = (between / (k - 1)) / (1 + 2 * (k - 2) / (k * k - 1) * lam)
    df2 = (k * k - 1) / (3 * lam)
    # rel=1e-6: the engine's moments ride the exprs.gsum floor grid
    # (round-14 sf1-exactness migration), truncating each value^k at
    # 1e-6 — so the third-engine pin can only hold to the grid
    # truncation envelope, not to double ulps (observed drift ~8e-9;
    # the pre-migration 1e-9 band was tighter than the grid allows).
    assert out["k"] == k
    assert out["weight_sum"] == pytest.approx(W, rel=1e-6)
    assert out["f_welch"] == pytest.approx(f, rel=1e-6)
    assert out["df2_welch"] == pytest.approx(df2, rel=1e-6)


import pytest  # noqa: E402  (used in approx above)


def test_wau_matches_pandas(spark, sf_dir):
    got = {
        r["day"]: r["wau"]
        for r in SPECS["events_wau_rolling"].fn(spark, sf_dir).collect()
    }
    ev = _pd(sf_dir, "events")
    ev["day"] = ev["ts"].dt.normalize()
    du = ev[["user_id", "day"]].drop_duplicates()
    max_day = du["day"].max()
    want = defaultdict(set)
    for _, r in du.iterrows():
        for i in range(7):
            wd = r["day"] + pd.Timedelta(days=i)
            if wd <= max_day:
                want[wd.strftime("%Y-%m-%d")].add(r["user_id"])
    assert got == {d: len(s) for d, s in want.items()}


def test_exclude_frame_matches_pandas(spark, sf_dir):
    got = {
        r["event_id"]: r["neighbor_cents"]
        for r in SPECS["win_frame_exclude_current"].fn(spark, sf_dir).collect()
    }
    ev = _pd(sf_dir, "events").sort_values(["event_type", "ts", "event_id"])
    ev["cents"] = np.floor(100.0 * ev["value"].to_numpy(np.float64)).astype(
        np.int64
    )
    for _, g in ev.groupby("event_type"):
        cents = g["cents"].tolist()
        ids = g["event_id"].tolist()
        for i, eid in enumerate(ids):
            lo, hi = max(0, i - 2), min(len(cents), i + 3)
            neigh = sum(cents[lo:hi]) - cents[i]
            if hi - lo <= 1:
                assert got[eid] is None
            else:
                assert got[eid] == neigh


def test_if_matrix_matches_pandas(spark, sf_dir):
    got = {
        r["event_type"]: r
        for r in SPECS["agg_combinators_if_matrix"].fn(spark, sf_dir).collect()
    }
    ev = _pd(sf_dir, "events")
    ev["cents"] = np.floor(100.0 * ev["value"].to_numpy(np.float64)).astype(
        np.int64
    )
    for t, g in ev.groupby("event_type"):
        hi = g[g["value"] > 500.0]
        very = g[g["value"] > 900.0]
        r = got[t]
        assert r["count_if_hi"] == len(hi)
        assert r["sum_cents_if_hi"] == (
            int(hi["cents"].sum()) if len(hi) else None
        )
        assert r["uniq_if_hi"] == hi["user_id"].nunique()
        if len(hi):
            assert r["avg_if_hi"] == pytest.approx(
                float(hi["value"].sum()) / len(hi), rel=1e-9
            )
        else:
            assert r["avg_if_hi"] is None
        assert r["min_cents_if_very_hi_ornull"] == (
            int(very["cents"].min()) if len(very) else None
        )
        assert r["max_cents_if_very_hi_ornull"] == (
            int(very["cents"].max()) if len(very) else None
        )


def test_hierarchical_dedup_matches_pandas(spark, sf_dir):
    import hashlib

    got = {
        r["content_md5"]: (r["doc_id"], r["n_copies"])
        for r in SPECS["dedup_hierarchical_two_level"].fn(spark, sf_dir).collect()
    }
    docs = _pd(sf_dir, "documents")
    want = defaultdict(lambda: [1 << 62, 0])
    for _, r in docs.iterrows():
        h = hashlib.md5(r["text"].encode()).hexdigest()
        want[h][0] = min(want[h][0], r["doc_id"])
        want[h][1] += 1
    assert got == {h: (v[0], v[1]) for h, v in want.items()}


def test_peak_position_matches_python_sweep(spark, sf_dir):
    got = {
        r["pri"]: (r["max_concurrent"], r["first_peak_day"])
        for r in SPECS["intervals_peak_position"].fn(spark, sf_dir).collect()
    }
    o = _pd(sf_dir, "orders")
    from collections import Counter

    by_pri = defaultdict(Counter)
    for _, r in o.iterrows():
        s = r["o_orderdate"]
        e = s + pd.Timedelta(days=int(r["o_orderkey"] % 30 + 1))
        by_pri[r["o_orderpriority"]][s] += 1
        by_pri[r["o_orderpriority"]][e] -= 1
    for pri, deltas in by_pri.items():
        conc, best, best_t = 0, -1, None
        for t in sorted(deltas):
            conc += deltas[t]
            if conc > best:
                best, best_t = conc, t
        assert got[pri] == (best, best_t.strftime("%Y-%m-%d")), pri


def test_has_subsequence_matches_two_pointer(spark, sf_dir):
    """The greedy instr chain must agree with the canonical
    two-pointer subsequence check on every fixture name."""
    got = {
        r["p_partkey"]: r["has_etl"]
        for r in SPECS["str_has_subsequence"].fn(spark, sf_dir).collect()
    }
    parts = _pd(sf_dir, "part")

    def is_subseq(needle, hay):
        it = iter(hay)
        return all(ch in it for ch in needle)

    for _, r in parts.iterrows():
        assert got[r["p_partkey"]] == int(is_subseq("etl", r["p_name"]))


def test_seasonal_naive_backtest_matches_pandas(spark, sf_dir):
    got = {
        r["event_type"]: r
        for r in SPECS["ts_backtest_seasonal_naive"].fn(spark, sf_dir).collect()
    }
    ev = _pd(sf_dir, "events")
    ev["day"] = ev["ts"].dt.normalize()
    ev["cents"] = np.floor(100.0 * ev["value"].to_numpy(np.float64)).astype(
        np.int64
    )
    day = ev.groupby(["event_type", "day"])["cents"].sum()
    for et in ev["event_type"].unique():
        series = day[et]
        errs = []
        for d, c in series.items():
            prev = d - pd.Timedelta(days=7)
            if prev in series.index:
                errs.append(abs(int(c) - int(series[prev])))
        r = got[et]
        assert r["n_pairs"] == len(errs)
        assert r["total_abs_err_cents"] == sum(errs)
        assert r["mae_cents_floor"] == sum(errs) // len(errs)
