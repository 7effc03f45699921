"""Third-engine pins for the round-11 keys (house gate: every new
stat/measure is checked against an implementation that shares no
query-engine code or SQL dialect with either side —
numpy/pandas/pure-Python recomputation over the same parquet bytes
at sf0.001)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from clickhousebackup_spark.registry import all_specs

SPECS = all_specs()


def _pd(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def test_kruskal_wallis_matches_pure_python(spark, sf_dir):
    got = SPECS["stats_kruskal_wallis"].fn(spark, sf_dir).collect()[0]
    ev = _pd(sf_dir, "events")
    vals = ev["value"].to_numpy(np.float64)
    types = ev["event_type"].to_numpy(object)
    n = len(vals)
    # midranks via sort: double-rank d = 2*cnt_lt + c + 1
    cnt = Counter(vals.tolist())
    uniq = sorted(cnt)
    cnt_lt, acc = {}, 0
    for v in uniq:
        cnt_lt[v] = acc
        acc += cnt[v]
    s2 = defaultdict(int)
    ng = defaultdict(int)
    for v, t in zip(vals.tolist(), types.tolist()):
        s2[t] += 2 * cnt_lt[v] + cnt[v] + 1
        ng[t] += 1
    assert got["n"] == n and got["k"] == len(s2)
    tie = sum(c * c * c - c for c in cnt.values())
    assert int(got["tie_sum"]) == tie
    ssq = 0.0
    for t in sorted(s2):  # same event_type-ordered fold
        ssq += (float(s2[t]) * float(s2[t]) / 4.0) / float(ng[t])
    h = 12.0 / (float(n) * (n + 1.0)) * ssq - 3.0 * (n + 1.0)
    assert got["h_stat"] == h
    c_corr = 1.0 - float(tie) / (float(n) * n * n - n)
    assert got["h_adjusted"] == h / c_corr
    # sanity vs the rank-based textbook formulation (midranks direct)
    order = np.argsort(vals, kind="stable")
    ranks = np.empty(n, np.float64)
    i = 0
    sv = vals[order]
    while i < n:
        j = i
        while j < n and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    by_t = defaultdict(list)
    for r, t in zip(ranks.tolist(), types.tolist()):
        by_t[t].append(r)
    h_ref = 12.0 / (n * (n + 1.0)) * sum(
        (sum(rs) ** 2) / len(rs) for rs in by_t.values()
    ) - 3.0 * (n + 1.0)
    assert abs(got["h_stat"] - h_ref) <= 1e-9 * max(1.0, abs(h_ref))


def test_abc_analysis_matches_pandas(spark, sf_dir):
    got = {
        r["o_custkey"]: r
        for r in SPECS["orders_abc_analysis"].fn(spark, sf_dir).collect()
    }
    o = _pd(sf_dir, "orders")
    o["cents"] = np.floor(100.0 * o["o_totalprice"].to_numpy(np.float64)).astype(
        np.int64
    )
    rev = o.groupby("o_custkey")["cents"].sum().astype(np.int64)
    df = rev.reset_index().sort_values(
        ["cents", "o_custkey"], ascending=[False, True]
    )
    total = int(df["cents"].sum())
    cum = 0
    for _, row in df.iterrows():
        cum += int(row["cents"])
        want = (
            "A"
            if cum * 1000 <= total * 700
            else "B"
            if cum * 1000 <= total * 900
            else "C"
        )
        g = got[row["o_custkey"]]
        assert (g["rev_cents"], g["cum_cents"], g["abc_class"]) == (
            int(row["cents"]),
            cum,
            want,
        )


def test_tfidf_topk_matches_pure_python(spark, sf_dir):
    import re as _re

    got = defaultdict(list)
    for r in SPECS["text_tfidf_topk"].fn(spark, sf_dir).collect():
        got[r["doc_id"]].append((r["rk"], r["term"], r["tf"], r["df"], r["score"]))
    docs = _pd(sf_dir, "documents")
    tf = {}
    dfc = Counter()
    for _, row in docs.iterrows():
        toks = [t for t in _re.split(r"\s+", row["text"].lower()) if t != ""]
        c = Counter(toks)
        tf[row["doc_id"]] = c
        dfc.update(c.keys())
    for doc_id, c in tf.items():
        scored = sorted(
            (
                (-t_f * (1000000 // dfc[term]), term, t_f)
                for term, t_f in c.items()
            )
        )[:3]
        want = [
            (rk + 1, term, t_f, dfc[term], -negscore)
            for rk, (negscore, term, t_f) in enumerate(scored)
        ]
        assert sorted(got[doc_id]) == want, doc_id


def test_rolling_slope_matches_numpy_lstsq(spark, sf_dir):
    out = SPECS["ts_rolling_slope"].fn(spark, sf_dir).collect()
    assert out, "fixture must yield at least one full 8-window"
    ev = _pd(sf_dir, "events").sort_values(["user_id", "ts", "event_id"])
    ev["pos"] = ev.groupby("user_id").cumcount() + 1
    series = {
        u: g["value"].to_numpy(np.float64) for u, g in ev.groupby("user_id")
    }
    for r in out[:200]:
        y = series[r["user_id"]][r["pos"] - 8 : r["pos"]]
        x = np.arange(r["pos"] - 7, r["pos"] + 1, dtype=np.float64)
        slope = np.polyfit(x, y, 1)[0]
        assert abs(r["slope"] - slope) <= 1e-7 * max(1.0, abs(slope))


def test_groups_frame_matches_pandas(spark, sf_dir):
    got = {
        r["event_id"]: r["grp_cents"]
        for r in SPECS["win_groups_frame_emulated"].fn(spark, sf_dir).collect()
    }
    ev = _pd(sf_dir, "events")
    ev["day"] = ev["ts"].dt.strftime("%Y%m%d")
    ev["cents"] = np.floor(100.0 * ev["value"].to_numpy(np.float64)).astype(
        np.int64
    )
    day_tot = ev.groupby(["event_type", "day"])["cents"].sum()
    for (et, day), _ in day_tot.items():
        days = sorted(day_tot[et].index)
        i = days.index(day)
        want = int(
            sum(day_tot[(et, d)] for d in days[max(0, i - 1) : i + 2])
        )
        for eid in ev[(ev["event_type"] == et) & (ev["day"] == day)][
            "event_id"
        ]:
            assert got[eid] == want


def test_peak_hour_matches_pandas(spark, sf_dir):
    got = {
        r["event_type"]: r
        for r in SPECS["events_peak_hour"].fn(spark, sf_dir).collect()
    }
    ev = _pd(sf_dir, "events")
    ev["hr"] = ev["ts"].dt.hour
    for et, g in ev.groupby("event_type"):
        c = g.groupby("hr").size()
        peak_cnt = int(c.max())
        peak_hr = int(min(h for h, v in c.items() if v == peak_cnt))
        r = got[et]
        assert (r["peak_hour"], r["peak_count"], r["total"]) == (
            peak_hr,
            peak_cnt,
            len(g),
        )
        assert r["share_permille"] == math.floor(1000.0 * peak_cnt / len(g))
