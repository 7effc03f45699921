"""Third-engine pins for the round-11 batch-2 keys (house gate:
numpy/pandas/pure-Python recomputation over the same parquet bytes at
sf0.001 — no shared code or SQL dialect with either engine)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from clickhousebackup_spark.registry import all_specs

SPECS = all_specs()


def _pd(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def test_seasonal_index_matches_pandas(spark, sf_dir):
    got = {
        r["month"]: r
        for r in SPECS["orders_seasonal_index"].fn(spark, sf_dir).collect()
    }
    o = _pd(sf_dir, "orders")
    cents = np.floor(100.0 * o["o_totalprice"].to_numpy(np.float64)).astype(
        np.int64
    )
    months = o["o_orderdate"].dt.month.to_numpy()
    total = int(cents.sum())
    for m in sorted(set(months.tolist())):
        mc = int(cents[months == m].sum())
        r = got[m]
        assert r["month_cents"] == mc
        assert r["n_orders"] == int((months == m).sum())
        assert r["seasonal_index_permille"] == math.floor(
            1000.0 * 12.0 * mc / total
        )


def test_minmax_scan_matches_pandas_band(spark, sf_dir):
    got = sorted(
        r["o_orderkey"]
        for r in SPECS["scan_minmax_pruned"].fn(spark, sf_dir).collect()
    )
    o = _pd(sf_dir, "orders")
    want = sorted(
        o[
            (o["o_orderdate"] >= "1996-01-01") & (o["o_orderdate"] < "1996-02-01")
        ]["o_orderkey"].tolist()
    )
    assert got == want and len(want) > 0


def test_reconcile_matches_pandas(spark, sf_dir):
    out = SPECS["dq_orders_lineitem_reconcile"].fn(spark, sf_dir).collect()[0]
    o = _pd(sf_dir, "orders")
    li = _pd(sf_dir, "lineitem")
    line_cents = np.floor(
        100.0
        * (
            li["l_extendedprice"].to_numpy(np.float64)
            * (1.0 - li["l_discount"].to_numpy(np.float64))
        )
    ).astype(np.int64)
    lsum = defaultdict(int)
    for k, c in zip(li["l_orderkey"].tolist(), line_cents.tolist()):
        lsum[k] += c
    okeys = set(o["o_orderkey"].tolist())
    n_orphan = len(set(lsum) - okeys)
    n_exact = n_within = n_beyond = n_nolines = 0
    oc = np.floor(100.0 * o["o_totalprice"].to_numpy(np.float64)).astype(
        np.int64
    )
    for k, c in zip(o["o_orderkey"].tolist(), oc.tolist()):
        if k not in lsum:
            n_nolines += 1
        elif lsum[k] == c:
            n_exact += 1
        elif abs(lsum[k] - c) * 100 <= c:
            n_within += 1
        else:
            n_beyond += 1
    assert (
        out["n_orders"],
        out["n_orders_no_lines"],
        out["n_exact"],
        out["n_within_1pct"],
        out["n_beyond_1pct"],
        out["n_orphan_lines"],
    ) == (len(o), n_nolines, n_exact, n_within, n_beyond, n_orphan)


def test_waterfall_matches_numpy(spark, sf_dir):
    out = SPECS["lineitem_revenue_waterfall"].fn(spark, sf_dir).collect()[0]
    li = _pd(sf_dir, "lineitem")
    p = li["l_extendedprice"].to_numpy(np.float64)
    d = li["l_discount"].to_numpy(np.float64)
    t = li["l_tax"].to_numpy(np.float64)
    gross = int(np.floor(100.0 * p).astype(np.int64).sum())
    disc = int(np.floor(100.0 * (p * d)).astype(np.int64).sum())
    tax = int(np.floor(100.0 * ((p * (1.0 - d)) * t)).astype(np.int64).sum())
    assert (out["gross_cents"], out["discount_cents"], out["tax_cents"]) == (
        gross,
        disc,
        tax,
    )
    assert out["net_cents"] == gross - disc
    assert out["charged_cents"] == gross - disc + tax


def test_permutation_test_matches_pure_python(spark, sf_dir):
    out = SPECS["stats_permutation_test_hash"].fn(spark, sf_dir).collect()[0]
    ev = _pd(sf_dir, "events")
    ev = ev[ev["event_type"].isin(["click", "view"])]
    from decimal import Decimal

    def dsum(vals):
        # replicate DECIMAL(38,6) truncation-free quantized sum
        return float(
            sum(Decimal(repr(v)).quantize(Decimal("0.000001")) for v in vals)
        )

    c = ev[ev["event_type"] == "click"]["value"].tolist()
    v = ev[ev["event_type"] == "view"]["value"].tolist()
    obs = dsum(c) / len(c) - dsum(v) / len(v)
    assert out["n_click"] == len(c) and out["n_view"] == len(v)
    assert abs(out["obs_diff"] - obs) <= 1e-9 * max(1.0, abs(obs))
    n_exceed = 0
    ids = ev["event_id"].tolist()
    vals = ev["value"].tolist()
    for b in range(64):
        sides = [
            int(hashlib.md5(f"{i}_{b}".encode()).hexdigest()[:15], 16) % 2
            for i in ids
        ]
        g0 = [x for s, x in zip(sides, vals) if s == 0]
        g1 = [x for s, x in zip(sides, vals) if s == 1]
        if g0 and g1:
            diff = dsum(g0) / len(g0) - dsum(g1) / len(g1)
            if abs(diff) >= abs(out["obs_diff"]):
                n_exceed += 1
    assert out["n_exceed"] == n_exceed
    assert out["p_value"] == (1.0 + n_exceed) / 65.0


def test_transition_lift_matches_pure_python(spark, sf_dir):
    got = {
        (r["src"], r["dst"]): r
        for r in SPECS["path_transition_lift"].fn(spark, sf_dir).collect()
    }
    ev = _pd(sf_dir, "events").sort_values(["user_id", "ts", "event_id"])
    cnt = Counter()
    for _, g in ev.groupby("user_id"):
        types = g["event_type"].tolist()
        for a, b in zip(types, types[1:]):
            cnt[(a, b)] += 1
    total = sum(cnt.values())
    src_t = Counter()
    dst_t = Counter()
    for (a, b), c in cnt.items():
        src_t[a] += c
        dst_t[b] += c
    assert set(got) == set(cnt)
    for (a, b), c in cnt.items():
        r = got[(a, b)]
        assert (r["cnt"], r["src_total"], r["dst_total"]) == (
            c,
            src_t[a],
            dst_t[b],
        )
        assert r["lift_permille"] == math.floor(
            1000.0 * c * total / (float(src_t[a]) * dst_t[b])
        )
