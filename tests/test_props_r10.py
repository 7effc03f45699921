"""Round-9 batch-4 ground-truth pinning: STL decomposition, one-way
ANOVA, Jarque-Bera, CUSUM alarms, bigram conditional entropy, the
two-feature OLS, and the schema profile recomputed in a third engine
(numpy / pandas / plain python) so a formula shared by the Spark plan
and its DuckDB oracle cannot be wrong in the same way unnoticed.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from clickhousebackup_spark.registry import all_specs


def _spec(key):
    return all_specs()[key]


def _events(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_stl_decompose_matches_pandas(spark, sf_dir):
    rows = _spec("ts_stl_decompose").fn(spark, sf_dir).collect()
    ev = _events(sf_dir)
    daily = (
        ev.assign(day=ev["ts"].dt.normalize())
        .groupby(["event_type", "day"])
        .size()
        .rename("v")
        .reset_index()
        .sort_values(["event_type", "day"])
    )
    out = {(r["event_type"], r["day"]): r for r in rows}
    n_checked = 0
    for etype, g in daily.groupby("event_type"):
        v = g["v"].to_numpy()
        days = g["day"].dt.date.to_numpy()
        sum7 = np.convolve(v, np.ones(7, dtype=np.int64), "valid")
        detr = 7 * v[3 : len(v) - 3] - sum7
        dows = np.array(
            [
                (d - pd.Timestamp("2024-01-01").date()).days % 7
                for d in days[3 : len(v) - 3]
            ]
        )
        seas = {
            w: detr[dows == w].sum() / (7.0 * (dows == w).sum())
            for w in set(dows)
        }
        for i, d in enumerate(days[3 : len(v) - 3]):
            row = out[(etype, d.isoformat())]
            assert row["value"] == v[3 + i]
            assert row["dow_idx"] == dows[i]
            assert abs(row["trend"] - sum7[i] / 7.0) < 1e-9
            assert abs(row["seasonal"] - seas[dows[i]]) < 1e-9
            assert (
                abs(
                    row["residual"]
                    - (detr[i] / 7.0 - seas[dows[i]])
                )
                < 1e-9
            )
            n_checked += 1
    assert n_checked == len(rows) and n_checked > 0
    # decomposition identity: value == trend + seasonal + residual
    for r in rows:
        assert (
            abs(r["value"] - (r["trend"] + r["seasonal"] + r["residual"]))
            < 1e-9
        )


def test_anova_matches_numpy(spark, sf_dir):
    row = _spec("stats_anova_oneway").fn(spark, sf_dir).collect()[0]
    ev = _events(sf_dir)
    groups = [g["value"].to_numpy() for _, g in ev.groupby("event_type")]
    n = sum(len(g) for g in groups)
    k = len(groups)
    grand = np.concatenate(groups).mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["n"] == n and row["k"] == k
    assert abs(row["ss_between"] - ssb) < 1e-6 * abs(ssb)
    assert abs(row["ss_within"] - ssw) < 1e-6 * abs(ssw)
    assert abs(row["f_stat"] - f) < 1e-6 * abs(f)


def test_jarque_bera_matches_numpy(spark, sf_dir):
    rows = {
        r["event_type"]: r
        for r in _spec("stats_jarque_bera").fn(spark, sf_dir).collect()
    }
    ev = _events(sf_dir)
    for etype, g in ev.groupby("event_type"):
        x = g["value"].to_numpy()
        n = len(x)
        mu = x.mean()
        m2 = ((x - mu) ** 2).mean()
        m3 = ((x - mu) ** 3).mean()
        m4 = ((x - mu) ** 4).mean()
        s = m3 / m2**1.5
        kex = m4 / m2**2 - 3.0
        jb = n / 6.0 * (s * s + kex * kex / 4.0)
        row = rows[etype]
        assert row["n_obs"] == n
        # s3/s4 ride the floor-micro grid -> ~1e-6-scale moment error
        assert abs(row["skewness"] - s) < 1e-4
        assert abs(row["excess_kurtosis"] - kex) < 1e-4
        assert abs(row["jb_stat"] - jb) < max(1e-2, 1e-3 * abs(jb))


def test_cusum_matches_python_fold(spark, sf_dir):
    rows = {
        r["event_type"]: r
        for r in _spec("ts_cusum_alarm").fn(spark, sf_dir).collect()
    }
    ev = _events(sf_dir)
    daily = (
        ev.assign(day=ev["ts"].dt.normalize())
        .groupby(["event_type", "day"])["value"]
        .mean()
        .reset_index()
        .sort_values(["event_type", "day"])
    )
    for etype, g in daily.groupby("event_type"):
        zs = g["value"].to_numpy()
        n = len(zs)
        s1 = 0.0
        s2 = 0.0
        for z in zs:
            s1 += z
            s2 += z * z
        mu = s1 / n
        sig = math.sqrt(max(0.0, s2 / n - mu * mu))
        kk, hh = 0.5 * sig, 4.0 * sig
        pos = max(0.0, zs[0] - mu - kk)
        neg = max(0.0, mu - zs[0] - kk)
        nal = 1 if (pos > hh or neg > hh) else 0
        for z in zs[1:]:
            pos = max(0.0, pos + (z - mu - kk))
            neg = max(0.0, neg + (mu - z - kk))
            if pos > hh or neg > hh:
                nal += 1
        row = rows[etype]
        assert row["n_days"] == n
        # pandas mean vs decimal-exact daily mean: tiny ulp slack
        assert abs(row["mu"] - mu) < 1e-7
        assert abs(row["sigma"] - sig) < 1e-7
        assert abs(row["cusum_pos"] - pos) < 1e-5
        assert abs(row["cusum_neg"] - neg) < 1e-5
        assert row["n_alarms"] == nal


def test_bigram_entropy_matches_python(spark, sf_dir):
    rows = {
        r["lang"]: r
        for r in _spec("token_bigram_entropy").fn(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    import re as _re

    by_lang: dict[str, dict] = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        st = by_lang.setdefault(
            lang, {"cells": {}, "ctx": {}, "n": 0}
        )
        ws = [w for w in _re.split(r"\s+", text.lower()) if w]
        for a, b in zip(ws, ws[1:]):
            st["cells"][(a, b)] = st["cells"].get((a, b), 0) + 1
            st["ctx"][a] = st["ctx"].get(a, 0) + 1
            st["n"] += 1
    for lang, st in by_lang.items():
        if st["n"] == 0:
            continue
        slogc = sum(c * math.log(c) for c in st["cells"].values())
        slogr = sum(r * math.log(r) for r in st["ctx"].values())
        h = (slogr - slogc) / st["n"]
        row = rows[lang]
        assert row["n_bigrams"] == st["n"]
        assert row["n_cells"] == len(st["cells"])
        assert row["n_contexts"] == len(st["ctx"])
        assert abs(row["cond_entropy_micro"] - math.floor(1e6 * h)) <= 1
        # unsmoothed conditional entropy is bounded by ln(vocab)
        assert 0 <= row["cond_entropy_micro"] <= 1e6 * math.log(
            max(2, len(st["ctx"]))
        )


def test_linregress_multi_matches_numpy(spark, sf_dir):
    row = _spec("stats_linregress_multi").fn(spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    q = li["l_quantity"].to_numpy()
    d = np.round(li["l_discount"].to_numpy() * 100.0) / 100.0
    p = np.round(li["l_extendedprice"].to_numpy() * 100.0) / 100.0
    X = np.column_stack([np.ones(len(q)), q, d])
    beta, *_ = np.linalg.lstsq(X, p, rcond=None)
    yhat = X @ beta
    ss_res = ((p - yhat) ** 2).sum()
    ss_tot = ((p - p.mean()) ** 2).sum()
    r2 = 1.0 - ss_res / ss_tot
    assert row["n_obs"] == len(q)
    assert abs(row["intercept"] - beta[0]) < 1e-4 * abs(beta[0])
    assert abs(row["beta_quantity"] - beta[1]) < 1e-4 * abs(beta[1])
    assert abs(row["beta_discount"] - beta[2]) < 1e-4 * abs(beta[2])
    assert abs(row["r_squared"] - r2) < 1e-6


def test_schema_profile_matches_pandas(spark, sf_dir):
    rows = {
        r["col_name"]: r
        for r in _spec("dq_schema_profile").fn(spark, sf_dir).collect()
    }
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    canon = {
        "o_orderkey": o["o_orderkey"].map(lambda v: str(v).zfill(20)),
        "o_custkey": o["o_custkey"].map(lambda v: str(v).zfill(20)),
        "o_orderstatus": o["o_orderstatus"],
        "o_totalprice": o["o_totalprice"].map(
            lambda v: str(int(math.floor(v * 1e6))).zfill(20)
        ),
        "o_orderdate": o["o_orderdate"].map(
            lambda v: str(int(v.value // 1000)).zfill(20)
        ),
        "o_orderpriority": o["o_orderpriority"],
    }
    assert set(rows) == set(canon)
    for col, s in canon.items():
        row = rows[col]
        assert row["n_rows"] == len(o)
        assert row["n_null"] == int(s.isna().sum())
        assert row["n_distinct"] == s.dropna().nunique()
        assert row["min_val"] == s.dropna().min()
        assert row["max_val"] == s.dropna().max()
        assert row["sum_len"] == int(s.dropna().str.len().sum())


def test_levene_bf_matches_numpy(spark, sf_dir):
    row = _spec("stats_levene_bf").fn(spark, sf_dir).collect()[0]
    ev = _events(sf_dir)
    devs = []
    for _, g in ev.sort_values(["value", "event_id"]).groupby(
        "event_type"
    ):
        v = g["value"].to_numpy()  # already value-sorted
        med = v[(len(v) + 1) // 2 - 1]  # lower median, rn=(n+1)//2
        devs.append(np.abs(g["value"].to_numpy() - med))
    n = sum(len(d) for d in devs)
    k = len(devs)
    grand = np.concatenate(devs).mean()
    ssb = sum(len(d) * (d.mean() - grand) ** 2 for d in devs)
    ssw = sum(((d - d.mean()) ** 2).sum() for d in devs)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["n"] == n and row["k"] == k
    assert abs(row["ss_between"] - ssb) < 1e-6 * max(1.0, abs(ssb))
    assert abs(row["ss_within"] - ssw) < 1e-6 * abs(ssw)
    assert abs(row["f_bf"] - f) < 1e-6 * max(1.0, abs(f))


def test_runs_test_matches_python(spark, sf_dir):
    rows = {
        r["event_type"]: r
        for r in _spec("stats_runs_test").fn(spark, sf_dir).collect()
    }
    ev = _events(sf_dir)
    daily = (
        ev.assign(day=ev["ts"].dt.normalize())
        .groupby(["event_type", "day"])["value"]
        .mean()
        .reset_index()
        .sort_values(["event_type", "day"])
    )
    for etype, g in daily.groupby("event_type"):
        zs = g["value"].to_numpy()
        mu = 0.0
        for z in zs:
            mu += z
        mu /= len(zs)
        sg = [1 if z > mu else 0 for z in zs]
        runs = 1 + sum(a != b for a, b in zip(sg, sg[1:]))
        n1, n2 = sum(sg), len(sg) - sum(sg)
        row = rows[etype]
        assert row["n_days"] == len(zs)
        assert row["n_above"] == n1 and row["n_below"] == n2
        assert row["n_runs"] == runs
        if n1 > 0 and n2 > 0 and n1 + n2 > 1:
            nt = n1 + n2
            e = 1.0 + 2.0 * n1 * n2 / nt
            var = (
                2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                / (nt * nt * (nt - 1.0))
            )
            assert abs(row["z_runs"] - (runs - e) / math.sqrt(var)) < 1e-7
        else:
            assert row["z_runs"] is None


def test_mattr_matches_python(spark, sf_dir):
    rows = {
        r["lang"]: r
        for r in _spec("text_mattr_diversity").fn(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    import re as _re

    agg: dict[str, dict] = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        ws = [w for w in _re.split(r"\s+", text.lower()) if w]
        if not ws:
            continue
        win = min(25, len(ws))
        nwin = len(ws) - win + 1
        sd = sum(
            len(set(ws[i : i + win])) for i in range(nwin)
        )
        st = agg.setdefault(
            lang, {"n": 0, "tok": 0, "sd": 0, "ratios": []}
        )
        st["n"] += 1
        st["tok"] += len(ws)
        st["sd"] += sd
        st["ratios"].append(sd / (win * nwin))
    for lang, st in agg.items():
        row = rows[lang]
        assert row["n_docs"] == st["n"]
        assert row["n_tokens"] == st["tok"]
        assert row["sum_distinct"] == st["sd"]
        mean = sum(st["ratios"]) / st["n"]
        assert abs(row["mean_mattr_micro"] - math.floor(1e6 * mean)) <= 2
        assert 0 < row["mean_mattr_micro"] <= 1000000


def test_business_days_matches_numpy_busday(spark, sf_dir):
    rows = _spec("date_business_days").fn(spark, sf_dir).collect()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    j = li.merge(
        o[["o_orderkey", "o_orderpriority", "o_orderdate"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    a = j["o_orderdate"].to_numpy().astype("datetime64[D]")
    b = j["l_shipdate"].to_numpy().astype("datetime64[D]")
    # the operator's contract is the signed measure f(b) - f(a)
    # (weekdays in [a, b), negated for reversed ranges); numpy's
    # busday_count flips to begin-EXCLUSIVE for reversed ranges, so
    # mirror the measure explicitly. Reversed ranges are real fixture
    # rows (ship before order) — the anomaly the report surfaces.
    lat = np.where(
        b >= a,
        np.busday_count(a, b),
        -np.busday_count(b, a),
    )
    truth = (
        pd.DataFrame(
            {"p": j["o_orderpriority"].to_numpy(), "bd": lat}
        )
        .groupby(["p", "bd"])
        .size()
        .to_dict()
    )
    got = {
        (r["o_orderpriority"], r["latency_bd"]): r["n_lines"]
        for r in rows
    }
    assert got == truth
    assert any(bd < 0 for _, bd in got)  # the fixture's anomaly rows
    assert any(bd > 0 for _, bd in got)


def test_pca2_matches_numpy_replica(spark, sf_dir):
    rows = sorted(
        _spec("emb_pca2_deflation").fn(spark, sf_dir).collect(),
        key=lambda r: r["dim"],
    )
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    d = X.shape[1]
    # gridded Gram exactly as the engines build it
    G = np.zeros((d, d))
    for x in X:
        G += np.floor(1e9 * np.outer(x, x))
    G /= 1e9

    def iterate(M):
        v = np.full(d, 0.125)
        for _ in range(3):
            u = M @ v
            lam = math.sqrt((u * u).sum())
            v = u / lam
        return v, lam

    v1, lam1 = iterate(G)
    B = G - lam1 * np.outer(v1, v1)
    v2, lam2 = iterate(B)
    got_v1 = np.array([r["pc1_loading"] for r in rows])
    got_v2 = np.array([r["pc2_loading"] for r in rows])
    assert len(rows) == d
    assert abs(rows[0]["eigenvalue1"] - lam1) < 1e-6 * lam1
    assert abs(rows[0]["eigenvalue2"] - lam2) < 1e-6 * lam2
    assert np.abs(got_v1 - v1).max() < 1e-6
    assert np.abs(got_v2 - v2).max() < 1e-6
    assert rows[0]["eigenvalue1"] >= rows[0]["eigenvalue2"] > 0
    # fixed-step iterates are NOT yet orthogonal on the isotropic
    # fixture — the diagnostic must reproduce the replica exactly
    ortho = math.floor(1e6 * abs(float(v1 @ v2)))
    assert all(abs(r["ortho_dot_micro"] - ortho) <= 1 for r in rows)
    # the deflated iterate must be (near-)orthogonal to PC1 and the
    # Rayleigh quotients must bracket the true top-2 spectrum
    w = np.linalg.eigvalsh(G)
    assert rows[0]["eigenvalue1"] <= w[-1] + 1e-9 * w[-1]
    assert rows[0]["eigenvalue2"] <= w[-1] + 1e-9 * w[-1]
