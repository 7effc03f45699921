"""Round-9 batch-2 ground-truth pinning: the information-theoretic
statistics, experiment-design, sequence-gap, quantified-compare,
best-effort-parse, and temperature-mix keys recomputed in a third
engine (pure python / numpy / pandas) so a formula shared by the
Spark plan and its DuckDB oracle cannot be wrong in the same way
unnoticed.

Transcendental columns (ln / pow) are pinned with a +/-1 tolerance on
the floor-micro grid — Java's Math.log/pow and CPython's libm may
disagree in the final ulp, which is exactly the drift the grid
absorbs between Spark and DuckDB too.
"""

from __future__ import annotations

import math
from datetime import datetime

import numpy as np
import pandas as pd

from clickhousebackup_spark.registry import all_specs


def _spec(key):
    return all_specs()[key]


def _micro(x: float) -> int:
    return math.floor(1e6 * x)


def test_entropy_matches_python_math(spark, sf_dir):
    out = {
        r["event_type"]: r
        for r in _spec("stats_entropy").fn(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["hr"] = ev["ts"].dt.hour
    for etype, g in ev.groupby("event_type"):
        counts = g.groupby("hr").size().to_numpy()
        if len(counts) <= 1:
            assert etype not in out
            continue
        n = counts.sum()
        h = math.log(n) - sum(c * math.log(c) for c in counts) / n
        row = out[etype]
        assert row["n_events"] == n
        assert row["n_hours"] == len(counts)
        assert abs(row["entropy_micro"] - _micro(h)) <= 1
        assert (
            abs(row["entropy_norm_micro"] - _micro(h / math.log(len(counts))))
            <= 1
        )
        # fixture truth: traffic is near-uniform over the day, so the
        # normalized entropy is high (>0.9) for every type
        assert row["entropy_norm_micro"] > 900000


def test_theils_u_matches_python_math(spark, sf_dir):
    row = _spec("stats_theils_u").fn(spark, sf_dir).collect()[0]
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    n = len(d)
    cx = d.groupby("lang").size().to_numpy()
    cy = d.groupby("source").size().to_numpy()
    cxy = d.groupby(["lang", "source"]).size().to_numpy()
    hx = math.log(n) - sum(c * math.log(c) for c in cx) / n
    hxy = (
        sum(c * math.log(c) for c in cy)
        - sum(c * math.log(c) for c in cxy)
    ) / n
    assert row["n_docs"] == n
    assert abs(row["h_lang_micro"] - _micro(hx)) <= 1
    assert abs(row["h_lang_given_source_micro"] - _micro(hxy)) <= 1
    assert abs(row["theils_u_micro"] - _micro((hx - hxy) / hx)) <= 1
    # U is a [0, 1] coefficient, and conditioning cannot add entropy
    assert 0 <= row["theils_u_micro"] <= 1000000
    assert row["h_lang_given_source_micro"] <= row["h_lang_micro"]


def test_contingency_coef_matches_numpy(spark, sf_dir):
    row = _spec("stats_contingency_coef").fn(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["dow"] = ev["ts"].dt.day_name()
    obs = ev.groupby(["event_type", "dow"]).size().unstack(fill_value=0)
    o = obs.to_numpy(dtype=float)
    n = o.sum()
    e = np.outer(o.sum(axis=1), o.sum(axis=0)) / n
    chi2 = ((o - e) ** 2 / e).sum()
    r, c = o.shape
    assert row["n_events"] == int(n)
    assert row["n_rows"] == r and row["n_cols"] == c
    assert np.isclose(row["chi2"], chi2, rtol=1e-9)
    assert np.isclose(
        row["contingency_coef"], math.sqrt(chi2 / (chi2 + n)), rtol=1e-9
    )
    assert np.isclose(
        row["tschuprow_t"],
        math.sqrt((chi2 / n) / math.sqrt((r - 1) * (c - 1))),
        rtol=1e-9,
    )


def test_student_ttest_matches_python_moments(spark, sf_dir):
    row = _spec("stats_student_ttest").fn(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    a = ev.loc[ev.event_type == "click", "value"].to_numpy()
    b = ev.loc[ev.event_type == "view", "value"].to_numpy()
    n1, n2 = len(a), len(b)
    sp2 = (a.var(ddof=1) * (n1 - 1) + b.var(ddof=1) * (n2 - 1)) / (
        n1 + n2 - 2
    )
    t = (a.mean() - b.mean()) / math.sqrt(sp2 * (1 / n1 + 1 / n2))
    assert row["n1"] == n1 and row["n2"] == n2
    assert np.isclose(row["mean_click"], a.mean(), rtol=1e-9)
    assert np.isclose(row["mean_view"], b.mean(), rtol=1e-9)
    assert np.isclose(row["pooled_var"], sp2, rtol=1e-9)
    assert np.isclose(row["t_stat"], t, rtol=1e-9)
    assert row["df"] == n1 + n2 - 2


def test_ab_min_sample_matches_closed_form(spark, sf_dir):
    rows = _spec("stats_ab_min_sample").fn(spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    z = 1.959963984540054 + 0.8416212335729143
    mde = 0.02
    for r in rows:
        g = ev[ev.event_type == r["event_type"]]
        p1 = (g["value"] > 100.0).sum() / len(g)
        p2 = p1 + mde
        n_req = math.ceil(
            z * z * (p1 * (1 - p1) + p2 * (1 - p2)) / (mde * mde)
        )
        assert r["n_obs"] == len(g)
        assert np.isclose(r["conv_rate"], p1, rtol=1e-12)
        assert r["n_required_per_arm"] == n_req
        # sanity: detecting a 2pp lift needs thousands of samples/arm
        assert r["n_required_per_arm"] > 1000


def test_gaps_islands_matches_numpy_diff(spark, sf_dir):
    rows = [
        (r["gap_start"], r["gap_end"], r["gap_len"], r["prev_island_n"])
        for r in _spec("seq_gaps_islands").fn(spark, sf_dir).collect()
    ]
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    keys = np.sort(
        orders.loc[
            orders.o_orderpriority == "1-URGENT", "o_orderkey"
        ].unique()
    )
    assert len(keys) < keys[-1] - keys[0] + 1, "subset must have gaps"
    gaps = []
    run = 1
    for prev, nxt in zip(keys[:-1], keys[1:]):
        if nxt == prev + 1:
            run += 1
            continue
        gaps.append((int(prev + 1), int(nxt - 1), int(nxt - 1 - prev), run))
        run = 1
    gaps.sort(key=lambda g: (-g[2], g[0]))
    assert rows == gaps[:20]
    for gs, ge, gl, _ in rows:
        assert gl == ge - gs + 1 and gl > 0


def test_quantified_compare_matches_pandas(spark, sf_dir):
    out = {
        r["s_suppkey"]: r
        for r in _spec("sql_quantified_compare").fn(spark, sf_dir).collect()
    }
    s = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    sn = s.merge(n, left_on="s_nationkey", right_on="n_nationkey")
    bal7 = sn.loc[sn.n_name == "NATION_7", "s_acctbal"]
    bal3 = sn.loc[sn.n_name == "NATION_3", "s_acctbal"]
    assert len(out) == len(s)
    for _, row in s.iterrows():
        got = out[row["s_suppkey"]]
        # SQL quantified semantics incl. the empty-set edge (sf0.001
        # has 10 suppliers over 25 nations, so a slice CAN be empty):
        # x > ALL {} is TRUE, x < ANY {} is FALSE
        exp_all = 1 if len(bal7) == 0 else int(row["s_acctbal"] > bal7.max())
        exp_any = 0 if len(bal3) == 0 else int(row["s_acctbal"] < bal3.max())
        assert got["gt_all_n7"] == exp_all
        assert got["lt_any_n3"] == exp_any
    if len(bal7) > 0:
        # ALL over its own nation's slice is false for the members
        assert any(r["gt_all_n7"] == 0 for r in out.values())


def test_parse_best_effort_roundtrips_every_row(spark, sf_dir):
    rows = _spec("date_parse_best_effort").fn(spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").set_index("event_id")
    assert len(rows) == len(ev)
    pyfmt = ("%Y-%m-%d %H:%M:%S", "%d/%m/%Y %H:%M:%S",
             "%Y%m%dT%H%M%S", "%b %d %Y %H:%M:%S")
    for r in rows:
        # first-match == generating format: the four grammars are
        # mutually non-parsing, a checked invariant not luck
        assert r["matched_fmt"] == r["fmt_idx"]
        assert r["roundtrip_ok"] == 1
        truth = ev.loc[r["event_id"], "ts"].floor("s").to_pydatetime()
        # third engine: python strptime over the same wire string
        wire = truth.strftime(pyfmt[r["fmt_idx"]])
        assert (
            datetime.strptime(wire, pyfmt[r["fmt_idx"]]) == r["parsed_ts"]
        )


def test_temperature_mix_matches_python_pow(spark, sf_dir):
    rows = _spec("corpus_temperature_mix").fn(spark, sf_dir).collect()
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    counts = d.groupby("lang").size()
    n_total = counts.sum()
    z07 = sum(c**0.7 for c in counts)
    z03 = sum(c**0.3 for c in counts)
    assert {r["lang"] for r in rows} == set(counts.index)
    for r in rows:
        c = counts[r["lang"]]
        assert r["n_docs"] == c
        assert abs(r["share_micro"] - _micro(c / n_total)) <= 1
        assert abs(r["w07_micro"] - _micro(c**0.7 / z07)) <= 1
        assert abs(r["w03_micro"] - _micro(c**0.3 / z03)) <= 1
        assert abs(r["alloc07_100k"] - math.floor(1e5 * c**0.7 / z07)) <= 1
    # temperature flattening: alpha=0.3 sits between raw share and
    # uniform for the dominant language (en), i.e. it downsamples it
    en = next(r for r in rows if r["lang"] == "en")
    assert en["w03_micro"] < en["w07_micro"] < en["share_micro"]
    # allocations cover the budget up to flooring slack
    total_alloc = sum(r["alloc07_100k"] for r in rows)
    assert 100000 - len(rows) <= total_alloc <= 100000


def test_power_iteration_matches_numpy(spark, sf_dir):
    """Third engine: replay the exact gridded 3-step iteration in
    numpy (primary check), then assert the power-iteration contract
    invariants — monotone Rayleigh climb bounded by the spectrum."""
    rows = _spec("emb_power_iteration_pc1").fn(spark, sf_dir).collect()
    x = np.stack(
        pd.read_parquet(f"{sf_dir}/embeddings.parquet")["embedding"].to_numpy()
    ).astype(np.float64)
    v = np.full(x.shape[1], 0.125)
    for _ in range(3):
        s = x @ v
        u = np.floor(1e9 * (x * s[:, None])).sum(axis=0) / 1e9
        lam = math.sqrt((u * u).sum())
        v = u / lam
    got = sorted((r["dim"], r["loading"], r["eigenvalue"]) for r in rows)
    assert len(got) == x.shape[1]
    for (dim, loading, eig), vd in zip(got, v):
        # numpy vectorizes the folds differently, so exact-ulp
        # equality is not expected — 1e-9 relative is
        assert abs(loading - vd) <= 1e-9 * max(1.0, abs(vd)), dim
        assert np.isclose(eig, lam, rtol=1e-9)
    # contract invariants (the fixture spectrum is near-isotropic —
    # lambda2/lambda1 ~ 0.98 — so a fixed step count cannot isolate
    # PC1; what power iteration DOES guarantee on a PSD matrix is a
    # monotone Rayleigh climb bounded by the true lambda_1):
    lams = []
    w = np.full(x.shape[1], 0.125)
    for _ in range(3):
        uu = np.floor(1e9 * (x * (x @ w)[:, None])).sum(axis=0) / 1e9
        lams.append(math.sqrt((uu * uu).sum()))
        w = uu / lams[-1]
    assert lams[0] <= lams[1] + 1e-9 <= lams[2] + 2e-9, lams
    evals = np.linalg.eigvalsh(x.T @ x)
    assert evals.min() - 1e-6 <= lam <= evals.max() + 1e-6
    # the iterate is already above the spectrum's mean (it weights
    # large eigenvalues), the measurable claim isotropy allows
    assert lam > evals.mean()
