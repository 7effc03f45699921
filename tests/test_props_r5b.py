"""Independent-recomputation checks for the round-5b operators — the
same philosophy as test_props_r3/r4: validate against a closed form or
a Python brute force that shares NO code with the implementation (the
oracle-parity suite already cross-checks DuckDB; this guards against
both engines agreeing on the same wrong answer).
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from clickhousebackup_spark.registry import all_specs
from clickhousebackup_spark.tables import load_table

SPECS = all_specs()


def _click_view_values(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
    )
    pos = [r["value"] for r in rows if r["event_type"] == "click"]
    neg = [r["value"] for r in rows if r["event_type"] == "view"]
    return pos, neg


def test_roc_auc_matches_brute_force(spark, sf_dir):
    pos, neg = _click_view_values(spark, sf_dir)
    # brute force over all pairs: win = 1, tie = 0.5
    num2 = 0
    for p in pos:
        for n in neg:
            if p > n:
                num2 += 2
            elif p == n:
                num2 += 1
    row = SPECS["stats_roc_auc"].fn(spark, sf_dir).collect()[0]
    assert row["n_pos"] == len(pos)
    assert row["n_neg"] == len(neg)
    assert row["auc_num2"] == num2
    assert abs(row["auc"] - num2 / (2.0 * len(pos) * len(neg))) < 1e-12


def test_ks_matches_brute_force(spark, sf_dir):
    pos, neg = _click_view_values(spark, sf_dir)
    values = sorted(set(pos + neg))
    n1, n2 = len(pos), len(neg)
    best = 0
    for v in values:
        c1 = sum(1 for x in pos if x <= v)
        c2 = sum(1 for x in neg if x <= v)
        best = max(best, abs(c1 * n2 - c2 * n1))
    row = SPECS["stats_ks_test"].fn(spark, sf_dir).collect()[0]
    assert row["ks_num"] == best
    assert abs(row["ks_d"] - best / (n1 * n2)) < 1e-12


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    mid = n // 2
    if n % 2 == 1:
        return float(xs[mid])
    return (xs[mid - 1] + xs[mid]) / 2.0


def test_mad_matches_brute_force(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
    )
    groups = defaultdict(list)
    for r in rows:
        groups[r["event_type"]].append(math.floor(r["value"] * 1e6))
    for r in SPECS["stats_mad"].fn(spark, sf_dir).collect():
        vs = groups[r["event_type"]]
        med = _median(vs)
        mad = _median([abs(v - med) for v in vs])
        assert r["n"] == len(vs)
        assert r["med6"] == med
        assert r["mad6"] == mad


def test_bounding_ratio_endpoints(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    groups = defaultdict(list)
    for r in rows:
        groups[r["event_type"]].append((r["ts"], r["event_id"], r["value"]))
    for r in SPECS["ts_bounding_ratio"].fn(spark, sf_dir).collect():
        items = sorted(groups[r["event_type"]])
        assert r["v_first"] == items[0][2]
        assert r["v_last"] == items[-1][2]
        span_us = int(
            (items[-1][0] - items[0][0]).total_seconds() * 1_000_000
        )
        assert r["dt_us"] == span_us


def test_interval_union_bounds_and_brute_force(spark, sf_dir):
    import datetime as dt

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderdate", "o_orderkey")
        .collect()
    )
    ivs = defaultdict(list)
    for r in orders:
        s = r["o_orderdate"]
        e = s + dt.timedelta(days=r["o_orderkey"] % 30 + 1)
        ivs[r["o_orderpriority"]].append((s, e))
    expect = {}
    for pri, spans in ivs.items():
        spans.sort()
        total = 0
        islands = 0
        cur_s, cur_e = None, None
        for s, e in spans:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    total += (cur_e - cur_s).days
                cur_s, cur_e = s, e
                islands += 1
            else:
                cur_e = max(cur_e, e)
        total += (cur_e - cur_s).days
        expect[pri] = (islands, total)
    got = {
        r["pri"]: (r["n_islands"], r["union_days"])
        for r in SPECS["intervals_union_length"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_moving_agg_windows(spark, sf_dir):
    rows = SPECS["array_moving_agg"].fn(spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "user_id",
            "ts",
            "event_id",
            "cast(floor(value * 1e6) as long) as v6",
        )
        .collect()
    )
    series = defaultdict(list)
    for r in ev:
        series[r["user_id"]].append((r["ts"], r["event_id"], r["v6"]))
    for r in rows:
        vals = [v for _, _, v in sorted(series[r["user_id"]])]
        mov = [
            sum(vals[max(0, i - 2): i + 1]) for i in range(len(vals))
        ]
        assert r["mov3_csv"] == ",".join(str(x) for x in mov)


def test_bfs_layers_alternate_and_dist1_exact(spark, sf_dir):
    rows = SPECS["graph_bfs_hops"].fn(spark, sf_dir).collect()
    by = {(r["side"], r["id"]): r["dist"] for r in rows}
    # a node appears once with one minimal distance
    assert len(by) == len(rows)
    for (side, _id), d in by.items():
        if side == "c":
            assert d % 2 == 0
        else:
            assert d % 2 == 1
    # layer-1 brute force: suppliers of customer 1 via orders+lineitem
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey"
    ).collect()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    ).collect()
    okeys = {r["o_orderkey"] for r in o if r["o_custkey"] == 1}
    s1 = {r["l_suppkey"] for r in li if r["l_orderkey"] in okeys}
    got_s1 = {i for (side, i), d in by.items() if side == "s" and d == 1}
    assert got_s1 == s1


def test_lttb_selects_one_point_per_bucket(spark, sf_dir):
    rows = SPECS["ts_lttb_downsample"].fn(spark, sf_dir).collect()
    seen = set()
    per_series = defaultdict(list)
    for r in rows:
        key = (r["event_type"], r["bucket_ts"])
        assert key not in seen
        seen.add(key)
        per_series[r["event_type"]].append((r["bucket_ts"], r["mode"]))
    for _, buckets in per_series.items():
        buckets.sort()
        modes = [m for _, m in buckets]
        assert modes[0] == "first"
        assert modes[-1] == "last"
        assert all(m == "area" for m in modes[1:-1])


def test_sparkbar_renders_24_glyphs(spark, sf_dir):
    from clickhousebackup_spark.operators.analytics4 import SPARK_GLYPHS

    for r in SPECS["agg_sparkbar"].fn(spark, sf_dir).collect():
        assert len(r["sparkbar"]) == 24
        assert set(r["sparkbar"]) <= set(SPARK_GLYPHS)
        # the busiest hour renders the full block
        assert SPARK_GLYPHS[-1] in r["sparkbar"]


def test_topk_with_ties_keeps_all_ties(spark, sf_dir):
    rows = SPECS["topk_with_ties"].fn(spark, sf_dir).collect()
    per = defaultdict(list)
    for r in rows:
        per[r["pri"]].append((r["rnk"], r["o_totalprice"]))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    allp = defaultdict(list)
    for r in orders:
        allp[r["o_orderpriority"]].append(r["o_totalprice"])
    for pri, got in per.items():
        assert len(got) >= min(5, len(allp[pri]))
        cutoff = min(p for _, p in got)
        # every order priced above the cutoff is present
        above = sum(1 for p in allp[pri] if p > cutoff)
        assert above < len(got)


def test_minhash_export_matches_brute_force(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    rows = {
        r["doc_id"]: r
        for r in SPECS["text_minhash_export"].fn(spark, sf_dir).collect()
    }

    def h(i, sh):
        return int(
            hashlib.md5(f"{i}:{sh}".encode()).hexdigest()[:15], 16
        )

    for d in docs[:50]:
        toks = [t for t in d["text"].lower().split() if t]
        if len(toks) >= 3:
            shs = {
                " ".join(toks[i: i + 3]) for i in range(len(toks) - 2)
            }
        else:
            shs = {" ".join(toks)}
        r = rows[d["doc_id"]]
        assert r["n_shingles"] == len(shs)
        for i in range(8):
            assert r[f"h{i}"] == min(h(i, s) for s in shs)


def test_simhash_export_matches_brute_force(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    rows = {
        r["doc_id"]: r
        for r in SPECS["text_simhash_export"].fn(spark, sf_dir).collect()
    }
    for d in docs[:50]:
        tf = defaultdict(int)
        for t in d["text"].lower().split():
            if t:
                tf[t] += 1
        sim = 0
        for b in range(16):
            vote = 0
            for w, c in tf.items():
                hw = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
                vote += c if (hw >> b) & 1 else -c
            if vote > 0:
                sim |= 1 << b
        r = rows[d["doc_id"]]
        assert r["n_tokens"] == sum(tf.values())
        assert r["simhash"] == sim


def test_vector_distances_match_numpy_free_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb}
    rows = SPECS["emb_vector_distances"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        a = vecs[r["vec_id"]]
        b = vecs[r["vec_id"] + 1]
        dot = sum(x * y for x, y in zip(a, b))
        l1 = sum(abs(x - y) for x, y in zip(a, b))
        l2 = math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))
        linf = max(abs(x - y) for x, y in zip(a, b))
        assert abs(r["dot"] - dot) < 1e-9
        assert abs(r["l1"] - l1) < 1e-9
        assert abs(r["l2"] - l2) < 1e-9
        assert abs(r["linf"] - linf) < 1e-12
