"""Independent-recomputation checks for round-4 operators — the same
philosophy as test_props_r3: validate against a closed form or a
Python brute force that shares NO code with the implementation (the
oracle-parity suite already cross-checks DuckDB; this guards against
both engines agreeing on the same wrong answer).
"""

from __future__ import annotations

from collections import defaultdict

from clickhousebackup_spark.registry import all_specs

SPECS = all_specs()


def test_hierarchy_flatten_matches_closed_form(spark, sf_dir):
    # parent(k) = k div 10 means root = leading digit, depth = digits-1
    rows = SPECS["dict_hierarchy_flatten"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        k = r["p_partkey"]
        s = str(k)
        assert r["root"] == int(s[0]), (k, r["root"])
        assert r["depth"] == len(s) - 1, (k, r["depth"])


def test_weighted_median_matches_brute_force(spark, sf_dir):
    from clickhousebackup_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "event_id", "user_id"
    ).collect()
    groups = defaultdict(list)
    for r in ev:
        groups[r["event_type"]].append(
            (r["value"], r["event_id"], r["user_id"] % 5 + 1)
        )
    expect = {}
    for g, items in groups.items():
        items.sort()
        total = sum(w for _, _, w in items)
        cw = 0
        for v, _, w in items:
            cw += w
            if 2 * cw >= total:
                expect[g] = v
                break
    got = {
        r["event_type"]: r["wmedian"]
        for r in SPECS["agg_weighted_median"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_max_concurrent_matches_brute_force(spark, sf_dir):
    from clickhousebackup_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate", "o_orderkey"
    ).collect()
    pts = defaultdict(list)
    for r in orders:
        import datetime as dt

        s = r["o_orderdate"]
        e = s + dt.timedelta(days=r["o_orderkey"] % 30 + 1)
        pts[r["o_orderpriority"]].append((s, 1))
        pts[r["o_orderpriority"]].append((e, -1))
    expect = {}
    for pri, events in pts.items():
        events.sort()  # (t, delta): -1 before +1 at equal t
        cur = best = 0
        for _, d in events:
            cur += d
            best = max(best, cur)
        expect[pri] = best
    got = {
        r["pri"]: r["max_concurrent"]
        for r in SPECS["intervals_max_concurrent"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_upsert_update_and_insert_arms(spark, sf_dir):
    from clickhousebackup_spark.tables import load_table

    base = load_table(spark, sf_dir, "orders")
    n_base = base.count()
    n_changed = base.filter("o_orderkey % 7 = 0").count()
    out = SPECS["merge_upsert_cow"].fn(spark, sf_dir)
    assert out.count() == n_base + n_changed  # inserts add rows
    assert out.filter("o_orderstatus = 'U'").count() == n_changed
    assert out.filter("o_orderstatus = 'N'").count() == n_changed


def test_hierarchy_flatten_dangling_parent_is_terminal(spark, tmp_path):
    """A parent id ABSENT from the dictionary terminates the walk:
    the child reports the dangling id as its root, having traversed
    that one edge — children of dangling parents are never lost and
    never walked through invented nodes (the round-13 sf1 arm's
    offset key blocks pinned this rule into the oracle)."""
    # keys: 5 (root), 42 -> 4 (present root chain), 7301 -> 730
    # (730 ABSENT -> terminal), 730 missing, 73 present: 73 -> 7
    keys = [5, 4, 42, 73, 7301]
    d = str(tmp_path)
    spark.createDataFrame(
        [(k, f"part {k}", 1, "t", "b", 1.0) for k in keys],
        "p_partkey long, p_name string, p_size int, p_type string, "
        "p_brand string, p_retailprice double",
    ).write.mode("overwrite").parquet(f"{d}/part.parquet")
    got = {
        r["p_partkey"]: (r["root"], r["depth"])
        for r in SPECS["dict_hierarchy_flatten"].fn(spark, d).collect()
    }
    assert got == {
        5: (5, 0),       # root by rule
        4: (4, 0),
        42: (4, 1),      # parent present and a root
        73: (7, 1),      # parent 7 ABSENT but < 10 -> root id anyway
        7301: (730, 1),  # parent 730 ABSENT -> terminal dangling id
    }
