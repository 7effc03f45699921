"""Property-based replays for the changelog/graph state families
(third sibling of test_ppjoin_property.py / test_sweepline_property.py).

``cdc_apply_changelog`` folds a sequenced I/U/D/I stream (derived
from the orders table by fixed mod rules) with latest-seq-wins +
tombstone-drop; ``graph_bfs_hops`` claims layered frontier expansion
with anti-join dedup yields minimum hop distances;
``funnel_strict_order`` claims the consecutive-position chain with a
24h span cap implements windowFunnel strict_order. Hypothesis
generates small tables so the mod chains, multi-path reachability,
the isolated-source edge case, broken chains, and multi-match users
vary per example, and each result is compared against a pure-Python
replay.
"""

from __future__ import annotations

import os
from collections import deque
from datetime import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhousebackup_spark.registry import all_specs

pytestmark = pytest.mark.slow

order_keys = st.lists(
    st.integers(min_value=0, max_value=60),
    min_size=1,
    max_size=14,
    unique=True,
)


def _brute_cdc(keys):
    state = {}
    for seq, (mod, op, delta) in enumerate(
        [(3, "I", 0.0), (6, "U", 500.0), (12, "D", None), (24, "I", 0.0)]
    ):
        for k in keys:
            if k % mod == 0:
                price = None if op == "D" else float(k) + delta
                state[k] = (seq, op, price)
    return {
        k: price
        for k, (seq, op, price) in state.items()
        if op != "D"
    }


@given(order_keys)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_cdc_changelog_matches_replay(spark, tmp_path_factory, keys):
    d = str(tmp_path_factory.mktemp("cdc"))
    spark.createDataFrame(
        [(k, 1, "O", float(k), datetime(2024, 1, 1), "P") for k in keys],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    got = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in all_specs()["cdc_apply_changelog"].fn(spark, d).collect()
    }
    assert got == _brute_cdc(keys)


#: tiny bipartite graphs: orders give customer->order, lineitems give
#: order->supplier; customer 1 is the BFS source and may or may not
#: have any edges.
graphs = st.tuples(
    st.lists(  # orders: (orderkey unique, custkey)
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=1, max_value=4),
        ),
        min_size=1,
        max_size=10,
        unique_by=lambda t: t[0],
    ),
    st.lists(  # lineitems: (orderkey, suppkey)
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=1, max_value=4),
        ),
        min_size=1,
        max_size=12,
    ),
)


def _brute_bfs(orders, lines):
    cust_of = dict(orders)  # orderkey -> custkey
    edges = set()
    for okey, supp in lines:
        if okey in cust_of:
            edges.add((cust_of[okey], supp))
    dist = {("c", 1): 0}
    q = deque([("c", 1)])
    while q:
        side, node = q.popleft()
        d = dist[(side, node)]
        if d >= 3:
            continue
        if side == "c":
            nxt = [("s", s) for c, s in edges if c == node]
        else:
            nxt = [("c", c) for c, s in edges if s == node]
        for t in nxt:
            if t not in dist:
                dist[t] = d + 1
                q.append(t)
    return {(s, n): d for (s, n), d in dist.items()}


@given(graphs)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_bfs_hops_matches_replay(spark, tmp_path_factory, g):
    orders, lines = g
    d = str(tmp_path_factory.mktemp("bfs"))
    spark.createDataFrame(
        [
            (okey, cust, "O", 1.0, datetime(2024, 1, 1), "P")
            for okey, cust in orders
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        [
            (okey, 1, supp, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", datetime(2024, 1, 2))
            for okey, supp in lines
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    got = {
        (r["side"], r["id"]): r["dist"]
        for r in all_specs()["graph_bfs_hops"].fn(spark, d).collect()
    }
    assert got == _brute_bfs(orders, lines)


#: funnel sequences: per-user event streams over the funnel vocab plus
#: a non-funnel distractor; minute gaps can exceed the 24h window.
funnel_streams = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),             # user
        st.sampled_from(["view", "click", "purchase", "other"]),
        st.integers(min_value=0, max_value=3000),          # minutes
    ),
    min_size=1,
    max_size=14,
)


def _brute_strict_funnel(rows):
    from collections import defaultdict

    per_user = defaultdict(list)
    for eid, (u, et, minute) in enumerate(rows):
        if et in ("view", "click", "purchase"):
            per_user[u].append((minute * 60_000_000, eid, et))
    out = {}
    for u, seq in per_user.items():
        seq.sort()
        first_pos, best_span = None, None
        for i in range(len(seq) - 2):
            a, b, c = seq[i], seq[i + 1], seq[i + 2]
            if (
                a[2] == "view"
                and b[2] == "click"
                and c[2] == "purchase"
                and c[0] - a[0] <= 86_400_000_000
            ):
                pos = i + 1  # 1-based funnel position
                span = c[0] - a[0]
                first_pos = pos if first_pos is None else min(first_pos, pos)
                best_span = span if best_span is None else min(best_span, span)
        out[u] = (
            1 if first_pos is not None else 0,
            first_pos if first_pos is not None else -1,
            best_span if best_span is not None else -1,
        )
    return out


@given(funnel_streams)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_strict_order_funnel_matches_replay(spark, tmp_path_factory, rows):
    """funnel_strict_order's consecutive-position chain (any
    intervening FUNNEL event breaks it; non-funnel events are
    invisible) with the 24h span cap, replayed in pure Python over
    generated streams — including broken chains, multiple matches per
    user (min pos and min span are independent), and users with no
    funnel events at all (absent from the output)."""
    d = str(tmp_path_factory.mktemp("funnel"))
    base = datetime(2024, 1, 1)
    from datetime import timedelta

    spark.createDataFrame(
        [
            (eid, base + timedelta(minutes=minute), u, et, 1.0, "")
            for eid, (u, et, minute) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r["user_id"]: (r["strict_matched"], r["first_match_pos"], r["best_span_us"])
        for r in all_specs()["funnel_strict_order"].fn(spark, d).collect()
    }
    assert got == _brute_strict_funnel(rows)
