"""Exactness proofs for the rank-window two-stage rewrites
(operators/analytics17.py — skew playbook family five).

``topk_per_group_twostage`` claims hash-identical output to the flat
``topk_per_group`` for ANY input, on the semilattice invariant: every
global top-3 row is ≤ 3rd in its own (cust, pmod(orderkey, 32)) salt
cell under the strict (price DESC, orderkey) order.
``win_rank_dense_twostage`` claims the same vs ``win_rank_dense`` on
the monotone-bucket invariant: floor(price/1000) is monotone in
price, so rank = rows-in-better-buckets + local rank, and equal
prices can never straddle a bucket boundary. Crafted fixtures pin
what each decomposition lives or dies on:

- a hot customer with far more than 3·cells orders (survivor pruning
  must still keep every global winner);
- orderkeys chosen to COLLIDE in one salt cell (0, 32, 64 — the top-3
  of one cell must survive even when the global top-3 all share a
  cell) and to spread across cells;
- price ties resolved by the orderkey tiebreak, both within one value
  bucket and at a kilobucket boundary (999.99… vs 1000.00);
- single-order customers and empty buckets between occupied ones
  (the offset window skips non-existent buckets by construction).

A hypothesis property compares both keys against brute-force Python
rankings over adversarially small corpora (3 customers, colliding
cents so ties and shared buckets are common).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhousebackup_spark.registry import all_specs

DAY0 = datetime(2024, 1, 1)

ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _mk(rows, tmp_path, spark):
    """rows: list of (orderkey, custkey, price)."""
    data = [
        (ok, ck, "O", float(price), DAY0 + timedelta(hours=ok % 48), "1-URGENT")
        for ok, ck, price in rows
    ]
    d = str(tmp_path)
    spark.createDataFrame(data, ORDERS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(f"{d}/orders.parquet")
    return d


def _brute_rank(rows):
    """{orderkey: global rank} under (price DESC, orderkey) per cust.
    The ordering tuple is unique, so rank = dense_rank = position."""
    by_cust: dict = {}
    for ok, ck, price in rows:
        by_cust.setdefault(ck, []).append((-price, ok))
    out = {}
    for orders in by_cust.values():
        orders.sort()
        for i, (_, ok) in enumerate(orders):
            out[ok] = i + 1
    return out


def _brute_topk(rows, k=3):
    return {ok: r for ok, r in _brute_rank(rows).items() if r <= k}


def _engine_topk(spark, d, key):
    return {
        r["o_orderkey"]: r["rank_in_cust"]
        for r in all_specs()[key].fn(spark, d).collect()
    }


def _engine_rank(spark, d, key):
    return {
        r["o_orderkey"]: (r["rnk"], r["drnk"])
        for r in all_specs()[key].fn(spark, d).collect()
    }


def test_crafted_salt_collisions_and_bucket_boundaries(spark, tmp_path):
    rows = [
        # cust 1: the global top-3 all land in salt cell 0 (orderkeys
        # 0, 32, 64 ≡ 0 mod 32) — the pruning must keep all three —
        # plus fillers in other cells that must NOT displace them.
        (0, 1, 5000.00),
        (32, 1, 4000.00),
        (64, 1, 3000.00),
        (1, 1, 2000.00),
        (2, 1, 1000.00),   # exactly on a kilobucket boundary
        (3, 1, 999.99),    # one cent below the boundary
        # cust 2: price ties inside ONE value bucket — orderkey
        # tiebreak decides ranks 1/2; both in different salt cells.
        (40, 2, 1500.50),
        (41, 2, 1500.50),
        (42, 2, 1499.99),
        # cust 3: single order, single bucket.
        (70, 3, 850.25),
    ]
    d = _mk(rows, tmp_path, spark)

    want_topk = _brute_topk(rows)
    assert _engine_topk(spark, d, "topk_per_group_twostage") == want_topk
    assert _engine_topk(spark, d, "topk_per_group") == want_topk

    want_rank = {ok: (r, r) for ok, r in _brute_rank(rows).items()}
    assert _engine_rank(spark, d, "win_rank_dense_twostage") == want_rank
    assert _engine_rank(spark, d, "win_rank_dense") == want_rank


def test_hot_customer_beyond_survivor_budget(spark, tmp_path):
    # 200 orders for one customer: more rows than the 96-survivor
    # budget, every salt cell populated, descending-by-key prices so
    # the winners sit in cells 0/1/2.
    rows = [(ok, 9, 100000.0 - ok) for ok in range(200)]
    d = _mk(rows, tmp_path, spark)
    assert _engine_topk(spark, d, "topk_per_group_twostage") == _brute_topk(
        rows
    )
    want = {ok: (r, r) for ok, r in _brute_rank(rows).items()}
    assert _engine_rank(spark, d, "win_rank_dense_twostage") == want


def test_oracles_are_shared_objects():
    specs = all_specs()
    assert (
        specs["topk_per_group"].oracle
        is specs["topk_per_group_twostage"].oracle
    )
    assert (
        specs["win_rank_dense"].oracle
        is specs["win_rank_dense_twostage"].oracle
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),       # cust
            st.integers(min_value=0, max_value=2500_00),  # cents
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t,
    )
)
def test_property_matches_brute(spark, tmp_path_factory, raw):
    # small cents domain relative to size → frequent exact price ties
    # and shared kilobuckets; orderkey = list index exercises every
    # salt cell as size grows.
    rows = [(i, ck, cents / 100.0) for i, (ck, cents) in enumerate(raw)]
    d = _mk(rows, tmp_path_factory.mktemp("ranktwo"), spark)
    assert _engine_topk(spark, d, "topk_per_group_twostage") == _brute_topk(
        rows
    )
    want = {ok: (r, r) for ok, r in _brute_rank(rows).items()}
    assert _engine_rank(spark, d, "win_rank_dense_twostage") == want


def _brute_ntile_firstlast(rows, k=4):
    """{orderkey: (quartile, top, bottom)} per cust-less status
    fixture: rows are (orderkey, status, price); NTILE with larger
    groups first under (price DESC, orderkey)."""
    by_st: dict = {}
    for ok, stt, price in rows:
        by_st.setdefault(stt, []).append((-price, ok))
    out = {}
    for orders in by_st.values():
        orders.sort()
        n = len(orders)
        small, extra = divmod(n, k)
        top, bottom = orders[0][1], orders[-1][1]
        pos = 0
        for tile in range(1, k + 1):
            size = small + 1 if tile <= extra else small
            for _ in range(size):
                if pos < n:
                    out[orders[pos][1]] = (tile, top, bottom)
                    pos += 1
    return out


def _engine_ntile(spark, d, key):
    return {
        r["o_orderkey"]: (
            r["quartile"], r["top_orderkey"], r["bottom_orderkey"]
        )
        for r in all_specs()[key].fn(spark, d).collect()
    }


def test_ntile_crafted_and_shared_oracle(spark, tmp_path):
    rows = [
        # status O: n=7 -> tiles of 2,2,2,1 (extra=3); ties at the
        # top resolved by orderkey; a kilobucket boundary pair.
        (0, 1, 5000.0), (1, 1, 5000.0), (2, 1, 4000.0), (3, 1, 1000.0),
        (4, 1, 999.99), (5, 1, 850.0), (6, 1, 860.0),
        # status F: n=3 < 4 -> tile == rank, top == rank1, bottom ==
        # rank3 (the s=0 branch of the closed form).
        (10, 2, 300.0), (11, 2, 200.0), (12, 2, 100.0),
        # status P: single order — every output is itself.
        (20, 3, 42.0),
    ]
    # reuse the orders writer with status mapped from the int key
    st_name = {1: "O", 2: "F", 3: "P"}
    data = [(ok, ck, st_name[ck], price) for ok, ck, price in rows]
    from datetime import datetime
    full = [
        (ok, ck, stt, price, datetime(2024, 1, 1), "1-URGENT")
        for ok, ck, stt, price in data
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        full,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")

    want = _brute_ntile_firstlast(
        [(ok, stt, price) for ok, _, stt, price in data]
    )
    assert _engine_ntile(spark, d, "win_ntile_firstlast_twostage") == want
    assert _engine_ntile(spark, d, "win_ntile_firstlast") == want

    specs = all_specs()
    assert (
        specs["win_ntile_firstlast"].oracle
        is specs["win_ntile_firstlast_twostage"].oracle
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),        # status id
            st.integers(min_value=0, max_value=2500_00),  # cents
        ),
        min_size=1,
        max_size=23,  # prime-ish: every n mod 4 residue is common
        unique_by=lambda t: t,
    )
)
def test_ntile_property_matches_brute(spark, tmp_path_factory, raw):
    from datetime import datetime

    st_name = {1: "O", 2: "F"}
    rows = [
        (i, st_name[s_], cents / 100.0) for i, (s_, cents) in enumerate(raw)
    ]
    full = [
        (ok, 1, stt, price, datetime(2024, 1, 1), "1-URGENT")
        for ok, stt, price in rows
    ]
    d = str(tmp_path_factory.mktemp("ntiletwo"))
    spark.createDataFrame(
        full,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    got = _engine_ntile(spark, d, "win_ntile_firstlast_twostage")
    assert got == _brute_ntile_firstlast(rows)
    assert got == _engine_ntile(spark, d, "win_ntile_firstlast")
