"""Pin the fixture invariants that oracle conventions silently rely on.

The repo-wide mod-bucket convention (quantiles.py, analytics8.py,
behavior.py, ...) pairs Spark ``F.pmod(id, k)`` with DuckDB ``id % k``.
The two agree ONLY for non-negative ids: pmod(-3, 4) = 1 but DuckDB
-3 % 4 = -3.  Rather than rewriting every oracle to
``((id % k) + k) % k``, this test makes the non-negativity of every
id column used in a mod-bucket a checked fact across all committed
scale factors — if a future fixture regeneration ever produces a
negative id, the convention breaks HERE, loudly, instead of as a
silent driver hash mismatch (ADVICE r9, analytics8.py:260).

Checked via DuckDB directly (no Spark session needed): this reads the
same parquet bytes both engines consume.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

#: (table, column) pairs that appear on the left of a mod-bucket in at
#: least one oracle/engine pair.  grep: "pmod" in operators/,
#: "% <k>" in oracle strings.
MOD_BUCKET_IDS = [
    ("events", "user_id"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
    ("orders", "o_orderkey"),
    ("orders", "o_custkey"),
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("lineitem", "l_linenumber"),
    ("customer", "c_custkey"),
]

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_mod_bucket_ids_nonnegative(sf_dir):
    con = duckdb.connect()
    bad = []
    for table, col in MOD_BUCKET_IDS:
        path = os.path.join(sf_dir, f"{table}.parquet")
        if not os.path.exists(path):
            continue
        mn = con.execute(
            f"SELECT min({col}) FROM read_parquet('{path}')"
        ).fetchone()[0]
        if mn is None or mn < 0:
            bad.append((table, col, mn))
    assert not bad, (
        "mod-bucket id columns must be non-negative for the "
        f"pmod <-> %% oracle convention to hold; violated: {bad}"
    )
