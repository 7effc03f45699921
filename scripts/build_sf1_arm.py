#!/usr/bin/env python
"""Build the emulated sf1 arm: 10x offset-key-block clones of every
SF-scaling fixture table (the round-13 sweep's construction, now a
committed tool instead of an ad-hoc session script).

Construction, per SF-scaling table: 10 copies unioned, with every
identifier column (PKs and the FKs that point at other SF-scaling
tables) offset by ``copy_i * 100_000_000`` so each copy is a
self-contained key block — uniqueness holds, joins stay linear
(copy i joins within copy i), and group-by keys like user_id keep
their per-copy zipf shape. Non-key payloads (values, prices,
timestamps, texts) are byte-identical clones, which is deliberate:
it makes per-group row counts 10x (the float-frontier stressor) and
keeps dedup/self-join keys honestly quadratic-in-clones — the
documented wall-per-output-row caveat for pair-output keys. The
constant-size dims (nation, region) copy through unchanged.

Usage:
    python scripts/build_sf1_arm.py [out_dir]     # default /tmp/cbs_sf1_arm
Then:
    CBS_SIM_SF_DIR=/tmp/cbs_sf1_arm python scripts/driver_sim.py \
        --shards=8 --emit-json=SWEEP_rN_sf1_slice.json
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from clickhousebackup_spark.session import get_spark  # noqa: E402

#: Identifier columns offset per copy (PKs + FKs between SF-scaling
#: tables). FKs into constant dims (c_nationkey, s_nationkey) stay.
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
CONSTANT_TABLES = ("region", "nation")
COPIES = 10
BLOCK = 100_000_000


def build(base_sf: str, out_dir: str, copies: int = COPIES) -> None:
    spark = get_spark()
    os.makedirs(out_dir, exist_ok=True)
    for t in CONSTANT_TABLES:
        df = spark.read.parquet(f"{base_sf}/{t}.parquet")
        df.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(f"{t}: {df.count()} rows (constant, copied)")
    for t, cols in OFFSET_COLS.items():
        df = spark.read.parquet(f"{base_sf}/{t}.parquet")
        clones = []
        for i in range(copies):
            c = df
            for col in cols:
                c = c.withColumn(col, F.col(col) + F.lit(i * BLOCK))
            clones.append(c)
        out = clones[0]
        for c in clones[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(f"{t}: {copies} offset-key copies written")


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "out_dir", nargs="?", default="/tmp/cbs_sf1_arm",
        help="output directory (default /tmp/cbs_sf1_arm)",
    )
    # --copies=N builds a larger clone arm with the same construction
    # (round 15 uses --copies=100 from sf0.1 for the sf10 arm: 60M
    # lineitem / 10M events; key blocks stay disjoint since
    # 100 * BLOCK = 1e10 << int64).
    p.add_argument("--copies", type=int, default=COPIES)
    args = p.parse_args()
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    build(base, args.out_dir, copies=args.copies)
    print("arm at", args.out_dir)
