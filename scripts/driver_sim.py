"""Local stand-in for the verification driver: run every registered
query AND its DuckDB oracle at a given scale factor in a VANILLA
SparkSession (no repo session tuning), compare exactly with the
type-faithful harness from tests/compare.py, and print one line per
key. This is the pre-flight the round-5/6/7 gates ran ad hoc; now a
committed tool.

Usage:
    python scripts/driver_sim.py                    # all keys, sf0.01
    python scripts/driver_sim.py key1 key2 ...      # subset
    python scripts/driver_sim.py --window           # first-50 window only
    python scripts/driver_sim.py --new              # keys with no driver row
    python scripts/driver_sim.py --emit-json=SWEEP_r10.json  # artifact
    python scripts/driver_sim.py --shards=4 --emit-json=...   # parallel
    CBS_SIM_SF_DIR=/root/testdata/sf0.001 python scripts/driver_sim.py

``--emit-json=PATH`` writes one JSON object per key — ``{key: {"sf":
dir, "match": "pass"|"rows-only"|"FAIL ...", "rows": n|null, "wall":
sec}}`` — so a full-registry sweep is a committed, diffable artifact
(SWEEP_r{N}.json) instead of a prose claim in NOTES.md.

Exit code = number of failing keys (capped at 120).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import tempfile
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from clickhousebackup_spark.registry import all_specs  # noqa: E402
from clickhousebackup_spark.tables import TABLES  # noqa: E402
from tests.compare import assert_same_result, fast_collect  # noqa: E402

SF_DIR = os.environ.get("CBS_SIM_SF_DIR", "/root/testdata/sf0.01")

#: Bounded-slice compare registry (CBS_SIM_BOUNDED=1, the sf1-arm
#: mode): for keys whose EXACT COMPARE — not the engine plan — is
#: infeasible at the 10x clone arms, the engine's FULL output is
#: filtered to a deterministic query slice and compared exactly
#: against a slice-restricted oracle (restricting the probe/query
#: side keeps every candidate, so sliced rows equal the full result's
#: rows for those queries). The full engine row count is recorded in
#: the status line for accounting. Each entry lives next to its key
#: (reviewed there); tests/test_sweep_artifacts.py allows the
#: resulting status only for these enumerated keys. This mechanism
#: closed the round-13 sf1 exclusions (VERDICT r13 item 6).
def _bounded_slice() -> dict:
    from clickhousebackup_spark.extensions.dedup import (
        DEDUP_CONTAINMENT_BOUNDED,
        DEDUP_EMBEDDING_COSINE_BOUNDED,
        DEDUP_MINHASH_BOUNDED,
        DEDUP_NGRAM_JACCARD_BOUNDED,
        DEDUP_SIMHASH_BOUNDED,
    )
    from clickhousebackup_spark.extensions.recall import (
        SKETCH_RECALL_PROBE_BOUNDED,
    )
    from clickhousebackup_spark.extensions.similarity import (
        SIM_KNN_JOIN_BOUNDED,
    )
    from clickhousebackup_spark.operators.analytics2 import (
        DEDUP_FUZZY_BLOCKED_BOUNDED,
    )
    from clickhousebackup_spark.operators.analytics4 import (
        JOIN_INTERVAL_OVERLAP_BOUNDED,
    )

    return {
        "sim_knn_join": SIM_KNN_JOIN_BOUNDED,
        "join_interval_overlap": JOIN_INTERVAL_OVERLAP_BOUNDED,
        "dedup_minhash": DEDUP_MINHASH_BOUNDED,
        # round 16: the four exact-baseline long-poles self-bound past
        # their scale caps (VERDICT r15 item 1) — each spec lives next
        # to its key and is reviewed there.
        "dedup_ngram_jaccard": DEDUP_NGRAM_JACCARD_BOUNDED,
        "dedup_containment": DEDUP_CONTAINMENT_BOUNDED,
        "dedup_embedding_cosine": DEDUP_EMBEDDING_COSINE_BOUNDED,
        "dedup_fuzzy_blocked": DEDUP_FUZZY_BLOCKED_BOUNDED,
        # round 16 late add: simhash's pair OUTPUT is clone-quadratic
        # at the arms (the compare collect, not the engine, is the
        # bound) — same a-side slice as dedup_minhash.
        "dedup_simhash": DEDUP_SIMHASH_BOUNDED,
        # round 16: sketch_recall_probe gained a composed exact oracle
        # (rows-only debt retired); at arm scale its pair truth
        # self-bounds, so the arm compare slices the oracle's
        # pair_truth CTE identically.
        "sketch_recall_probe": SKETCH_RECALL_PROBE_BOUNDED,
    }



def _latest_driver_rows() -> dict[str, dict]:
    rows: dict[str, dict] = {}
    for path in sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    ):
        with open(path) as fh:
            rows.update(json.load(fh))
    return rows


def _main_sharded(argv: list[str], keys: list[str], n: int) -> int:
    """Run the key list as ``n`` concurrent child driver_sim processes
    (round-robin split — adjacent slow families spread out), each with
    its own scratch dir and per-shard emit file, then merge. Same
    vanilla-session semantics per child; ~n× faster full sweeps."""
    import subprocess
    import tempfile

    emit_path = None
    for a in argv:
        if a.startswith("--emit-json"):
            emit_path = a.split("=", 1)[1] if "=" in a else "SWEEP.json"
    procs = []
    t0 = time.time()
    for i in range(n):
        shard_keys = keys[i::n]
        if not shard_keys:
            continue
        out = os.path.join(
            tempfile.gettempdir(), f"cbs_sim_shard_{os.getpid()}_{i}.json"
        )
        env = dict(
            os.environ,
            CBS_SCRATCH_DIR=os.path.join(
                tempfile.gettempdir(), f"cbs_sim_scratch_{os.getpid()}_{i}"
            ),
        )
        passthrough = [
            a for a in argv
            if a.startswith("--master=") or a == "--trace"
        ]
        cmd = [
            sys.executable, os.path.abspath(__file__),
            f"--emit-json={out}", *passthrough, *shard_keys,
        ]
        log = open(out + ".log", "w")
        procs.append(
            (i, subprocess.Popen(
                cmd, env=env, stdout=log, stderr=subprocess.STDOUT
            ), out, log, len(shard_keys))
        )
        print(f"shard {i}: {len(shard_keys)} keys")
    merged: dict[str, dict] = {}
    failed = 0
    for i, p, out, log, n_keys in procs:
        rc = p.wait()
        log.close()
        failed += rc
        if os.path.exists(out):
            with open(out) as fh:
                merged.update(json.load(fh))
        print(f"shard {i}: exit {rc} — log {out}.log")
    bad = sorted(
        k for k, v in merged.items()
        if not v["match"].startswith("pass")  # incl. bounded-slice
        and not v["match"].startswith("rows-only")
        and not v["match"].startswith("env-gated")
    )
    print(
        f"\n{len(merged) - len(bad)}/{len(keys)} pass in "
        f"{time.time()-t0:.0f}s at {SF_DIR} across {len(procs)} shards"
        + (f"; FAILED: {bad}" if bad else "")
    )
    if emit_path:
        with open(emit_path, "w") as fh:
            json.dump(merged, fh, indent=1, sort_keys=True)
        print(f"wrote {emit_path} ({len(merged)} keys)")
    return min(failed, 120)


def main(argv: list[str]) -> int:
    specs = all_specs()
    keys = [a for a in argv if not a.startswith("--")]
    if "--window" in argv:
        keys = list(specs)[:50]
    elif "--new" in argv:
        seen = _latest_driver_rows()
        keys = [k for k in specs if k not in seen]
    elif not keys:
        keys = list(specs)
    unknown = [k for k in keys if k not in specs]
    if unknown:
        print(f"unknown keys: {unknown}")
        return 2
    for a in argv:
        if a.startswith("--shards"):
            return _main_sharded(argv, keys, int(a.split("=", 1)[1]))

    # Vanilla session — mirrors the driver/judge environment, NOT the
    # tuned session from clickhousebackup_spark.session. ``--master=``
    # overrides for multi-executor evidence runs: e.g.
    # ``--master=local-cluster[2,2,1024]`` spawns 2 real worker JVMs
    # (separate heaps, real network shuffle, serialized broadcasts) —
    # the closest no-infra stand-in for a distributed deployment
    # (VERDICT r10 item 3).
    master = "local[8]"
    for a in argv:
        if a.startswith("--master="):
            master = a.split("=", 1)[1]
    builder = (
        SparkSession.builder.master(master)
        # sf1-scale arms collect multi-million-row results on both
        # sides of the compare; the 1g default driver heap loses task
        # results (TaskResultLost). Vanilla-session semantics are
        # unchanged — this is sim-harness capacity, not engine tuning.
        # maxResultSize tracks the SAME knob so a smaller configured
        # heap keeps Spark's graceful result-size guard meaningful
        # instead of OOM-killing the driver mid-sweep.
        .config("spark.driver.memory",
                os.environ.get("CBS_SIM_DRIVER_MEM", "4g"))
        .config("spark.driver.maxResultSize",
                os.environ.get("CBS_SIM_DRIVER_MEM", "4g"))
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
    )
    if master.startswith("local-cluster"):
        # executor JVMs spawn their Python workers outside the repo
        # cwd; the package must be importable there for cloudpickled
        # closures that reference it to deserialize
        builder = builder.config("spark.executorEnv.PYTHONPATH", REPO)
    spark = builder.getOrCreate()
    con = duckdb.connect()
    # Arm-scale oracles (events/lineitem window functions at 10-60M
    # rows) peak 25-28 GB of DuckDB state (NOTES r15 trap). An
    # in-memory connection has no temp directory, so those peaks are
    # hard OOMs; giving it one lets DuckDB spill and bounds resident
    # memory instead (CBS_SIM_DUCK_MEM, e.g. "16GB", enables both).
    duck_mem = os.environ.get("CBS_SIM_DUCK_MEM")
    if duck_mem:
        tmp = os.path.join(
            tempfile.gettempdir(), f"cbs_duck_spill_{os.getpid()}"
        )
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory = '{tmp}'")
        con.execute(f"SET memory_limit = '{duck_mem}'")
    for t in TABLES:
        # fixture tables are single files; probe-built scale dirs
        # (e.g. the sf1 arms under /tmp) are Spark-written DIRECTORIES
        # of part files — glob those so the same sim runs at any scale
        p = f"{SF_DIR}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )

    emit_path = None
    for a in argv:
        if a.startswith("--emit-json"):
            emit_path = a.split("=", 1)[1] if "=" in a else "SWEEP.json"
    sweep: dict[str, dict] = {}

    failed: list[str] = []
    t_all = time.time()
    for i, key in enumerate(keys, 1):
        spec = specs[key]
        t0 = time.time()
        rows = None
        # engine_wall = plan build + Spark execution (collect/count);
        # oracle_wall = DuckDB execution + the exact compare. Split so
        # a quadratic ORACLE (dedup_ngram_jaccard's all-pairs truth at
        # sf0.1) can't masquerade as an engine-side scale regression
        # in the committed sweep artifacts (VERDICT r10 item 2).
        engine_wall = oracle_wall = None
        bounded = (
            os.environ.get("CBS_SIM_BOUNDED") == "1"
            and key in _bounded_slice()
        )
        # Per-key watchdog (CBS_SIM_KEY_TIMEOUT seconds, 0/unset = off):
        # at the clone arms a single oracle whose cost class is
        # quadratic in rows can spill DuckDB state to disk without
        # bound (dedup_clusters_neardup's recursive CTE over 500k docs
        # wrote 59 GB before the round-16 sf10 sweep was killed by
        # hand — and the full disk then failed three UNRELATED keys'
        # engine spills). The watchdog interrupts the DuckDB
        # connection AND cancels the key's Spark job group, records a
        # loud `excluded (key timeout...)` row, and moves on — one
        # runaway can no longer take the box (or the artifact) down.
        timeout_s = float(os.environ.get("CBS_SIM_KEY_TIMEOUT", "0") or 0)
        timed_out = [False]
        timer = None
        if timeout_s > 0:
            import threading

            spark.sparkContext.setJobGroup(key, f"driver_sim {key}", True)

            def _fire(k=key, flag=timed_out):
                flag[0] = True
                try:
                    con.interrupt()
                except Exception:
                    pass
                try:
                    spark.sparkContext.cancelJobGroup(k)
                except Exception:
                    pass

            timer = threading.Timer(timeout_s, _fire)
            timer.daemon = True
            timer.start()
        try:
            df = spec.fn(spark, SF_DIR)
            if bounded:
                b = _bounded_slice()[key]
                if "oracle_sql" not in b:
                    # entry derives its sliced oracle from the
                    # registered text (one source of truth)
                    frm, to = b["oracle_replace"]
                    assert frm in spec.oracle, key
                    b = dict(b, oracle_sql=spec.oracle.replace(frm, to))
                # engine_filter is idempotent when the key self-bounds
                # past its scale cap (sim_knn_join past
                # EXACT_KNN_ROWS_CAP computes exactly this slice); no
                # separate full count — that extra pass re-ran the
                # whole plan just for accounting.
                sliced = df.filter(b["engine_filter"])
                # fast_collect: Arrow transport, cell-identical to collect()
                # (tests/test_optimizations_r17.py pins the equivalence);
                # engine_wall keeps the same meaning — plan + execution —
                # minus pickled-Row transport overhead
                raw_rows = fast_collect(sliced)
                engine_wall = time.time() - t0
                t1 = time.time()
                assert_same_result(
                    sliced, con, b["oracle_sql"], name=key,
                    raw_rows=raw_rows,
                )
                oracle_wall = time.time() - t1
                rows = len(raw_rows)
                status = (
                    f"pass (bounded-slice: {b['engine_filter']}; "
                    f"sliced_rows={rows})"
                )
            elif spec.oracle is None:
                rows = df.count()
                engine_wall = time.time() - t0
                status = f"rows-only ({rows} rows)"
                if rows == 0:
                    status += " [WARN 0 rows]"
            else:
                raw_rows = fast_collect(df)
                engine_wall = time.time() - t0
                t1 = time.time()
                assert_same_result(
                    df, con, spec.oracle, name=key, raw_rows=raw_rows
                )
                oracle_wall = time.time() - t1
                status = "pass"
        except Exception as e:  # noqa: BLE001
            from clickhousebackup_spark.sources.readers import (
                ConnectorUnavailable,
            )

            if timed_out[0]:
                # Watchdog row: the allowed `excluded` status class —
                # a named, per-arm infeasibility record, never a
                # silent pass and never a FAIL that would trip the
                # artifact tripwire for an understood cost-class bound.
                status = (
                    f"excluded (key timeout: wall exceeded "
                    f"{timeout_s:.0f}s at {SF_DIR}; DuckDB interrupted"
                    f" + Spark job group cancelled)"
                )
                print(f"[{i}/{len(keys)}] {key}: {status} "
                      f"({time.time()-t0:.1f}s)")
                sweep[key] = {
                    "sf": SF_DIR,
                    "match": status,
                    "rows": rows,
                    "wall": round(time.time() - t0, 2),
                    "engine_wall": round(engine_wall, 2)
                    if engine_wall else None,
                    "oracle_wall": None,
                }
                if emit_path:
                    with open(emit_path + ".partial", "w") as fh:
                        json.dump(sweep, fh, indent=1, sort_keys=True)
                continue
            if isinstance(e, ConnectorUnavailable):
                # loud environment gate (same contract as the Delta/
                # Iceberg two-armed gates): the key's backend cannot
                # serve this deployment shape — recorded, not a FAIL
                status = f"env-gated ({e})"
                print(f"[{i}/{len(keys)}] {key}: env-gated "
                      f"({time.time()-t0:.1f}s)")
                sweep[key] = {
                    "sf": SF_DIR,
                    "match": status,
                    "rows": rows,
                    "wall": round(time.time() - t0, 2),
                    "engine_wall": None,
                    "oracle_wall": None,
                }
                continue
            status = f"FAIL {type(e).__name__}"
            failed.append(key)
            tb = traceback.format_exc(limit=20)
            print(f"[{i}/{len(keys)}] {key}: {status} ({time.time()-t0:.1f}s)")
            print("\n".join("    " + ln for ln in str(e).splitlines()[:8]))
            if "--trace" in argv:
                print(tb)
            sweep[key] = {
                "sf": SF_DIR,
                "match": status,
                "rows": rows,
                "wall": round(time.time() - t0, 2),
                "engine_wall": round(engine_wall, 2) if engine_wall else None,
                "oracle_wall": round(oracle_wall, 2) if oracle_wall else None,
            }
            continue
        finally:
            if timer is not None:
                timer.cancel()
        print(f"[{i}/{len(keys)}] {key}: {status} ({time.time()-t0:.1f}s)")
        sweep[key] = {
            "sf": SF_DIR,
            "match": status if status.startswith("pass (bounded-slice")
            else ("rows-only" if spec.oracle is None else "pass"),
            "rows": rows,
            "wall": round(time.time() - t0, 2),
            "engine_wall": round(engine_wall, 2),
            "oracle_wall": round(oracle_wall, 2)
            if oracle_wall is not None
            else None,
        }
        if emit_path:
            # incremental checkpoint: arm-scale keys can run for an
            # hour each, and a shard killed (or OOM-killed) mid-key
            # used to lose EVERY completed row (the round-16 sf10
            # lesson). The .partial file makes completed work
            # harvestable at any instant; the final write below stays
            # the authoritative artifact.
            with open(emit_path + ".partial", "w") as fh:
                json.dump(sweep, fh, indent=1, sort_keys=True)
    print(
        f"\n{len(keys) - len(failed)}/{len(keys)} pass in "
        f"{time.time()-t_all:.0f}s at {SF_DIR}"
        + (f"; FAILED: {sorted(failed)}" if failed else "")
    )
    if emit_path:
        with open(emit_path, "w") as fh:
            json.dump(sweep, fh, indent=1, sort_keys=True)
        print(f"wrote {emit_path} ({len(sweep)} keys)")
    spark.stop()
    return min(len(failed), 120)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
