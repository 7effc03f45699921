#!/usr/bin/env python
"""Run the full pytest tier as N concurrent process shards.

pytest-xdist is not in this image, so parallelism is process-level:
test FILES are packed into N shards (greedy LPT over the per-file
durations recorded by the previous run, falling back to file size),
and each shard runs its own pytest process with

- its own scratch cwd (/tmp/cbs_shard_<i>): Spark's metastore_db /
  derby.log / spark-warehouse are cwd-relative, so concurrent
  sessions never fight over the embedded-Derby boot lock (the XSDB6
  race NOTES.md documents);
- its own local[4] SparkSession (tests/conftest.py), so 4 shards use
  ~16 of the 32 cores plus DuckDB headroom;
- the per-process Derby JDBC scratch from sources/readers.py
  (pid-suffixed) for the sink_jdbc_roundtrip key.

Per-file durations are captured via --junitxml and written back to
tests/.shard_durations.json so the next run rebalances itself.

Usage:
    python scripts/run_test_shards.py           # 4 shards, full tier
    python scripts/run_test_shards.py 6         # 6 shards
    python scripts/run_test_shards.py 4 -m "not slow"   # quick tier

Exit code: number of failing shards.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time
import xml.etree.ElementTree as ET

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(REPO, "tests")
DUR_CACHE = os.path.join(TESTS, ".shard_durations.json")


def pack(files: list[str], n: int, dur: dict[str, float]) -> list[list[str]]:
    """Greedy longest-processing-time-first into n bins."""
    def cost(f: str) -> float:
        base = os.path.basename(f)
        if base in dur:
            return dur[base]
        return os.path.getsize(f) / 2000.0  # ~bytes->sec heuristic

    bins: list[tuple[float, list[str]]] = [(0.0, []) for _ in range(n)]
    for f in sorted(files, key=cost, reverse=True):
        i = min(range(n), key=lambda j: bins[j][0])
        bins[i] = (bins[i][0] + cost(f), bins[i][1] + [f])
    return [b[1] for b in bins if b[1]]


def main(argv: list[str]) -> int:
    n = int(argv[1]) if len(argv) > 1 and argv[1].isdigit() else 4
    extra = argv[2:] if len(argv) > 1 and argv[1].isdigit() else argv[1:]
    files = sorted(glob.glob(os.path.join(TESTS, "test_*.py")))
    dur: dict[str, float] = {}
    if os.path.exists(DUR_CACHE):
        with open(DUR_CACHE) as fh:
            dur = json.load(fh)
    shards = pack(files, n, dur)

    procs = []
    t0 = time.time()
    for i, shard in enumerate(shards):
        cwd = f"/tmp/cbs_shard_{i}"
        os.makedirs(cwd, exist_ok=True)
        xml_out = os.path.join(cwd, "junit.xml")
        env = dict(
            os.environ,
            PYTHONPATH=REPO,
            # per-shard scratch base: queries that materialize
            # intermediates (scratch.scratch_path) must not share
            # state-store/checkpoint dirs across concurrent processes
            CBS_SCRATCH_DIR=os.path.join(cwd, "scratch"),
        )
        cmd = [
            sys.executable, "-m", "pytest", "-q",
            "-c", os.path.join(REPO, "pytest.ini"),
            "--rootdir", REPO,
            "-p", "no:cacheprovider",
            f"--junitxml={xml_out}",
            *extra,
            *shard,
        ]
        log = open(os.path.join(cwd, "pytest.log"), "w")
        procs.append((i, subprocess.Popen(
            cmd, cwd=cwd, env=env, stdout=log, stderr=subprocess.STDOUT,
        ), xml_out, log))
        print(f"shard {i}: {len(shard)} files "
              f"({', '.join(os.path.basename(f) for f in shard[:4])}...)")

    failed = 0
    new_dur: dict[str, float] = dict(dur)
    totals = {"passed": 0, "failed": 0, "errors": 0, "skipped": 0}
    for i, p, xml_out, log in procs:
        rc = p.wait()
        log.close()
        status = "ok" if rc == 0 else f"EXIT {rc}"
        counts = ""
        if os.path.exists(xml_out):
            try:
                root = ET.parse(xml_out).getroot()
                suite = root if root.tag == "testsuite" else root[0]
                t = int(suite.get("tests", 0))
                e = int(suite.get("errors", 0))
                f_ = int(suite.get("failures", 0))
                s = int(suite.get("skipped", 0))
                totals["passed"] += t - e - f_ - s
                totals["failed"] += f_
                totals["errors"] += e
                totals["skipped"] += s
                counts = f" ({t} tests, {f_} fail, {e} err, {s} skip)"
                per_file: dict[str, float] = {}
                for case in suite.iter("testcase"):
                    # classname is a dotted module path, possibly with
                    # a trailing TestClass: pick the test_* module part
                    parts = (case.get("classname") or "").split(".")
                    mods = [p for p in parts if p.startswith("test_")]
                    if not mods:
                        continue
                    base = mods[0] + ".py"
                    per_file[base] = per_file.get(base, 0.0) + float(
                        case.get("time", 0)
                    )
                new_dur.update(per_file)
            except ET.ParseError:
                counts = " (junit parse failed)"
        print(f"shard {i}: {status}{counts} — log /tmp/cbs_shard_{i}/pytest.log")
        if rc != 0:
            failed += 1
    with open(DUR_CACHE, "w") as fh:
        json.dump(new_dur, fh, indent=0, sort_keys=True)
    print(
        f"TOTAL: {totals['passed']} passed, {totals['failed']} failed, "
        f"{totals['errors']} errors, {totals['skipped']} skipped "
        f"in {time.time()-t0:.0f}s across {len(shards)} shards"
    )
    return failed


if __name__ == "__main__":
    sys.exit(main(sys.argv))
