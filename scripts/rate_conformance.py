#!/usr/bin/env python
"""Rate-source streaming conformance arm (VERDICT r11 item 6).

The FileTopic / kafka-python feeds are conformance-tested in pytest,
but no run had exercised a LIVE micro-batch source end-to-end under
the streaming engine's own trigger + webhook machinery, across a
restart. This script does exactly that with Spark's built-in ``rate``
source (the broker stand-in Spark itself ships — a monotonically
increasing ``value`` column makes exactly-once VERIFIABLE, because
any loss is a gap and any replay is a duplicate):

run 1:  rate source → engine trigger (cron_to_trigger("@every 2s"))
        → parquet file sink with checkpoint (exactly-once via the
        sink commit log) + a second query posting per-epoch webhook
        summaries through the engine's run_foreach_webhook.
stop    (hard query stop mid-stream — the simulated crash).
run 2:  identical queries restarted from the SAME checkpoints.

Conformance asserted and recorded (scripts/rate_conformance.json):
- the sink's values are EXACTLY 0..max with zero gaps and zero
  duplicates ACROSS the restart boundary (rows == distinct == max+1);
- both runs produced epochs (the restart resumed, not restarted);
- checkpoint offset files advanced monotonically across runs;
- the webhook listener (its own lineage, LIVE processingTime trigger,
  killed and resumed with everything else) posted in both runs with
  UNIQUE, strictly increasing epoch ids — a replayed epoch would
  repeat an id, a reset lineage would restart at 0.

Usage: python scripts/rate_conformance.py [seconds_per_run]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _offsets_seen(ckpt: str) -> list[int]:
    return sorted(
        int(os.path.basename(p))
        for p in glob.glob(os.path.join(ckpt, "offsets", "*"))
        if os.path.basename(p).isdigit()
    )


def main() -> None:
    run_secs = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    from pyspark.sql import functions as F

    from clickhousebackup_spark.session import get_spark
    from clickhousebackup_spark.streaming.engine import (
        cron_to_trigger,
        run_foreach_webhook,
    )

    spark = get_spark("cbs-rate-conformance")
    root = tempfile.mkdtemp(prefix="cbs_rate_conf_")
    sink = os.path.join(root, "sink")
    ckpt_sink = os.path.join(root, "ckpt_sink")
    ckpt_hook = os.path.join(root, "ckpt_hook")
    posts: list[dict] = []

    trigger = cron_to_trigger("@every 2s")
    assert trigger == {"processingTime": "2 seconds"}, trigger

    def start_queries():
        src = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 500)
            .load()
            .select("timestamp", "value")
        )
        q_sink = (
            src.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt_sink)
            .trigger(**trigger)
            .start()
        )
        # the webhook listener rides ITS OWN lineage over the same
        # source (engine semantics: hooks observe the stream, they do
        # not gate the data path)
        hook_src = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 500)
            .load()
        )
        q_hook = run_foreach_webhook(
            hook_src.withColumn("b", F.lit(1)),
            posts.append,
            ckpt_hook,
            trigger=trigger,  # LIVE listener, same cadence as the sink
            block=False,      # must survive (and be killed by) the crash
        )
        return q_sink, q_hook

    report: dict = {"trigger": trigger, "runs": []}
    for run in (1, 2):
        q_sink, q_hook = start_queries()
        time.sleep(run_secs)
        q_sink.stop()
        q_hook.stop()
        q_sink.awaitTermination(30)
        q_hook.awaitTermination(30)
        offs = _offsets_seen(ckpt_sink)
        vals = spark.read.parquet(sink).agg(
            F.count("value").alias("rows"),
            F.countDistinct("value").alias("distinct_rows"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        ).collect()[0]
        report["runs"].append(
            {
                "run": run,
                "sink_epochs_so_far": len(offs),
                "last_offset_file": offs[-1] if offs else None,
                "rows": vals["rows"],
                "distinct_rows": vals["distinct_rows"],
                "vmin": vals["vmin"],
                "vmax": vals["vmax"],
                "webhook_posts_so_far": len(posts),
                "webhook_rows_so_far": sum(p["rows"] for p in posts),
            }
        )

    r1, r2 = report["runs"]
    report["conformance"] = {
        # exactly-once across the restart: contiguous 0..max, no dups
        "values_contiguous_across_restart": bool(
            r2["rows"] == r2["distinct_rows"] == r2["vmax"] + 1
            and r2["vmin"] == 0
        ),
        "run2_resumed_not_restarted": bool(
            r1["last_offset_file"] is not None
            and r2["last_offset_file"] is not None
            and r2["last_offset_file"] > r1["last_offset_file"]
            and (r2["vmax"] or -1) > (r1["vmax"] or -1)
        ),
        "both_runs_produced_epochs": bool(
            r1["sink_epochs_so_far"] >= 2
            and r2["sink_epochs_so_far"] > r1["sink_epochs_so_far"]
        ),
        "webhook_posted_both_runs": bool(
            0 < r1["webhook_posts_so_far"] < r2["webhook_posts_so_far"]
        ),
        # exactly-once per epoch-id within the hook lineage: epoch ids
        # strictly increase across the restart (a replayed epoch would
        # repeat an id; a reset lineage would restart at 0 with rows)
        "webhook_epochs_unique": bool(
            len({p["epoch"] for p in posts}) == len(posts)
        ),
        "webhook_epochs_monotonic": bool(
            all(
                a["epoch"] < b["epoch"]
                for a, b in zip(posts, posts[1:])
            )
        ),
        "webhook_sample": posts[: min(2, len(posts) - 1)] + posts[-1:],
    }
    report["ok"] = all(
        v for k, v in report["conformance"].items()
        if isinstance(v, bool)
    )
    print(json.dumps(report))
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
