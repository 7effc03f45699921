"""Operator registry — the bridge between the engine package and the
driver contract (``__spark_entry__.py``).

Every operator from SURVEY.md §2 Part B registers itself here with a
callable ``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible)
the equivalent DuckDB oracle SQL. The driver hash-matches the pair at
sf0.01; our pytest harness does the same at sf0.001.

Hash-stability conventions every registered query follows:

- every computed column carries an explicit, matching alias;
- double aggregation goes through exact decimal: ``CAST(SUM(CAST(x AS
  DECIMAL(38,6))) AS DOUBLE)`` — decimal sums are order-independent
  (Spark's double sum is partition-order nondeterministic) and the
  final decimal→double cast is IEEE-identical in both engines; avgs
  are expressed as that sum divided by a count (identical double
  division both sides) rather than engine-native AVG;
- array folds (norms, dot products) run left-to-right over the array
  in both engines, so double results are bit-identical;
- anything that keeps "one row of several" (top-k, keep-newest,
  dedup) carries a total-order tiebreak.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

#: Modules that register operators on import (SURVEY.md §2 Part B groups).
_OPERATOR_MODULES = (
    "clickhousebackup_spark.operators.scans",
    "clickhousebackup_spark.operators.filters",
    "clickhousebackup_spark.operators.joins",
    "clickhousebackup_spark.operators.aggregates",
    "clickhousebackup_spark.operators.windows",
    "clickhousebackup_spark.operators.sorts",
    "clickhousebackup_spark.operators.setops",
    "clickhousebackup_spark.operators.reshape",
    "clickhousebackup_spark.operators.scale_patterns",
    "clickhousebackup_spark.operators.quantiles",
    "clickhousebackup_spark.operators.casts",
    "clickhousebackup_spark.operators.analytics",
    "clickhousebackup_spark.operators.analytics2",
    "clickhousebackup_spark.operators.behavior",
    "clickhousebackup_spark.operators.mergetree",
    "clickhousebackup_spark.functions.strings",
    "clickhousebackup_spark.functions.dates",
    "clickhousebackup_spark.functions.maths",
    "clickhousebackup_spark.functions.arrays",
    "clickhousebackup_spark.functions.maps_json",
    "clickhousebackup_spark.functions.hashes",
    "clickhousebackup_spark.functions.web",
    "clickhousebackup_spark.functions.geo",
    "clickhousebackup_spark.functions.udfs",
    "clickhousebackup_spark.streaming.batch_equiv",
    "clickhousebackup_spark.streaming.topic",
    "clickhousebackup_spark.backup.queries",
    "clickhousebackup_spark.extensions.dedup",
    "clickhousebackup_spark.extensions.similarity",
    "clickhousebackup_spark.extensions.text",
    "clickhousebackup_spark.extensions.multimodal",
    "clickhousebackup_spark.extensions.curation",
    "clickhousebackup_spark.extensions.recall",
    "clickhousebackup_spark.sources.readers",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


#: Explicit key ordering for the verification driver, which checks the
#: FIRST 50 keys of ``all_specs()`` per round. Rounds 1+2 verified 98
#: keys (CORRECTNESS_r01 ∪ r02, 0 failures); round 3's window holds
#: the 33 keys never yet checked (round-2 additions + the rows-only
#: keys deferred from round 2) plus the 17 new round-3 keys — exactly
#: 50, closing out the whole registry. Keys listed here come first, in
#: this order; any registered key not listed follows in module
#: registration order.
_CHECK_PRIORITY: tuple[str, ...] = (
    # -- round-2 additions with no CORRECTNESS row yet (26) --
    "sink_json_roundtrip",
    "join_asof_forward",
    "win_range_frame",
    "agg_mode",
    "q18_large_orders",
    "q6_forecast_revenue",
    "q12_priority_lines",
    "funnel_steps",
    "retention_cohort",
    "agg_topk_freq",
    "agg_histogram",
    "path_transitions",
    "agg_ema",
    "agg_weighted_avg",
    "bit_funcs",
    "stream_stream_join",
    "dedup_clusters_neardup",
    "emb_kmeans",
    "emb_normalize_quantize",
    "text_pii_mask",
    "multimodal_dedup",
    "text_repetition_score",
    "contamination_overlap",
    "sample_stratified",
    "corpus_token_budget",
    "curation_keep_set",
    # -- rows-only keys deferred from round 2 (7) --
    "posexplode_words",
    "dedup_simhash",
    "dedup_clusters",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "text_fingerprint",
    "multimodal_features",
    # -- round-3 additions (17): TPC-H suite completion + the sketch
    #    recall probe --
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_parts_suppliers",
    "q17_small_quantity",
    "q19_discounted_revenue",
    "q20_part_promotion",
    "q21_waiting_suppliers",
    "q22_global_sales",
    "sketch_recall_probe",
)
# Round-4 rotation queue: after CORRECTNESS_r03, 148 of the registry's
# keys will have driver rows (98 from r1∪r2 + the 50 above). The keys
# registered AFTER the priority list — the round-3b additions, in
# module registration order (mergetree/behavior/web/geo/text/curation/
# scale_patterns/windows/arrays/hashes/streaming.topic/backup/
# multimodal families) — have no driver row yet; round 4 should move
# them into this list (they number ~40; fill the window with the
# most recently added first, re-confirming green keys as space allows). All of
# them pass tests/test_oracle_parity.py at sf0.001 AND sf0.01 plus the
# rerun-stability sweep (tests/test_determinism_r3.py) locally.


def _load_all() -> None:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    prio = {k: i for i, k in enumerate(_CHECK_PRIORITY)}
    reg_pos = {k: i for i, k in enumerate(_REGISTRY)}
    ordered = sorted(
        _REGISTRY,
        key=lambda k: (prio.get(k, len(prio)), reg_pos[k]),
    )
    return {k: _REGISTRY[k] for k in ordered}


def get_spec(name: str) -> QuerySpec:
    _load_all()
    return _REGISTRY[name]
