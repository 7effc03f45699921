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
    "clickhousebackup_spark.operators.stats",
    "clickhousebackup_spark.operators.casts",
    "clickhousebackup_spark.operators.analytics",
    "clickhousebackup_spark.operators.analytics2",
    "clickhousebackup_spark.operators.analytics3",
    "clickhousebackup_spark.operators.analytics4",
    "clickhousebackup_spark.operators.analytics5",
    "clickhousebackup_spark.operators.analytics6",
    "clickhousebackup_spark.operators.analytics7",
    "clickhousebackup_spark.operators.analytics8",
    "clickhousebackup_spark.operators.analytics9",
    "clickhousebackup_spark.operators.analytics10",
    "clickhousebackup_spark.operators.analytics11",
    "clickhousebackup_spark.operators.analytics12",
    "clickhousebackup_spark.operators.analytics13",
    "clickhousebackup_spark.operators.analytics14",
    "clickhousebackup_spark.operators.analytics15",
    "clickhousebackup_spark.operators.analytics16",
    "clickhousebackup_spark.operators.analytics17",
    "clickhousebackup_spark.operators.analytics18",
    "clickhousebackup_spark.operators.analytics19",
    "clickhousebackup_spark.operators.sqlsurface",
    "clickhousebackup_spark.operators.behavior",
    "clickhousebackup_spark.operators.mergetree",
    "clickhousebackup_spark.operators.ch_query",
    "clickhousebackup_spark.operators.catalog_stats",
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
    "clickhousebackup_spark.streaming.stateful",
    "clickhousebackup_spark.backup.queries",
    "clickhousebackup_spark.extensions.dedup",
    "clickhousebackup_spark.extensions.similarity",
    "clickhousebackup_spark.extensions.linalg",
    "clickhousebackup_spark.extensions.text",
    "clickhousebackup_spark.extensions.multimodal",
    "clickhousebackup_spark.extensions.curation",
    "clickhousebackup_spark.extensions.training",
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
#: FIRST 50 keys of ``all_specs()`` per round. Cumulative driver state
#: after round 12 (union of CORRECTNESS_r01-r12, all twelve rounds
#: green): every registered oracled key carries a green driver row
#: except the 3 round-12 additions that overflowed the round-12
#: window (declared DEFERRED there; judge-sim exact-verified at three
#: scales meanwhile, PLANS_r12). The round-13 window below is that
#: 3-key DEFERRED queue, followed by 47 regression REFRESH refills —
#: the stalest green keys in the registry (latest driver row =
#: CORRECTNESS_r03/r04), chosen so the oldest evidence gets refreshed.
#: Keys listed here come first, in this order; any registered key not
#: listed follows in module registration order.
#: ``tests/test_rotation.py`` derives the required window mechanically
#: from the committed CORRECTNESS_r*.json files and fails if this
#: tuple ever goes stale; scripts/make_rotation.py emitted this block.
_CHECK_PRIORITY: tuple[str, ...] = (
    # -- round-13 window positions 0-2: the three round-12 additions
    # (two-stage sessionize/funnel rewrites + the adaptive sessionizer)
    # declared DEFERRED last round; now getting driver rows --
    "sessionize_gap_twostage",
    "funnel_steps_twostage",
    "sessionize_gap_adaptive",
    # -- 47 regression REFRESH refills (window slots 3-49): stalest
    # green keys (latest driver row = r3/r4), emitted by
    # scripts/make_rotation.py; see tests/test_rotation.py REFRESH --
    "udtf_explode_props",
    "udtf_python_native",
    "union_by_name_evolved",
    "agg_ema",
    "agg_histogram",
    "agg_mode",
    "agg_topk_freq",
    "agg_weighted_avg",
    "bit_funcs",
    "contamination_overlap",
    "corpus_token_budget",
    "curation_keep_set",
    "emb_normalize_quantize",
    "funnel_steps",
    "join_asof_forward",
    "multimodal_dedup",
    "path_transitions",
    "posexplode_words",
    "q11_important_parts",
    "q12_priority_lines",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_parts_suppliers",
    "q17_small_quantity",
    "q18_large_orders",
    "q19_discounted_revenue",
    "q1_pricing_summary",
    "q20_part_promotion",
    "q21_waiting_suppliers",
    "q22_global_sales",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "retention_cohort",
    "sample_stratified",
    "sink_json_roundtrip",
    "stream_stream_join",
    "text_pii_mask",
    "text_repetition_score",
    "win_range_frame",
    "agg_combinators",
    "agg_skew_kurtosis",
    "agg_topk_weighted",
    # -- round-13 additions: past the 50-slot window, DEFERRED to
    # lead the round-14 queue (tests/test_rotation.py DEFERRED) --
    "q1_pricing_summary_grid",
    "path_transitions_twostage",
    "win_running_sum_twostage",
    "topk_per_group_twostage",
    "win_rank_dense_twostage",
    "agg_percentile_exact_twostage",
    "win_sliding_avg_twostage",
    "stats_moments_grid",
    "win_sliding_avg_adaptive",
    "curation_percentile_gate_twostage",
    "win_ntile_firstlast_twostage",
    "win_cume_dist_nth_twostage",
    "ts_nonneg_derivative_twostage",
)


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
