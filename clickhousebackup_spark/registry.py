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
    "clickhousebackup_spark.backup.queries",
    "clickhousebackup_spark.extensions.dedup",
    "clickhousebackup_spark.extensions.similarity",
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
#: FIRST 50 keys of ``all_specs()`` per round. Rounds 1–3 verified 148
#: distinct keys (CORRECTNESS_r01 ∪ r02 ∪ r03, 0 failures). 67 keys
#: lack rows (47 oracled round-3b keys + agg_hll_merge + 19 round-4
#: additions) — more than one 50-window, so the round-4 window holds
#: the 47 r3b oracled keys plus the first 3 round-4 keys; the
#: remaining 16 round-4 keys and agg_hll_merge (rows-only by design —
#: its driver row is the weakest check, so it yields its slot to
#: oracled keys) queue for the round-5 window. All 67 are
#: driver-SIMULATED green (vanilla session, non-repo cwd, sf0.01,
#: exact value compare). Keys listed here come first, in this order;
#: any registered key not listed follows in module registration order.
_CHECK_PRIORITY: tuple[str, ...] = (
    # -- round-3b additions with no CORRECTNESS row yet (48) --
    # MergeTree-semantics family
    "merge_collapsing_final",
    "merge_aggregating_shards",
    "mv_incremental_refresh",
    "agg_combinators",
    "agg_sum_map",
    "rollup_time_hierarchy",
    "dict_encode_lowcard",
    # behavior / analytics
    "sequence_count_pairs",
    "graph_pagerank",
    "events_anomaly_zscore",
    "user_active_streaks",
    "orders_rfm_segments",
    "agg_topk_weighted",
    "bitmap_set_ops",
    "orders_market_basket",
    "part_trigram_search",
    "skyline_orders",
    # statistics family
    "agg_skew_kurtosis",
    "stats_welch_ttest",
    "stats_mannwhitney_u",
    "stats_cramers_v",
    # function families
    "url_funcs",
    "ip_funcs",
    "geo_geohash",
    "encode_funcs",
    "array_cumsum",
    "array_difference",
    "date_fill_forward",
    "date_fill_interpolate",
    "win_moving_median",
    # LLM-pipeline / text / curation
    "text_chunk_passages",
    "text_rarity_score",
    "text_top_terms",
    "quality_linear_score",
    "corpus_mix_plan",
    "dedup_passage",
    "dedup_url_normalize",
    "sim_knn_join",
    # multimodal (REAL decode paths)
    "multimodal_decode_stats",
    "audio_fft_dominant",
    "image_channel_stats",
    # infrastructure / scale / sinks
    "zorder_layout",
    "compaction_plan",
    "backup_verify_integrity",
    "topic_roundtrip",
    "sink_jdbc_roundtrip",
    "sink_orc_roundtrip",
    # -- round-4 additions (first 3 fit the round-4 window; the rest
    #    queue for round 5, ahead of rows-only agg_hll_merge) --
    "join_null_safe",
    "win_cume_dist_nth",
    "sink_bucketed_sorted",
    "stats_spearman",
    "stats_linregress",
    "agg_gini_diversity",
    "ts_autocorr_lag1",
    "merge_replacing_final",
    "merge_summing_final",
    "dict_get_join",
    "limit_by",
    "with_totals",
    "agg_argminmax",
    "table_column_stats",
    "geo_cell_radius_join",
    "corpus_pack_sequences",
    "text_ngram_lm_score",
    "dedup_semantic",
    "text_cdc_chunks",
    "agg_hll_merge",
)
# Round-5 rotation note: the round-4 window ends at
# sink_bucketed_sorted (key #50). Rotate the 17 deferred keys above
# (stats_spearman .. agg_hll_merge) to the front for round 5, plus
# any new round-4b/5 keys; keep everything driver-SIMULATED green per
# .claude/skills/verify/SKILL.md before relying on the rotation.


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
