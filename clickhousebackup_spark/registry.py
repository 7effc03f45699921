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
#: after round 6 (union of CORRECTNESS_r01–r06): 290 keys have driver
#: rows, all green at their latest check. The round-7 window below is
#: (a) the 2 legacy keys whose round-6 de-vacuization changed their
#: semantics, so their old green rows are stale — ``dedup_embedding_
#: cosine`` (τ 0.99→0.4) and ``part_trigram_search`` (query
#: steel→gizmo) — then (b) the 46 round-6 additions still lacking a
#: driver row (``source_numbers_range`` deferred, see below), then
#: (c) the 2 rows-only→oracled conversions whose exact-oracle path
#: has never been driver-checked. 2+46+2 = 50 slots exactly;
#: ``source_numbers_range`` sits at position 51 so it leads the
#: round-8 window automatically. Keys listed here come first, in this
#: order; any registered key not listed follows in module
#: registration order. ``tests/test_rotation.py`` derives the
#: required window mechanically from the committed CORRECTNESS_r*.json
#: files and fails if this tuple ever goes stale — rotation is no
#: longer a manual last-minute step.
_CHECK_PRIORITY: tuple[str, ...] = (
    # -- (a) round-6 de-vacuized legacy keys (old green rows vacuous) --
    "dedup_embedding_cosine",
    "part_trigram_search",
    # -- (b) round-6 additions, no driver row yet --
    "sessionize_gap",
    "seq_rle_encode",
    "ts_seasonality_profile",
    "stats_chi2_cells",
    "cohort_revenue_ltv",
    "array_enumerate_dense",
    "str_format_readable",
    "corpus_dup_ngrams",
    "corpus_length_histogram",
    "corpus_dsir_features",
    "token_fertility_stats",
    "text_c4_gates",
    "dedup_incremental",
    "emb_pq_codes",
    "sim_range_search",
    "merge_graphite_rollup",
    "mergetree_ttl_expire",
    "stream_windowed_topk",
    "map_higher_order",
    "scan_schema_merge",
    "geo_grid_bbox_join",
    "geo_point_in_polygon",
    "curation_percentile_gate",
    "decontam_span_stats",
    "dedup_threshold_sweep",
    "backup_pit_select",
    "backup_manifest_diff",
    "ip_cidr_join",
    "emb_binary_quantize",
    "dedup_keep_best",
    "topk_with_others",
    "dq_volume_anomaly",
    "merge_replacing_deleted",
    "join_asof_nearest",
    "text_langid_confusion",
    "audience_overlap_jaccard",
    "orders_interarrival_hist",
    "scan_csv_malformed",
    "agg_time_decay_halflife",
    "dedup_source_matrix",
    "session_type_affinity",
    "funnel_strict_order",
    "orders_mix_shift",
    "text_boilerplate_prefix",
    "text_inverted_index",
    "backup_restore_chain",
    # -- (c) rows-only→oracled conversions (oracle path unchecked) --
    "dedup_clusters",
    "dedup_clusters_neardup",
    # -- positions 51+: round-8 window head — source_numbers_range
    # (deferred from r7) then the round-7 additions, in registration
    # order. tests/test_rotation.py asserts this tail stays in sync.
    "source_numbers_range",
    "multimodal_payload_export",
    "ts_ohlc_bars",
    "ts_vwap",
    "user_churn_flags",
    "attribution_last_touch",
    "sequence_match_timed",
    "limit_by_offset",
    "stats_wilson_ci",
    "stats_cohens_d",
    "sql_pipe_syntax",
    "sql_parameterized",
    "func_try_arith",
    "json_variant_ops",
    "join_hint_merge",
    "scan_observed_metrics",
    "scan_json_malformed",
    "sink_partitioned_overwrite",
    "scan_recursive_glob",
    "sink_parquet_codecs",
    "stream_stateful_totals",
    "join_lateral_topn",
    "sql_group_order_by_all",
    "sql_qualify_topk",
    "sql_select_modifiers",
    "agg_filter_where",
    "orderby_with_fill",
    "corpus_global_shuffle",
    "text_ngram_novelty",
    "corpus_upsample_repeat",
    "scan_text_lines",
    "scan_binary_files",
    "scan_xml_source",
    "sim_pq_adc_topk",
    "backup_dedup_savings",
    "quantile_exact_weighted_grid",
    "win_first_last_ignore_nulls",
    "agg_combinators_array",
    "sql_recursive_cte",
    "win_range_interval_frame",
    "func_datetime64_precision",
    # re-enter after the round-7 degeneracy audit staled their green
    # rows: absent search needles (str_multisearch), everyone-converts
    # zero-variance z (stats_proportions_ztest), everyone-in-both-sets
    # zero XOR (bitmap_set_ops) — all rebuilt on deterministic
    # qualifying subsets so the evidence columns actually fire
    "str_multisearch",
    "stats_proportions_ztest",
    "bitmap_set_ops",
    "dq_expectations",
    "dedup_minhash_estimate_vs_truth",
    "emb_mrl_overlap_curve",
    "text_dedup_span_removal",
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
