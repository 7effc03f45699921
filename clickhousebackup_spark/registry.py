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
#: after round 8 (union of CORRECTNESS_r01-r08): 372 keys carry green
#: driver rows at their latest check (CORRECTNESS_r08 was 50/50 full
#: pass). The round-9 window below is the 29-key queue pinned at
#: positions 51+ last round: the 27 round-8 additions with no driver
#: row yet, plus the 2 keys whose green rows (r5) went stale after the
#: round-8 sf0.1 exact-sweep fixes (agg_hll_merge exact-anchored HLL
#: flags; stats_spearman DECIMAL(20,12) bridge). 21 spare slots remain
#: for round-9 additions — append them directly after the queue.
#: Keys listed here come first, in this order; any registered key not
#: listed follows in module registration order.
#: ``tests/test_rotation.py`` derives the required window mechanically
#: from the committed CORRECTNESS_r*.json files and fails if this
#: tuple ever goes stale.
_CHECK_PRIORITY: tuple[str, ...] = (
    # -- round-9 window: the 29-key queue from round 8, in order --
    "stats_kendall_tau",
    "ts_holt_linear",
    "date_week_mode",
    "sql_unpivot_syntax",
    "sql_named_window",
    "sql_values_inline",
    "emb_hard_negatives",
    "corpus_interleave_round_robin",
    "merge_coalescing_final",
    "array_search_funcs",
    "ts_cumsum_reset",
    "graph_triangle_count",
    "scan_file_metadata",
    "multimodal_patch_budget",
    "date_timezone_convert",
    "emb_centroid_distances",
    "array_sort_funcs",
    "sql_nulls_ordering",
    "sql_distinct_on",
    "mergetree_ttl_rollup",
    "dq_histogram_drift",
    "corpus_shard_manifest",
    "ip_prefix_rollup",
    "sample_bottom_k",
    "agg_histogram_equi_depth",
    "sql_lateral_alias",
    "multimodal_interleaved_layout",
    # re-enter after the round-8 sf0.1 exact sweep staled their rows
    # (see tests/test_rotation.py RECHECK)
    "agg_hll_merge",
    "stats_spearman",
    # -- round-9 additions fill the remaining window slots (30-50) --
    # The six round-9 rows-only→oracled conversions: stale/no prior
    # exact rows, need a current driver row under the new contracts
    # (flag-anchored sketches; portable md5-grid pair sets).
    "agg_approx_distinct",
    "agg_percentile_approx",
    "dedup_minhash",
    "dedup_simhash",
    "sim_topk_lsh",
    "sim_topk_ivf",
    # round-9 new keys (operators/analytics8.py)
    "dq_referential_integrity",
    "seq_longest_increase",
    "graph_degree_histogram",
    "orders_backlog_aging",
    "stats_cramers_v_corrected",
    "join_bitset_prefilter",
    "contamination_bitset",
    "agg_combinators_ornull",
    "dq_uniqueness_audit",
    "orders_fulfillment_latency",
    # round-9 new keys (operators/analytics9.py) — the first five fill
    # the window's last spare slots; the rest head the round-10 queue.
    "stats_entropy",
    "stats_theils_u",
    "stats_contingency_coef",
    "stats_student_ttest",
    "stats_ab_min_sample",
    "seq_gaps_islands",
    "sql_quantified_compare",
    "date_parse_best_effort",
    "corpus_temperature_mix",
    "emb_power_iteration_pc1",
    "sample_hash_consistent",
    "dq_benford_law",
    "events_markov_stationary",
    "emb_random_projection",
    "stats_wilcoxon_signed",
    "corpus_datasheet",
    "text_zipf_fit",
    "ts_period_detect",
    "str_phonetic_soundex",
    "text_readability_fk",
    "seq_edit_distance",
    "sketch_countmin_freq",
    "ts_kalman_level",
    "events_burstiness_index",
    "ts_theil_sen_slope",
    # round-9 batch-4 additions (operators/analytics10.py) — deep in
    # the round-10 queue; exact-verified at three scales this session.
    "ts_stl_decompose",
    "stats_anova_oneway",
    "stats_jarque_bera",
    "ts_cusum_alarm",
    "token_bigram_entropy",
    "stats_linregress_multi",
    "dq_schema_profile",
    # round-9 batch-5 additions (operators/analytics11.py,
    # extensions/linalg.py)
    "stats_levene_bf",
    "stats_runs_test",
    "text_mattr_diversity",
    "date_business_days",
    "emb_pca2_deflation",
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
