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
    "clickhousebackup_spark.operators.analytics20",
    "clickhousebackup_spark.operators.analytics21",
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
#: after round 14 (union of CORRECTNESS_r01-r14, all fourteen rounds
#: green): every registered oracled key carries a green driver row
#: except the 4 round-14 additions that overflowed the round-14
#: window (declared DEFERRED there; judge-verified exact at three
#: scales plus the sf1 arm meanwhile, PLANS_r14 / VERDICT round 14).
#: The round-15 window below is that 4-key DEFERRED queue plus the
#: three round-15 contract upgrades — scan_file_metadata
#: (layout-normalized rollup; RECHECK, its green row predates the
#: change), text_fingerprint (md5-grid migration) and
#: multimodal_features (left-fold byte-moment oracle), the latter two
#: rows-only → exact promotions — followed by 43 regression REFRESH
#: refills: the stalest green keys in the registry (latest driver
#: row = CORRECTNESS_r05), chosen so the oldest evidence gets
#: refreshed.
#: Keys listed here come first, in this order; any registered key not
#: listed follows in module registration order.
#: ``tests/test_rotation.py`` derives the required window mechanically
#: from the committed CORRECTNESS_r*.json files and fails if this
#: tuple ever goes stale; scripts/make_rotation.py emitted this block.
_CHECK_PRIORITY: tuple[str, ...] = (
    # -- round-15 window positions 0-6: the four round-14
    # additions (skew-playbook families 8-11) declared DEFERRED
    # last round, plus the three round-15 contract upgrades —
    # scan_file_metadata (layout-normalized rollup, RECHECK),
    # text_fingerprint and multimodal_features (md5-grid /
    # left-fold oracle promotions: rows-only -> exact) --
    "sequence_count_pairs_twostage",
    "agg_ema_twostage",
    "agg_weighted_median_twostage",
    "win_percent_rank_twostage",
    "scan_file_metadata",
    "text_fingerprint",
    "multimodal_features",
    # -- 43 regression REFRESH refills (window slots 7-49):
    # stalest green keys (latest driver row = r5), emitted by
    # scripts/make_rotation.py; see tests/test_rotation.py --
    "agg_argminmax",
    "agg_delta_sum",
    "agg_gini_diversity",
    "agg_group_concat",
    "agg_sum_map",
    "agg_weighted_median",
    "array_cumsum",
    "array_difference",
    "array_enumerate_uniq",
    "array_join_parallel",
    "backup_incremental_roundtrip",
    "bpe_merge_candidates",
    "cdc_apply_changelog",
    "corpus_split_train_eval",
    "date_bucket_custom",
    "dedup_fuzzy_blocked",
    "dedup_semantic",
    "dict_get_join",
    "dict_hierarchy_flatten",
    "explode_outer_empty",
    "funnel_steps_windowed",
    "geo_cell_radius_join",
    "intervals_max_concurrent",
    "join_any_left",
    "join_asof_tolerance",
    "limit_by",
    "merge_replacing_final",
    "merge_summing_final",
    "merge_upsert_cow",
    "merge_versioned_collapsing",
    "mutation_delete_update",
    "orders_pareto_8020",
    "part_fuzzy_levenshtein",
    "scan_parquet",
    "scan_projected",
    "set_except_all",
    "set_intersect_all",
    "sink_csv_roundtrip",
    "url_funcs",
    "user_active_streaks",
    "win_cume_dist_nth",
    "win_moving_median",
    "zorder_layout",
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
