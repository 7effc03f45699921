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


def oracle_text(name: str) -> str:
    """Registered oracle SQL for ``name``, read from the in-process
    registry WITHOUT importing the full module list — callers import
    the registering module(s) themselves first (the composition use
    case: sketch_recall_probe derives its oracle from the five
    constituent keys' registered texts, one source of truth for each
    candidate program). Raises KeyError for unregistered or
    rows-only keys so a silent None can never leak into a composed
    statement."""
    spec = _REGISTRY.get(name)
    if spec is None or spec.oracle is None:
        raise KeyError(name)
    return spec.oracle


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
#: after round 15 (union of CORRECTNESS_r01-r15, all fifteen rounds
#: green): every registered key carries a driver row — 504 hash-pass
#: plus sketch_recall_probe's rows-only row, which round 16 retires
#: by composing an exact oracle from its constituents' registered
#: texts. The round-16 window below is the 4-key dedup RECHECK queue
#: (scale self-bounds landed this round; driver-gate outputs argued
#: unchanged but the code changed) plus that oracle promotion,
#: followed by 45 regression REFRESH refills: the stalest green keys
#: in the registry (latest driver row = CORRECTNESS_r06), chosen so
#: the oldest evidence gets refreshed.
#: Keys listed here come first, in this order; any registered key not
#: listed follows in module registration order.
#: ``tests/test_rotation.py`` derives the required window mechanically
#: from the committed CORRECTNESS_r*.json files and fails if this
#: tuple ever goes stale; scripts/make_rotation.py emitted this block.
_CHECK_PRIORITY: tuple[str, ...] = (
    # -- round-16 window positions 0-4 (required): the four
    # exact-baseline dedup long-poles re-earning driver rows after
    # their scale self-bounds landed (RECHECK: driver-gate outputs
    # argued unchanged — probe slices engage only past the footer-
    # metadata caps — but the code changed, so the green rows must
    # be re-earned), plus sketch_recall_probe's rows-only -> exact
    # oracle promotion (composed from its five constituents'
    # registered texts; retires the registry's last rows-only row) --
    "dedup_fuzzy_blocked",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_containment",
    "sketch_recall_probe",
    # -- 45 regression REFRESH refills (window slots 5-49): the
    # stalest green keys (latest driver row = r06 cohort), emitted
    # by scripts/make_rotation.py; see tests/test_rotation.py --
    "stats_linregress",
    "str_keyvalue_parse",
    "table_column_stats",
    "text_ngram_lm_score",
    "ts_autocorr_lag1",
    "win_ratio_to_report",
    "with_totals",
    "agg_array_intersect",
    "agg_bit_group",
    "agg_group_array_last",
    "agg_hll_set_ops",
    "agg_minmax_map",
    "agg_retention_flags",
    "agg_sparkbar",
    "agg_uniq_array",
    "agg_uniq_upto",
    "array_compact_dedup",
    "array_fill_forward",
    "array_moving_agg",
    "array_rotate_zip",
    "corpus_pack_sequences",
    "curation_funnel_report",
    "date_timeslots",
    "emb_dim_slice_search",
    "emb_vector_distances",
    "funnel_time_to_convert",
    "graph_bfs_hops",
    "intervals_open_per_day",
    "intervals_union_length",
    "join_interval_overlap",
    "json_schema_stats",
    "quantile_timing_grid",
    "sequence_match_flag",
    "sequence_next_node",
    "stats_ks_test",
    "stats_mad",
    "stats_mean_ci",
    "stats_roc_auc",
    "str_extract_groups",
    "str_ngram_similarity",
    "str_normalized_query_hash",
    "text_cdc_chunks",
    "text_minhash_export",
    "text_simhash_export",
    "text_word_cooccurrence",
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
