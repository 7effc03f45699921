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
    "clickhousebackup_spark.operators.behavior",
    "clickhousebackup_spark.functions.strings",
    "clickhousebackup_spark.functions.dates",
    "clickhousebackup_spark.functions.maths",
    "clickhousebackup_spark.functions.arrays",
    "clickhousebackup_spark.functions.maps_json",
    "clickhousebackup_spark.functions.hashes",
    "clickhousebackup_spark.functions.udfs",
    "clickhousebackup_spark.streaming.batch_equiv",
    "clickhousebackup_spark.backup.queries",
    "clickhousebackup_spark.extensions.dedup",
    "clickhousebackup_spark.extensions.similarity",
    "clickhousebackup_spark.extensions.text",
    "clickhousebackup_spark.extensions.multimodal",
    "clickhousebackup_spark.extensions.curation",
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
#: FIRST 50 keys of ``all_specs()`` per round. Round 1 verified slots
#: 1-50 of the old module order (CORRECTNESS_r01.json); this round the
#: never-checked keys move to the front so every SURVEY §2 Part B key
#: earns a driver row. Keys listed here come first, in this order; any
#: registered key not listed follows in module registration order.
#: Rotate per round until the whole registry has green rows.
_CHECK_PRIORITY: tuple[str, ...] = (
    # -- SURVEY §2 Part B keys with no CORRECTNESS row yet (28) --
    "str_funcs",
    "str_split_explode",
    "str_regexp",
    "date_buckets",
    "date_arith",
    "math_funcs",
    "array_funcs",
    "array_higher_order",
    "map_json_funcs",
    "hash_funcs",
    "udf_python",
    "udf_pandas_scalar",
    "udaf_pandas_grouped",
    "udtf_explode_props",
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_dedup_watermark",
    "stream_late_data",
    "stream_foreach_sink",
    "snapshot_write",
    "snapshot_partitioned",
    "dedup_exact",
    "dedup_minhash",
    "sim_topk_cosine",
    "text_tokenize_count",
    "text_lang_stats",
    "multimodal_join",
    # -- round-1 driver ERRORs, now scalar-only (2) --
    "agg_percentile_approx",
    "agg_collect_sorted",
    # -- Part C keys with oracles, no row yet (20) --
    "agg_corr",
    "safe_casts",
    "union_by_name_evolved",
    "join_exists_correlated",
    "array_construct_ops",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "udtf_python_native",
    "backup_catalog",
    "backup_keep_newest",
    "backup_latest_pointers",
    "backup_retention_plan",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "emb_label_centroids",
    "text_quality_score",
    "text_lang_id",
    "text_token_count",
    "multimodal_frame_sample",
    # -- slots 51+: rows-only Part C keys (weakest driver check) defer
    #    to round 3's window --
    "posexplode_words",
    "dedup_simhash",
    "dedup_clusters",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "text_fingerprint",
    "multimodal_features",
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
