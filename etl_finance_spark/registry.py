"""Query registry — single source of truth for the declared surface.

Every operator from SURVEY.md §2 that is implemented-and-verified gets a
``@register("q_name", oracle=...)`` entry next to its implementation.
``__spark_entry__.py`` (the driver contract) and the differential tests
both read from here, so the declared set can never drift from the tested
set.

``oracle=None`` marks a WEAK query (not SQL-expressible / nondeterministic);
the driver then records a rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None for WEAK


_REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries. Imported lazily by collect() so partial
# breakage in one family can't take down the whole surface. Import order
# no longer decides the driver's correctness window — _DRIVER_WINDOW
# below does, explicitly and per-query.
_QUERY_MODULES = (
    "etl_finance_spark.llm.dedup",
    "etl_finance_spark.llm.similarity",
    "etl_finance_spark.llm.textstats",
    "etl_finance_spark.streaming.windows",
    "etl_finance_spark.operators.setops",
    "etl_finance_spark.operators.reshape",
    "etl_finance_spark.functions.udfs",
    "etl_finance_spark.operators.aggregates",
    "etl_finance_spark.llm.multimodal",
    "etl_finance_spark.llm.clusters",
    "etl_finance_spark.llm.quality",
    "etl_finance_spark.streaming.joins",
    "etl_finance_spark.functions.families",
    "etl_finance_spark.plans.analytics",
    "etl_finance_spark.operators.windows",
    "etl_finance_spark.operators.core",
    "etl_finance_spark.operators.joins",
    "etl_finance_spark.plans.flagship",
    "etl_finance_spark.plans.tpch2",
    "etl_finance_spark.llm.corpus",
    "etl_finance_spark.plans.analytics2",
    "etl_finance_spark.plans.tpch3",
    "etl_finance_spark.plans.analytics3",
    "etl_finance_spark.llm.mlprep",
    "etl_finance_spark.plans.finance",
    "etl_finance_spark.operators.sketches",
    "etl_finance_spark.functions.semistructured",
    "etl_finance_spark.sources.pysource",
    "etl_finance_spark.plans.sql_surface",
    "etl_finance_spark.operators.heavyhitters",
    "etl_finance_spark.operators.incremental",
    "etl_finance_spark.llm.pq",
    "etl_finance_spark.streaming.ingest",
    "etl_finance_spark.sources.sinks",
)

# The driver oracle-checks exactly the FIRST ~50 names in the order
# queries()/oracle_sql() iterate, so collect() re-orders its output:
# the names below come first (in this order), everything else follows
# in registration order.
#
# Round-13 composition (exactly 50, derived by `python
# scripts/plan_window.py --recheck q_minhash_lsh,q_pack_contexts,
# q_span_dedup` from CORRECTNESS_r01-r12): 1 flagship; 0 reds
# (cumulative ledger zero-red since r06); 3 changed-file re-checks
# (llm/dedup.py grew the corpus-size-derived band_rows default on
# minhash_lsh_pairs — q_minhash_lsh now takes the derivation path,
# landing on the same band_rows=2 at its 500-doc cap; llm/corpus.py's
# q_pack_contexts/q_span_dedup were refactored into library forms for
# the 50k-doc alignment-seam scaleprobes — behavior-preserving, so
# the re-check is the proof); 0 never-checked; then the STALENESS
# FILL — all 33 remaining r08-evidence queries (the q_agg_* family,
# q_udf_pandas, q_incremental_ingest, q_corpus_prep, the sampling/
# multimodal/scalar-family stragglers) plus the 13 oldest r09
# queries, oldest round then registration order. After this round no
# query's driver evidence is older than r09.
_DRIVER_WINDOW = (
    # flagship — the shim's entry() query, always first
    "q_pct_change_hourly",
    # changed-file re-checks (3)
    "q_minhash_lsh",
    "q_pack_contexts",
    "q_span_dedup",
    # staleness fill: r08 evidence (33), registration order
    "q_posexplode",
    "q_regexp_replace",
    "q_percentiles",
    "q_approx_percentiles",
    "q_exists_subquery",
    "q_correlated_scalar",
    "q_udf_pandas",
    "q_udaf_weighted_avg",
    "q_agg_groupby",
    "q_agg_count_distinct",
    "q_agg_having",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_gsets",
    "q_agg_approx_distinct",
    "q_histogram",
    "q_latest_per_key",
    "q_skew_distinct",
    "q_agg_grouping_id",
    "q_median_by_group",
    "q_corr_covar",
    "q_multimodal_features",
    "q_multimodal_frames",
    "q_corpus_prep",
    "q_stratified_sample",
    "q_weighted_sample",
    "q_lexical_diversity",
    "q_stream_pair_join",
    "q_funnel",
    "q_string_agg",
    "q_rolling_active_users",
    "q_snapshot_diff",
    "q_incremental_ingest",
    # staleness fill: oldest r09 evidence (13)
    "q_nullif_coalesce",
    "q_str_funcs",
    "q_date_funcs",
    "q_math_funcs",
    "q_array_funcs",
    "q_try_cast",
    "q_array_funcs2",
    "q_bitwise",
    "q_greatest_least",
    "q_str_pad",
    "q_map_funcs",
    "q_array_hof3",
    "q_map_funcs2",
)

# Rotation bookkeeping. Surface closed at 220 in round 6; every query
# has a CORRECTNESS_r* row (hash-green, or rows-only for the WEAK
# oracle=None set) and the ledger has been zero-red since r06. The
# per-round window budget: flagship + any red rechecks + changed-file
# re-checks (--recheck) + newly declared queries (a new query enters
# the same round's window or doesn't get declared) + staleness fill
# (oldest driver evidence first) to the full 50.
#
# `python scripts/plan_window.py [--recheck a,b]` derives the next
# rotation from the recorded CORRECTNESS_r*.json evidence (reds,
# rechecks, never-checked, then staleness fill) and refuses any window
# whose EXACT oracles return collection-typed columns — run it at
# round start.


def _window_order(registered: dict[str, QuerySpec]) -> dict[str, QuerySpec]:
    """Priority names first (skipping any not registered), then the rest
    in registration order."""
    out: dict[str, QuerySpec] = {}
    for name in _DRIVER_WINDOW:
        if name in registered:
            out[name] = registered[name]
    for name, spec in registered.items():
        if name not in out:
            out[name] = spec
    return out


def register(name: str, oracle: str | None):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the surface."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


def collect() -> dict[str, QuerySpec]:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return _window_order(dict(_REGISTRY))


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in collect().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in collect().items()
        if spec.oracle is not None
    }
