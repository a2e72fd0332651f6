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
# Round-8 composition (exactly 50, derived by `python
# scripts/plan_window.py --recheck q_incremental_ingest,q_cosine_topk,
# q_ann_lsh_topk,q_ann_ivf_topk,q_embed_neardup,q_embed_join,
# q_semantic_dedup,q_ivfpq_topk` from CORRECTNESS_r01-r07): 1 flagship;
# 0 reds (the cumulative ledger is zero-red since r06); 8 changed-file
# re-checks (llm/similarity.py + llm/pq.py — the final-model
# lineage-cut A/B, eager measured a wash and lazy kept — and
# streaming/ingest.py's structured-error fallback, so every
# query those modules register re-earns evidence this round); 0
# never-checked; then the STALENESS FILL — the remaining 23
# r02-evidence queries plus the oldest r03s, oldest evidence first.
_DRIVER_WINDOW = (
    # flagship — the shim's entry() query, always first
    "q_pct_change_hourly",
    # changed-file re-checks: ingest's structured-error fallback and
    # the two ANN-model modules touched by the lineage-cut A/B
    "q_incremental_ingest",
    "q_cosine_topk",
    "q_ann_lsh_topk",
    "q_ann_ivf_topk",
    "q_embed_neardup",
    "q_embed_join",
    "q_semantic_dedup",
    "q_ivfpq_topk",
    # staleness fill: the 23 remaining r02-evidence queries ...
    "q_split_deterministic",
    "q_stream_sliding",
    "q_stream_session",
    "q_gap_fill",
    "q_union_distinct",
    "q_intersect",
    "q_except",
    "q_pivot",
    "q_unpivot",
    "q_posexplode",
    "q_regexp_replace",
    "q_percentiles",
    "q_approx_percentiles",
    "q_exists_subquery",
    "q_correlated_scalar",
    "q_udf_pandas",
    "q_udaf_weighted_avg",
    "q_agg_count_distinct",
    "q_agg_having",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_gsets",
    "q_agg_approx_distinct",
    # ... then the oldest r03-evidence queries
    "q_agg_groupby",
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
