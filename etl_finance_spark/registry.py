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
# Round-12 composition (exactly 50, derived by `python
# scripts/plan_window.py` from CORRECTNESS_r01-r11): 1 flagship; 0
# reds (cumulative ledger zero-red since r06); 0 changed-file
# re-checks (round 12's only source changes are dev scripts and
# tests — no engine module changed, so no query's behavior could
# move); 0 never-checked; then the STALENESS FILL — all 40 remaining
# r07-evidence queries plus the 9 oldest r08 queries, oldest round
# then registration order. After this round no query's driver
# evidence is older than r08.
_DRIVER_WINDOW = (
    # flagship — the shim's entry() query, always first
    "q_pct_change_hourly",
    # staleness fill: r07 evidence (40), registration order
    "q_text_quality",
    "q_token_count",
    "q_edit_distance",
    "q_tfidf",
    "q_fingerprint",
    "q_win_rank",
    "q_win_running_sum",
    "q_win_moving_avg",
    "q_win_ntile",
    "q_union_all",
    "q_add_literal",
    "q_project_drop",
    "q_project_rename",
    "q_filter_isin",
    "q_filter_nonempty",
    "q_coalesce",
    "q_cast",
    "q_date_format",
    "q_unix_ts",
    "q_multi_format_ts",
    "q_month_seq",
    "q_lower",
    "q_array_transform",
    "q_array_field",
    "q_to_json",
    "q_json_get",
    "q_from_json",
    "q_stats_agg",
    "q_dedup_keys",
    "q_join_anti",
    "q_filter_range",
    "q_case_when",
    "q_fillna_mean",
    "q_pct_change_lag",
    "q_join_outer",
    "q_join_broadcast",
    "q_join_left",
    "q_join_semi",
    "q_join_cross",
    "q_join_asof",
    # staleness fill: oldest r08 evidence (9)
    "q_split_deterministic",
    "q_stream_sliding",
    "q_stream_session",
    "q_gap_fill",
    "q_union_distinct",
    "q_intersect",
    "q_except",
    "q_pivot",
    "q_unpivot",
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
