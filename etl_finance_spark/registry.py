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
)

# The driver oracle-checks exactly the FIRST ~50 names in the order
# queries()/oracle_sql() iterate, so collect() re-orders its output:
# the names below come first (in this order), everything else follows
# in registration order. This replaces the round-1/2 module-rotation
# trick with per-query control. Round-4 composition (exactly 50):
#   1 flagship, the once-red q_bool_aggs (historical fix stays
#   driver-watched), the three r03-green queries whose PLANS changed
#   this round (broadcast-hint sweep: regional_revenue, revenue_topk,
#   large_orders — fix-recheck doubles as family sentinel), then 45
#   never-driver-checked queries: the twice-slipped raw-scan pair
#   (top-10 this time, per VERDICT r3 #1), the thrice-deferred
#   functions.families scalars (14), the TPC-H sweep (17 — includes
#   the hint-swept market_share/top_supplier/...), the rebuilt
#   q_yoy_growth + q_pagerank, sql_surface (4), VARIANT (2), the
#   Python Data Source, and 3 corpus-assembly queries.
_DRIVER_WINDOW = (
    # flagship — the shim's entry() query, always first
    "q_pct_change_hourly",
    # historical-red sentinel
    "q_bool_aggs",
    # plan changed this round (forced-broadcast sweep) — re-verify
    "q_regional_revenue",
    "q_revenue_topk",
    "q_large_orders",
    # raw-scan pair, twice slipped at positions 51-52 — top-10 now
    "q_time_range_scan",
    "q_profile_events",
    # functions.families scalar families (14, deferred r01-r03)
    "q_select_exprs",
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
    # TPC-H sweep (plans/tpch2 + tpch3, 17 — Q2/Q9/Q17/Q20 correlated
    # shapes are the riskiest SQL in the repo; market_share/top_supplier/
    # suppliers_waiting/promo/disjunctive also carry this round's hint
    # sweep)
    "q_pricing_summary",
    "q_min_cost_supplier",
    "q_product_profit",
    "q_important_stock",
    "q_supplier_cnt",
    "q_small_qty_revenue",
    "q_excess_suppliers",
    "q_priority_wait",
    "q_forecast_revenue",
    "q_market_share",
    "q_shipmode_priority",
    "q_custdist",
    "q_promo_revenue",
    "q_top_supplier",
    "q_disjunctive_rev",
    "q_suppliers_waiting",
    "q_idle_customers",
    # rebuilt this round (yoy hint drop; pagerank degree-fold)
    "q_yoy_growth",
    "q_pagerank",
    # modern SQL surface
    "q_recursive_bfs",
    "q_lateral_topn",
    "q_null_semantics",
    "q_pivot_multi",
    # VARIANT + Python Data Source
    "q_variant_get",
    "q_variant_agg",
    "q_python_datasource",
    # corpus assembly (first 3 of the family; rest in round 5)
    "q_decontaminate",
    "q_pack_contexts",
    "q_span_dedup",
)

# Round-5 rotation backlog (never driver-checked after the r04 window,
# 35 left — recount: 214 total − 134 green through r03 − 45 new in this
# window): plans.finance (11 indicators), plans.analytics3 (sessionize,
# scd2, dq, triangles, ewma), analytics2 remainder (q_event_transitions,
# q_ohlc_daily_reagg), corpus remainder (q_domain_mix, q_source_cap,
# q_pii_redact, q_chunk_windows, q_corpus_stats, q_array_agg_distinct +
# WEAK q_semantic_dedup), aggregates tier 3 (q_bitmap_distinct,
# q_mode_by_group, q_moments, q_regr_ols), q_explode_outer,
# q_embed_standardize, and the 4 WEAK sketches (rows-only). 35 + flagship
# + sentinels fits ONE final window — full driver coverage closes in r05.
#
# `python scripts/plan_window.py` derives the next rotation from the
# recorded CORRECTNESS_r*.json evidence (reds first, then
# never-checked, then family sentinels) — run it at round start and
# reconcile with the hand-drafted list below.
#
# DRAFT r05 window (apply at round-5 start, after CORRECTNESS_r04
# confirms the r04 rows; verify len == 50 and adjust sentinels to any
# r04 reds first):
#   flagship: q_pct_change_hourly
#   sentinels (one per r04-green family + plan-changed recheck):
#     q_bool_aggs, q_str_funcs, q_pricing_summary, q_variant_get,
#     q_copurchase_pairs, q_pagerank, q_dedup_clusters, q_decontaminate
#   the 35 never-checked: q_drawdown q_bollinger q_vwap q_rsi
#     q_stochastic q_obv q_macd q_beta q_atr q_golden_cross q_sharpe
#     q_sessionize_gaps q_scd2_build q_dq_expectations q_triangle_count
#     q_ewma
#     q_event_transitions q_ohlc_daily_reagg q_domain_mix q_source_cap
#     q_pii_redact q_chunk_windows q_corpus_stats q_array_agg_distinct
#     q_semantic_dedup q_bitmap_distinct q_mode_by_group q_moments
#     q_regr_ols q_explode_outer q_embed_standardize q_hll_distinct
#     q_hll_union q_theta_setops q_kll_quantiles
#   = 1 + 8 + 35 = 44 names; 6 slots spare for extra sentinels or any
#   r04 reds (the five WEAK rows record rows-only checks).
#
# r06+ surface growth (declare once r05 closes full driver coverage;
# the library ops and tests already exist — each just needs its
# @register binding):
#   q_frequent_items — operators/heavyhitters.frequent_items on a
#     low-cardinality column with k above every per-partition distinct
#     count, so slack == 0 and lower == upper == exact: the oracle is
#     plain GROUP BY count(*) (alias item/lower/upper on both sides).
#   q_rollup_merge — operators/incremental: merge two half-states and
#     finalize; oracle = direct GROUP BY over the union (exact
#     measures only: sum/count/min/max on integer-ish columns).
#   q_stream_pair_outer — streaming/joins.followed_within(
#     how="left_outer") batch form; oracle = LEFT JOIN with the same
#     time band (a_id/b_id/a_user aliases as in q_stream_pair_join).


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
