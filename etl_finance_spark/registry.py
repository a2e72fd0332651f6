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
# Round-6 composition (exactly 50, derived by scripts/plan_window.py
# from CORRECTNESS_r01-r05, then padded from 34 to the full 50 with
# changed-code re-checks): 1 flagship; the r05 red recheck
# q_array_agg_distinct (fixed: langs joined to a scalar string per the
# q_agg_collect_sorted house rule); the 3 queries newly declared THIS
# round straight into the window (q_ivfpq_topk WEAK,
# q_incremental_ingest EXACT, q_backfill_partitions EXACT) — the last
# library tiers, closing the declare-with-evidence ledger at 220/220;
# one sentinel per module family (plan_window's rotation); then the
# padding: every other corpus.py query (the file the red fix touched),
# the full similarity consumer set (pq.py imports and normalizes the
# shared corpus memo), the house-rule sibling q_agg_collect_sorted,
# the historically-red q_bool_aggs, and one extra finance sentinel.
_DRIVER_WINDOW = (
    # flagship — the shim's entry() query, always first
    "q_pct_change_hourly",
    # r05 red recheck — the fix this window exists to witness
    "q_array_agg_distinct",
    # declared this round, checked this round (zero evidence debt)
    "q_ivfpq_topk",
    "q_incremental_ingest",
    "q_backfill_partitions",
    # sentinels: one green query per module family (plan_window.py)
    "q_select_exprs",
    "q_variant_get",
    "q_udf_py",
    "q_dedup_clusters",
    "q_domain_mix",
    "q_dedup_text",
    "q_embed_standardize",
    "q_multimodal_meta",
    "q_repetition_score",
    "q_semantic_dedup",
    "q_text_stats",
    "q_bitmap_distinct",
    "q_scan_parquet",
    "q_frequent_items",
    "q_rollup_merge",
    "q_join_range",
    "q_explode_outer",
    "q_union_by_name",
    "q_hll_distinct",
    "q_win_rownum",
    "q_cohort_retention",
    "q_event_transitions",
    "q_sessionize_gaps",
    "q_drawdown",
    "q_recursive_bfs",
    "q_priority_wait",
    "q_pricing_summary",
    "q_python_datasource",
    "q_stream_pair_outer",
    "q_stream_tumbling",
    # changed-file re-checks: the rest of llm/corpus.py
    "q_corpus_stats",
    "q_decontaminate",
    "q_pii_redact",
    "q_chunk_windows",
    "q_source_cap",
    "q_span_dedup",
    "q_pack_contexts",
    # similarity consumers of the corpus/IVF memos pq.py now shares
    "q_cosine_topk",
    "q_ann_ivf_topk",
    "q_ann_lsh_topk",
    "q_embed_neardup",
    "q_embed_join",
    # the house-rule sibling + the historically-red width case
    "q_agg_collect_sorted",
    "q_bool_aggs",
    # extra finance-family sentinel (largest module, one slot above)
    "q_vwap",
)

# Rotation bookkeeping. Surface at round 6: 220 declared (217 frozen
# through r05 + the 3 last library tiers declared in r06 directly into
# the window: q_ivfpq_topk, q_incremental_ingest, and
# q_backfill_partitions — both r05-staged candidates are now
# declared). Every query has a CORRECTNESS_r* row (hash-green, or
# rows-only for the WEAK oracle=None set); the declare-with-evidence
# ledger is closed — no staged candidates remain. The per-round
# window budget: flagship +
# any red rechecks + newly declared queries (a new query enters the
# same round's window or doesn't get declared) + family sentinels
# rotating through the green families, padded to the full 50 with
# re-checks of any file changed that round.
#
# `python scripts/plan_window.py` derives the next rotation from the
# recorded CORRECTNESS_r*.json evidence (reds first, then
# never-checked, then family sentinels) — run it at round start.


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
