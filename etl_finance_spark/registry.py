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
# Round-11 composition (exactly 50, derived by `python
# scripts/plan_window.py --recheck q_cosine_topk,q_ann_lsh_topk,
# q_ann_ivf_topk,q_embed_neardup,q_embed_join,q_semantic_dedup,
# q_ivfpq_topk` from CORRECTNESS_r01-r10): 1 flagship; 0 reds
# (cumulative ledger zero-red since r06); 7 changed-file re-checks
# (every query registered in llm/similarity.py + its pq.py consumer —
# ivf_query_cells's nprobe default moved to late-bound N_PROBE
# resolution, ADVICE r10); 0 never-checked; then the STALENESS FILL —
# all 34 remaining r06-evidence queries plus the 8 oldest r07 queries,
# oldest round then registration order. After this round no query's
# driver evidence is older than r07.
_DRIVER_WINDOW = (
    # flagship — the shim's entry() query, always first
    "q_pct_change_hourly",
    # changed-file re-checks: ivf_query_cells N_PROBE late binding
    "q_cosine_topk",
    "q_ann_lsh_topk",
    "q_ann_ivf_topk",
    "q_embed_neardup",
    "q_embed_join",
    "q_semantic_dedup",
    "q_ivfpq_topk",
    # staleness fill: r06 evidence (34), registration order
    "q_bool_aggs",
    "q_bitmap_distinct",
    "q_multimodal_meta",
    "q_dedup_clusters",
    "q_repetition_score",
    "q_stream_pair_outer",
    "q_select_exprs",
    "q_cohort_retention",
    "q_win_rownum",
    "q_scan_parquet",
    "q_join_range",
    "q_priority_wait",
    "q_pack_contexts",
    "q_domain_mix",
    "q_decontaminate",
    "q_source_cap",
    "q_span_dedup",
    "q_pii_redact",
    "q_chunk_windows",
    "q_array_agg_distinct",
    "q_corpus_stats",
    "q_event_transitions",
    "q_pricing_summary",
    "q_sessionize_gaps",
    "q_embed_standardize",
    "q_drawdown",
    "q_vwap",
    "q_hll_distinct",
    "q_variant_get",
    "q_python_datasource",
    "q_recursive_bfs",
    "q_frequent_items",
    "q_rollup_merge",
    "q_backfill_partitions",
    # staleness fill: oldest r07 evidence (8)
    "q_jaccard_pairs",
    "q_ngram_jaccard",
    "q_minhash_lsh",
    "q_simhash",
    "q_jaccard_prefix",
    "q_docs_by_lang",
    "q_term_freq",
    "q_lang_id",
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
