"""Approximate frequent items (heavy hitters) with deterministic error
bounds — the frequency rung of the mergeable-summary tier (HLL =
distinct, KLL = quantiles, theta = set algebra; operators/sketches.py).

Why not ``groupBy(item).count().orderBy(...)``: the exact plan's
shuffle carries one row per distinct item per input partition — for a
100 TB token/URL/domain column that is the vocabulary itself, and the
hot keys skew the exchange. Here each input partition emits at most
``k + 1`` rows (its top-k items with EXACT in-partition counts, plus
one NULL-item marker row carrying the partition's slack), so the
shuffle is ``(k+1) × partitions`` rows regardless of vocabulary or
skew, and the merge runs over candidates only.

The truncation is lossy but ACCOUNTABLE (the SpaceSaving/Misra-Gries
merge argument): an item absent from a partition's top-k has
in-partition count ≤ that partition's slack, so

    lower  = Σ counts from partitions where the item surfaced ≤ f
    upper  = lower + Σ slack over partitions where it did NOT      ≥ f

and any item with true frequency f > Σ_p slack_p (≤ N/(k+1), since
slack_p ≤ n_p/(k+1)) MUST surface somewhere. ``frequent_items``
returns every candidate with [lower, upper]; callers choose sure-hits
(lower ≥ t) vs possible-hits (upper ≥ t). tests/test_heavyhitters.py
pins the bound sandwich against exact counts, the no-false-negative
guarantee at the Σ slack threshold, and recovery of a planted heavy
hitter spread thin across every partition.

The per-partition pass accumulates exact value counts across Arrow
batches (vectorized pandas ``value_counts``, no per-row Python), so
its memory is one (item → long) map per input partition — the same
working set the exact plan's map-side hash aggregate holds; k only
caps what leaves the partition. Items are canonicalized to STRING by
Spark's own cast BEFORE the pandas pass, so item spelling follows SQL
cast semantics (booleans as 'true'/'false', floats in Spark's
notation), never Python ``str()`` — a join-back or SQL oracle on the
item column sees identical keys. Declared surface: ``q_frequent_items``
below runs the summary-merge plan in its exact regime (k above every
per-partition distinct count → slack 0 → lower == upper == f), so the
DuckDB GROUP BY oracle checks the whole machinery bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_finance_spark.lineage import managed_persist
_PARTIALS_SCHEMA = "item string, cnt long, slack long"


def topk_partials(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-input-partition summaries: the top-``k`` items by exact
    in-partition count (ties broken by item string for determinism),
    plus ONE marker row per non-empty partition — ``item`` NULL,
    ``cnt`` 0 — carrying the partition's slack: the largest count that
    did NOT make the cut (0 when nothing was truncated). Source NULLs
    are not items and are ignored (the NULL item is therefore free to
    be the marker sentinel). The column is cast to string by Spark
    BEFORE the pandas pass (SQL cast spelling, see module doc)."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def summarize(batches: Iterator) -> Iterator:
        import pandas as pd

        acc: dict = {}
        for pdf in batches:
            vc = pdf["item"].dropna().value_counts()
            for item, n in vc.items():
                acc[item] = acc.get(item, 0) + int(n)
        if not acc:
            return
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        kept = ranked[:k]
        slack = ranked[k][1] if len(ranked) > k else 0
        yield pd.DataFrame({
            "item": [i for i, _ in kept] + [None],
            "cnt": [c for _, c in kept] + [0],
            "slack": [slack] * (len(kept) + 1),
        })

    return (
        df.select(F.col(col).cast("string").alias("item"))
        .mapInPandas(summarize, _PARTIALS_SCHEMA)
    )


def frequent_items(df: DataFrame, col: str, k: int) -> DataFrame:
    """Candidate heavy hitters of ``df[col]`` with deterministic count
    bounds: (item, lower, upper), where lower ≤ f(item) ≤ upper and
    every item with f > Σ per-partition slack is guaranteed present.

    The input is scanned exactly ONCE: the summaries aggregate by item
    (one tiny shuffle of ≤ (k+1)·partitions rows) into the candidate
    frame, which PERSISTS (evictable/spillable) because it feeds two
    consumers — the NULL-item marker row, whose slack sum after the
    groupBy IS the total slack (one marker per input partition, all
    collapsed into the single NULL group), and the candidates
    themselves; the 1-row total then broadcast-joins back. The
    rejected alternatives both fail a 100 TB lens: a branch WITHOUT
    the persist recomputes the whole input scan per consumer, and the
    earlier global-window form funneled the entire candidate set —
    up to k·partitions rows, ~10^9 at 100 TB — through one task to
    spread a single number. (The broadcast future runs the input scan
    under spark.sql.broadcastTimeout — catalog/session size that conf
    for derived-aggregate broadcasts; see the notes there.)"""
    agg = managed_persist(topk_partials(df, col, k).groupBy("item").agg(
        F.sum("cnt").alias("lower"),
        F.sum("slack").alias("present_slack"),
    ))
    total = agg.filter(F.col("item").isNull()).select(
        F.col("present_slack").alias("__total_slack")
    )
    return (
        agg.filter(F.col("item").isNotNull())
        .crossJoin(F.broadcast(total))
        .select(
            "item",
            "lower",
            (F.col("lower") + F.col("__total_slack")
             - F.col("present_slack")).alias("upper"),
        )
    )


# ---------------------------------------------------------------------------
# Declared query
# ---------------------------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402

from etl_finance_spark.catalog import table  # noqa: E402
from etl_finance_spark.registry import register  # noqa: E402


@register(
    "q_frequent_items",
    oracle="""
    SELECT event_type AS item,
           count(*) AS cnt_lo,
           count(*) AS cnt_hi
    FROM events
    WHERE event_type IS NOT NULL
    GROUP BY 1
    """,
)
def q_frequent_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters over events.event_type with the bounded-shuffle
    summary-merge plan, run in its EXACT regime: k = 1000 exceeds every
    per-partition distinct count of the enum-like column at any sf
    (5 event types), so every partition's slack is 0 and the
    deterministic bounds COLLAPSE — lower == upper == the true count,
    at any partitioning. That makes the plain GROUP BY oracle an exact
    check of the whole candidate/slack machinery (the bound sandwich,
    no-false-negative floor, and planted-hitter recovery under real
    truncation are pinned in tests/test_heavyhitters.py). At 100 TB the
    same plan over an unbounded URL/token column still shuffles only
    (k+1) rows per partition — the point of the operator."""
    ev = table(spark, sf_dir, "events")
    out = frequent_items(ev, "event_type", 1000)
    return out.select(
        "item",
        F.col("lower").alias("cnt_lo"),
        F.col("upper").alias("cnt_hi"),
    )
