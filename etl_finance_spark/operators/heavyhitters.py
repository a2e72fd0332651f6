"""Approximate frequent items (heavy hitters) with deterministic error
bounds — the frequency rung of the mergeable-summary tier (HLL =
distinct, KLL = quantiles, theta = set algebra; operators/sketches.py).

Why not ``groupBy(item).count().orderBy(...)``: the exact plan's
shuffle carries one row per distinct item per input partition — for a
100 TB token/URL/domain column that is the vocabulary itself, and the
hot keys skew the exchange. Here each input partition emits exactly
``k + 1`` rows (its top-k items with EXACT in-partition counts, plus
one slack row = the (k+1)-th largest count), so the shuffle is
``(k+1) × partitions`` rows regardless of vocabulary or skew, and the
merge runs over candidates only.

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
caps what leaves the partition. Undeclared library surface (no
registry row yet), same status as operators/incremental.py.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIALS_SCHEMA = "item string, cnt long, slack long"


def topk_partials(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-input-partition summaries: the top-``k`` items by exact
    in-partition count (ties broken by item for determinism) plus that
    partition's slack — the largest count that did NOT make the cut
    (0 when nothing was truncated). NULLs are not items and are
    ignored. Output: (item, cnt, slack) with one shared slack value
    repeated on the partition's rows — consumers re-derive the
    per-partition grain with ``F.spark_partition_id()`` downstream of
    NOTHING (each mapInPandas partition yields once, so rows from one
    partition stay contiguous and carry identical slack; the merge
    only ever uses (cnt, slack) sums, never partition identity)."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def summarize(batches: Iterator) -> Iterator:
        import pandas as pd

        acc: dict = {}
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            for item, n in vc.items():
                key = str(item)
                acc[key] = acc.get(key, 0) + int(n)
        if not acc:
            return
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        kept = ranked[:k]
        slack = ranked[k][1] if len(ranked) > k else 0
        yield pd.DataFrame({
            "item": [i for i, _ in kept],
            "cnt": [c for _, c in kept],
            "slack": [slack] * len(kept),
        })

    return df.select(col).mapInPandas(summarize, _PARTIALS_SCHEMA)


def frequent_items(df: DataFrame, col: str, k: int) -> DataFrame:
    """Candidate heavy hitters of ``df[col]`` with deterministic count
    bounds: (item, lower, upper), where lower ≤ f(item) ≤ upper and
    every item with f > Σ per-partition slack is guaranteed present.
    One tiny shuffle of (k+1)·partitions summary rows; the total-slack
    scalar broadcast-joins onto the candidate aggregate."""
    # Two consumers need the summaries (the candidate aggregate and the
    # total-slack scalar); persist the (k+1)·partitions-row frame —
    # kilobytes — so the full input is scanned ONCE, not once per
    # consumer. Evictable/spillable cache, never pinned heap.
    partials = topk_partials(df, col, k).persist()
    # total slack over all partitions: each partition's rows repeat its
    # slack, so take it once per partition via the per-yield grain —
    # rows within one yield share identical (slack) and no other yield
    # interleaves in the SAME task; distinct on (slack) alone would
    # collide across partitions, so carry a per-partition discriminator
    # computed at the source: spark_partition_id() inside the SAME
    # narrow stage that produced the rows.
    partials = partials.withColumn("pid", F.spark_partition_id())
    per_part = partials.groupBy("pid").agg(F.first("slack").alias("slack"))
    total = per_part.agg(
        F.coalesce(F.sum("slack"), F.lit(0)).alias("total_slack")
    )
    cand = partials.groupBy("item").agg(
        F.sum("cnt").alias("lower"),
        F.sum("slack").alias("present_slack"),
    )
    return (
        cand.crossJoin(F.broadcast(total))
        .select(
            "item",
            "lower",
            (F.col("lower") + F.col("total_slack")
             - F.col("present_slack")).alias("upper"),
        )
    )
