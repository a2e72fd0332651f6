"""Streaming joins (the capability tier above windowed aggs).

- **Stream-static enrichment**: each micro-batch joins against a batch
  dimension — no state, the dim broadcasts per batch. The lookup-table
  shape (user → profile) every event pipeline needs.
- **Stream-stream join**: both sides buffered in watermark-bounded
  state; the time-bound condition is what lets Spark evict — an
  unbounded stream-stream join would grow state forever, so the range
  predicate is mandatory, not an optimization (same rule as the batch
  range join at 100 TB).

Both are written against plain DataFrames so the identical function
body runs in batch mode for the equivalence tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(events: DataFrame, dim: DataFrame,
                    on: str = "user_id") -> DataFrame:
    """Stream-static join: per-batch hash join against the (broadcast)
    dimension; null-extending (left) so unknown entities survive."""
    return events.join(F.broadcast(dim), on, "left")


def followed_within(first: DataFrame, second: DataFrame,
                    minutes: int = 60) -> DataFrame:
    """Stream-stream (or batch) pairing: for events of one type, the
    events of another type by the same user within `minutes` after.
    In streaming mode both inputs MUST carry watermarks (the caller
    applies with_watermark) so the join state stays bounded."""
    a = first.select(
        F.col("user_id").alias("a_user"),
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_ts"),
    )
    b = second.select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
    )
    return a.join(
        b,
        (F.col("b_user") == F.col("a_user"))
        & (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {minutes} MINUTES")),
    ).select("a_id", "b_id", "a_user")
