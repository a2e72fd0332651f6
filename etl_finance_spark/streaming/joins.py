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
    """Stream-static join: per-batch hash join against the dimension;
    null-extending (left) so unknown entities survive. No forced
    broadcast hint — a user-profile dim grows with the user base, so
    at 100 TB a pinned hint is a broadcast-OOM (the same class as the
    swept composite/TPC-H hints); Spark still picks broadcast per
    micro-batch whenever the dim's measured size is under
    autoBroadcastJoinThreshold, and a caller with a known-bounded dim
    can pass ``F.broadcast(dim)`` explicitly."""
    return events.join(dim, on, "left")


def followed_within(first: DataFrame, second: DataFrame,
                    minutes: int = 60, how: str = "inner") -> DataFrame:
    """Stream-stream (or batch) pairing: for events of one type, the
    events of another type by the same user within `minutes` after.
    In streaming mode both inputs MUST carry watermarks (the caller
    applies with_watermark) so the join state stays bounded.

    ``how="left_outer"`` adds the unmatched-firsts tier (funnels need
    the views that did NOT convert, not just the ones that did). In
    batch mode nulls pad immediately; in streaming mode an unmatched
    row can only emit once it can never match — when the watermark
    passes ``first.ts + minutes`` and its state evicts, so EVICTION IS
    EMISSION and results trail the watermark by the join window. The
    time-range condition doubles as the state bound on both sides:
    seconds are kept until the watermark passes their own ts, firsts
    until their match deadline (tests/test_streaming.py pins both the
    eviction-driven emission and that still-matchable firsts stay
    pending rather than emitting early)."""
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
        how,
    ).select("a_id", "b_id", "a_user")


# ---------------------------------------------------------------------------
# Declared query (batch form — the identical function body runs in
# streaming mode in tests/test_streaming.py's equivalence tests)
# ---------------------------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402

from etl_finance_spark.catalog import table  # noqa: E402
from etl_finance_spark.registry import register  # noqa: E402


@register(
    "q_stream_pair_join",
    oracle="""
    SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id AS a_user
    FROM events a
    JOIN events b
      ON b.user_id = a.user_id
     AND date_trunc('microseconds', b.ts) > date_trunc('microseconds', a.ts)
     AND date_trunc('microseconds', b.ts)
         <= date_trunc('microseconds', a.ts) + INTERVAL '60 minutes'
    WHERE a.event_type = 'view' AND b.event_type = 'click'
    """,
)
def q_stream_pair_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream pairing declared in batch form: clicks within 60
    minutes after a view by the same user. The equi-join carries the
    plan (user_id), the time band is a post-filter — in streaming mode
    the same band is what bounds the join state (see followed_within)."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view")
    clicks = ev.filter(F.col("event_type") == "click")
    return followed_within(views, clicks, minutes=60)


@register(
    "q_stream_pair_outer",
    oracle="""
    SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id AS a_user
    FROM events a
    LEFT JOIN events b
      ON b.user_id = a.user_id
     AND b.event_type = 'click'
     AND date_trunc('microseconds', b.ts) > date_trunc('microseconds', a.ts)
     AND date_trunc('microseconds', b.ts)
         <= date_trunc('microseconds', a.ts) + INTERVAL '60 minutes'
    WHERE a.event_type = 'view'
    """,
)
def q_stream_pair_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unmatched-firsts tier of the stream-stream pairing (funnel
    semantics: views that did NOT convert emit with NULL b_id). Batch
    form of followed_within(how="left_outer"); in streaming mode the
    identical body emits an unmatched view only when the watermark
    passes its match deadline and its state evicts — eviction IS
    emission (pinned in tests/test_streaming.py). The b-side type
    filter lives INSIDE the join (pre-filtered input here, ON-clause
    predicate in the oracle) — under LEFT JOIN a WHERE on the b side
    would silently turn it back into an inner join."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view")
    clicks = ev.filter(F.col("event_type") == "click")
    return followed_within(views, clicks, minutes=60, how="left_outer")
