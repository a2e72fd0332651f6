"""Flagship pipeline: the reference's signature computation, Spark-first.

The reference's core analytic is a lag-1 percent change over a financial
time series (/root/reference/etl.py:166-170 for stocks, 418-422 for
forex) followed by a keyed load. Transplanted to the fixture schema:
per-user lag-1 percent change over `events.value`, rolled up into an
hourly tumbling aggregate per event type (SURVEY.md §7.1 step 2).

Scale notes (100 TB): the window partitions by `user_id` (never a global
sort — the reference's global shift over the concatenated frame,
etl.py:166, is exactly the anti-pattern; SURVEY.md R-WIN-1); the rollup
is a hash aggregate with map-side partials; both stages share the
event-scan and Catalyst prunes the scan to the five referenced columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_finance_spark.catalog import table
from etl_finance_spark.registry import register

_ORACLE = """
WITH lagged AS (
    SELECT
        event_type,
        date_trunc('hour', ts) AS hour_ts,
        value,
        coalesce(
            value / nullif(lag(value) OVER (
                PARTITION BY user_id
                ORDER BY date_trunc('microseconds', ts), event_id
            ), 0.0) - 1,
            0.0
        ) AS pct_change
    FROM events
)
SELECT
    CAST(floor(epoch(hour_ts)) AS BIGINT) AS hour_epoch,
    event_type,
    count(*) AS n_events,
    round(avg(pct_change), 6) AS avg_pct_change,
    round(sum(value), 6) AS sum_value
FROM lagged
GROUP BY 1, 2
"""


def pct_change_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → per-user lag-1 pct change → hourly tumbling rollup."""
    events = table(spark, sf_dir, "events")
    # Tiebreak on event_id so the row order (hence lag) is deterministic;
    # the oracle truncates ts to microseconds to match Spark's timestamp
    # precision (SURVEY.md §7.3 item 2).
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = events.select(
        F.col("event_type"),
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
        F.col("value"),
        # try_divide: a zero previous value yields null → 0 (ANSI `/`
        # raises; DuckDB `/` returns NULL — try_divide matches it)
        F.coalesce(
            F.try_divide(F.col("value"), F.lag("value", 1).over(w)) - F.lit(1.0),
            F.lit(0.0),
        ).alias("pct_change"),
    )
    return lagged.groupBy(
        F.unix_timestamp("hour_ts").alias("hour_epoch"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("pct_change"), 6).alias("avg_pct_change"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


register("q_pct_change_hourly", oracle=_ORACLE)(pct_change_hourly_rollup)
