"""Set operations (SURVEY.md §2.2): ALL vs DISTINCT variants pinned
explicitly on both engines. q_union_all lives in operators.core
(R-UNION-1); these are the distinct-semantics family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_finance_spark.catalog import table
from etl_finance_spark.registry import register


def _cust_nations(spark, sf_dir) -> DataFrame:
    return table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark, sf_dir) -> DataFrame:
    return table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@register(
    "q_union_by_name",
    oracle="""
    SELECT c_custkey AS entity_id, c_acctbal AS balance, NULL AS size
    FROM customer WHERE c_custkey <= 50
    UNION ALL BY NAME
    SELECT p_partkey AS entity_id, p_size AS size
    FROM part WHERE p_partkey <= 50
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: frames with different column sets align
    by NAME, absent columns null-fill (unionByName allowMissingColumns ↔
    DuckDB UNION ALL BY NAME) — the append-only ingestion shape when a
    source adds fields."""
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 50)
        .select(
            F.col("c_custkey").alias("entity_id"),
            F.col("c_acctbal").alias("balance"),
        )
    )
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 50)
        .select(
            F.col("p_partkey").alias("entity_id"),
            F.col("p_size").alias("size"),
        )
    )
    return cust.unionByName(part, allowMissingColumns=True)


@register(
    "q_gap_fill",
    oracle="""
    WITH bounds AS (
        SELECT CAST(min(date_trunc('day', ts)) AS DATE) AS lo,
               CAST(max(date_trunc('day', ts)) AS DATE) AS hi
        FROM events
    ), spine AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL '1 day')) AS DATE)
            AS day
        FROM bounds
    ), daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    )
    SELECT spine.day, coalesce(daily.n, 0) AS n_purchases
    FROM spine LEFT JOIN daily USING (day)
    """,
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap fill: days with no events appear with 0 (the
    reference's forex series implicitly assumed a dense daily grid —
    this operator makes the grid explicit). The spine generates from a
    broadcast 1-row bounds agg; no driver round-trip."""
    events = table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    bounds = events.agg(
        F.min(day).alias("lo"), F.max(day).alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 day"))
        ).alias("day")
    )
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(day.alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return spine.join(daily, "day", "left").select(
        "day", F.coalesce(F.col("n"), F.lit(0)).alias("n_purchases")
    )


@register(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).union(
        _supp_nations(spark, sf_dir)
    ).distinct()


@register(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@register(
    "q_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # subtract == EXCEPT DISTINCT (exceptAll would keep a key whose
    # left multiplicity merely exceeds the right's — different op).
    return _cust_nations(spark, sf_dir).subtract(_supp_nations(spark, sf_dir))
