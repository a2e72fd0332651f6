"""Reshaping + subquery operators: pivot/unpivot (the forex wide↔long
pattern generalized), positional explode, regexp rewrite, percentiles,
and correlated subqueries (Catalyst decorrelates them — free, §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_finance_spark.catalog import register_views, table
from etl_finance_spark.registry import register

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "q_pivot",
    oracle="""
    SELECT user_id,
           count(*) FILTER (event_type = 'click') AS click,
           count(*) FILTER (event_type = 'error') AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup') AS signup,
           count(*) FILTER (event_type = 'view') AS view
    FROM events
    GROUP BY user_id
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide (etl.py:398-402's rate-list expansion generalized).
    Pivot values are pinned explicitly — an unpinned pivot runs an extra
    distinct job and is nondeterministic in column order."""
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )


@register(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, amount_kind, amount
    FROM (
        SELECT l_orderkey, l_linenumber,
               unnest(['extended', 'discount', 'tax']) AS amount_kind,
               unnest([l_extendedprice, l_discount, l_tax]) AS amount
        FROM lineitem
    )
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long (the scalable shape for per-currency / per-measure
    windows — see plans/forex.py)."""
    li = table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        [
            F.col("l_extendedprice").alias("extended"),
            F.col("l_discount").alias("discount"),
            F.col("l_tax").alias("tax"),
        ],
        "amount_kind",
        "amount",
    )


@register(
    "q_posexplode",
    oracle="""
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id < 100
    """,
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (token positions — n-gram raw material)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "token"),
    ).withColumn("pos", F.col("pos").cast("long"))


@register(
    "q_regexp_replace",
    oracle="""
    SELECT c_custkey,
           regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked,
           regexp_replace(lower(c_mktsegment), '[aeiou]', '', 'g') AS deveoweled
    FROM customer
    """,
)
def q_regexp_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex rewrite (PII-masking shape in data pipelines)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", "[0-9]+", "#").alias("masked"),
        F.regexp_replace(F.lower(F.col("c_mktsegment")), "[aeiou]", "").alias(
            "deveoweled"
        ),
    )


@register(
    "q_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
           round(min(l_extendedprice), 6) AS lo,
           round(max(l_extendedprice), 6) AS hi
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines interpolate
    linearly). At 100 TB the same query swaps percentile → an
    approx_percentile sketch; kept exact here for the oracle."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 6).alias("p90"),
        F.round(F.min("l_extendedprice"), 6).alias("lo"),
        F.round(F.max("l_extendedprice"), 6).alias("hi"),
    )


@register("q_approx_percentiles", oracle=None)  # WEAK: sketch-based
def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path: KLL-style sketch (approx_percentile)
    instead of the exact sort — mergeable, constant memory. Unit test
    bounds its error against the exact interpolated percentile."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9)), 1000
        ).alias("p50_p90")
    ).select(
        "l_returnflag",
        F.col("p50_p90")[0].alias("p50_approx"),
        F.col("p50_p90")[1].alias("p90_approx"),
    )


@register(
    "q_exists_subquery",
    oracle="""
    SELECT p_partkey, p_brand FROM part p
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45
    )
    """,
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through the SQL entry point — Catalyst
    decorrelates to a left-semi join (verified in the plan)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_brand FROM part p
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45
        )
        """
    )


@register(
    "q_correlated_scalar",
    oracle="""
    WITH nation_avg AS (
        SELECT c_nationkey, avg(c_acctbal) AS nat_avg
        FROM customer GROUP BY c_nationkey
    )
    SELECT c.c_custkey, round(c.c_acctbal, 6) AS acctbal,
           round(n.nat_avg, 6) AS nat_avg
    FROM customer c JOIN nation_avg n ON n.c_nationkey = c.c_nationkey
    WHERE c.c_acctbal > n.nat_avg
    """,
)
def q_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their nation's average balance — the correlated
    scalar-aggregate pattern as an explicit agg+join (the decorrelated
    plan Catalyst would produce; deterministic on both engines)."""
    cust = table(spark, sf_dir, "customer")
    nat_avg = cust.groupBy("c_nationkey").agg(
        F.avg("c_acctbal").alias("nat_avg")
    )
    return (
        cust.join(F.broadcast(nat_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nat_avg"))
        .select(
            "c_custkey",
            F.round("c_acctbal", 6).alias("acctbal"),
            F.round("nat_avg", 6).alias("nat_avg"),
        )
    )


@register(
    "q_explode_outer",
    oracle="""
    SELECT o_orderkey, CAST(u.x AS BIGINT) AS val
    FROM (
        SELECT o_orderkey,
               list_filter([CAST(floor(o_totalprice / 1000) AS BIGINT),
                            CAST(floor(o_totalprice / 100) AS BIGINT),
                            CAST(floor(o_totalprice / 10) AS BIGINT)],
                           x -> x % 3 = 0) AS arr
        FROM orders WHERE o_orderkey % 13 = 0
    )
    LEFT JOIN LATERAL (SELECT unnest(arr) AS x) u ON true
    """,
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer null-preservation semantics: rows whose filtered
    array is EMPTY survive with a NULL element (plain explode silently
    drops them — a row-loss bug class in flattening pipelines; the
    outer variant is the safe default when the parent row must remain
    visible). Map-side only: filter + HOF + generate, no shuffle; the
    oracle mirrors with LEFT JOIN LATERAL unnest."""
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 13 == 0
    )
    arr = F.filter(
        F.array(
            F.floor(F.col("o_totalprice") / 1000).cast("long"),
            F.floor(F.col("o_totalprice") / 100).cast("long"),
            F.floor(F.col("o_totalprice") / 10).cast("long"),
        ),
        lambda x: x % 3 == 0,
    )
    return orders.select(
        "o_orderkey", F.explode_outer(arr).alias("val")
    )
