"""TPC-H composite shapes, second block (SURVEY.md §5: fixtures are
TPC-H-ish, not TPC-H — no partsupp table, lineitem carries no
commit/receipt dates, so Q2/Q11/Q16/Q20 have no data to stand on and
Q4/Q12/Q21 are re-cut onto the columns that exist; the JOIN/AGG/subquery
shape each query exercises is the point, and is preserved).

Round-2 block (plans/analytics.py) covered Q3/Q5/Q7/Q10/Q18; this one
adds Q4, Q6, Q8, Q12, Q13, Q14, Q15, Q19, Q21, Q22. Every query names
the plan it wants at 100 TB in its docstring: fixed-cardinality dims
broadcast (sf-proportional sides never carry a forced hint — AQE
decides those), facts shuffle at most once on their join key,
aggregates partial map-side.

Reference provenance: the reference's single analytic shape is the
grouped mean (etl.py:377-386); this block is engine surface the
reference's users get on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_finance_spark.catalog import table
from etl_finance_spark.registry import register


@register(
    "q_priority_wait",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q_priority_wait(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (re-cut: no commit/receipt dates, so "late" =
    shipped >90 days after order date): EXISTS over the fact, grouped
    count by priority. The semi join shuffles both sides on orderkey
    once; the count partial-aggregates map-side. At 100 TB the date
    window prunes the orders scan via partition pruning."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-07-01 00:00:00").cast("timestamp_ntz")
    orders = (
        table(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > F.expr("o_orderdate + INTERVAL 90 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@register(
    "q_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """,
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate, the query whole-stage
    codegen should reduce to a single fused pipeline with every
    predicate pushed to the parquet reader and a 1-row partial per
    partition (tests/test_plans.py pins the pushdown)."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


@register(
    "q_market_share",
    oracle="""
    WITH flat AS (
        SELECT year(o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = n1.n_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        JOIN part     ON p_partkey = l_partkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE 0 END) / sum(volume), 6) AS mkt_share
    FROM flat GROUP BY o_year
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: eight-table star with a conditional-share
    aggregate. Only the fixed-cardinality dims (region, nation x2)
    carry broadcast hints; customer, supplier and part are
    sf-proportional so their joins stay plain and AQE decides from
    measured sizes (VERDICT r3). orders joins lineitem on orderkey —
    the only fact-fact shuffle. The share is a single grouped pass
    (CASE inside sum), not two aggregations joined."""
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    cdim = cust.join(
        F.broadcast(n1.join(region, n1.c_rk == region.r_regionkey)),
        cust.c_nationkey == F.col("c_nk"),
    ).select("c_custkey")
    sdim = supp.join(
        F.broadcast(n2), supp.s_nationkey == F.col("s_nk")
    ).select("s_suppkey", "supp_nation")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
    )
    flat = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sdim, li.l_suppkey == sdim.s_suppkey)
        .join(orders.join(cdim, orders.o_custkey == cdim.c_custkey),
              li.l_orderkey == orders.o_orderkey)
    )
    share = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0)
    )
    return flat.groupBy("o_year").agg(
        F.round(F.try_divide(share, F.sum("volume")), 6).alias("mkt_share")
    )


@register(
    "q_shipmode_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (re-cut: no l_shipmode column; l_returnflag is
    the lineitem-side grouping attr): fact-fact join on orderkey with
    conditional counts. Both case-sums fold into ONE grouped pass —
    never two filtered aggregates re-joined."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_orderkey", "l_returnflag")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q_custdist",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: two-level aggregation — orders per customer (left
    join keeps zero-order customers), then the distribution of those
    counts. First groupBy shuffles on custkey (same key as the join, so
    AQE reuses the exchange); the second input is one row per customer
    and collapses map-side."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q_promo_revenue",
    oracle="""
    SELECT round(
        100.0 * sum(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0 END)
        / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional-share aggregate over a dim join; the month
    filter pushes to the lineitem scan and the whole query is one fused
    pipeline plus a 1-row final agg. Part is sf-proportional, so no
    forced broadcast hint — AQE broadcasts it while it measures small
    (VERDICT r3 rule)."""
    lo = F.lit("1996-09-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-10-01 00:00:00").cast("timestamp_ntz")
    li = (
        table(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_partkey",
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .alias("volume"))
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", F.col("volume")).otherwise(0.0)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.try_divide(F.lit(100.0) * promo, F.sum("volume")), 6
            ).alias("promo_pct")
        )
    )


@register(
    "q_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: max-of-aggregate selection. The revenue agg is one
    shuffle on suppkey; its 1-row max broadcasts back (no global sort,
    no window over the whole agg). Ranking by the ROUNDED revenue keeps
    the selected row set identical across engines (SURVEY §7.3 item 4);
    supplier names attach to the (tiny) winners via a plain equi-join —
    supplier is sf-proportional so it carries no forced hint; AQE
    broadcasts whichever side measures small (VERDICT r3 rule)."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp_ntz")
    rev = (
        table(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    best = rev.agg(F.max("total_revenue").alias("mx"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(best), rev.total_revenue == best.mx)
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q_disjunctive_rev",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_disjunctive_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive mixed-table predicates. The join stays a
    single hash join with the OR block as a post-join filter (Catalyst
    can't split it into per-branch pushdowns without a union rewrite);
    what CAN push down — nothing table-local survives the OR here
    except the implicit not-null — stays pushed. Part carries no forced
    broadcast hint (sf-proportional; AQE decides — VERDICT r3 rule)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    s = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#4") & s.between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#17") & s.between(1, 10)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#19") & s.between(1, 15)
           & q.between(20, 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
    )


@register(
    "q_suppliers_waiting",
    oracle="""
    WITH f AS (
        SELECT l_orderkey, l_suppkey, l_shipdate
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
    ), o AS (
        SELECT l_orderkey, max(l_shipdate) AS max_ship,
               count(DISTINCT l_suppkey) AS n_supp
        FROM f GROUP BY l_orderkey
    ), last_lines AS (
        SELECT DISTINCT f.l_orderkey, f.l_suppkey
        FROM f JOIN o ON f.l_orderkey = o.l_orderkey
                     AND f.l_shipdate = o.max_ship
        WHERE o.n_supp >= 2
    ), sole AS (
        SELECT l_orderkey, min(l_suppkey) AS l_suppkey
        FROM last_lines GROUP BY l_orderkey HAVING count(*) = 1
    )
    SELECT s_name, count(*) AS numwait
    FROM sole JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    """,
)
def q_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (re-cut: no commit/receipt dates — "kept the
    order waiting" = sole latest shipper on a finished multi-supplier
    order). The EXISTS / NOT-EXISTS pair decorrelates into per-order
    aggregates: one groupBy computes (max ship, distinct suppliers), a
    join-back finds latest lines, a HAVING count(*)=1 is the NOT EXISTS
    "no one else shipped that day". Everything keys on orderkey — one
    shuffle family — and the final supplier join is plain equi (the
    supplier dim is sf-proportional: no forced hint, AQE decides)."""
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    f = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per_order = f.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("max_ship"),
        F.count_distinct("l_suppkey").alias("n_supp"),
    ).filter(F.col("n_supp") >= 2)
    last_lines = (
        f.join(
            per_order.select("l_orderkey", "max_ship"),
            ["l_orderkey"],
        )
        .filter(F.col("l_shipdate") == F.col("max_ship"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    sole = (
        last_lines.groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("l_suppkey"), F.count("*").alias("n"))
        .filter(F.col("n") == 1)
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(supp, sole.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "q_idle_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global scalar subquery (avg positive balance)
    broadcast as a 1-row cross join, NOT EXISTS as a left-anti join on
    custkey, grouped count per nation. The anti join is the only
    shuffle; at 100 TB orders-side dedup to distinct o_custkey happens
    inside the join's build."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
