"""TPC-H composite shapes, third block — completes the 22-query sweep.

Round-2 covered Q3/Q5/Q7/Q10/Q18 (plans/analytics.py), round-3's first
block Q4/Q6/Q8/Q12/Q13/Q14/Q15/Q19/Q21/Q22 (plans/tpch2.py). This block
re-cuts the remaining Q1/Q2/Q9/Q11/Q16/Q17/Q20 onto the fixture columns
(no partsupp table: part-supplier relationships derive from lineitem,
supply cost / stock from p_retailprice / shipped quantities). As with
tpch2, the JOIN/AGG/subquery SHAPE each query exercises is the point —
scan-heavy full-table agg (Q1), correlated min + join-back (Q2),
multi-dim profit rollup (Q9), scalar-subquery HAVING (Q11),
anti-join + count-distinct (Q16), correlated per-group avg (Q17),
nested semi-join chain (Q20).

Reference provenance: none — engine surface beyond the reference's
grouped mean (etl.py:377-386), same mandate as tpch2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_finance_spark.catalog import table
from etl_finance_spark.registry import register


@register(
    "q_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
               AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1, the canonical scan-heavy aggregate: one filtered pass
    over the biggest fact, grouped into a handful of (returnflag,
    linestatus) cells. The whole query is a single WholeStageCodegen
    pipeline — predicate pushed to parquet, eight partial aggregates
    per partition, one 4-row exchange. At 100 TB this is bandwidth-
    bound by design; nothing to tune beyond scan parallelism."""
    cutoff = F.lit("2000-09-01 00:00:00").cast("timestamp_ntz")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2)
            .alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               round(avg(l_extendedprice / l_quantity), 6) AS unit_cost
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN region   ON r_regionkey = n_regionkey
        WHERE r_name = 'REGION_0'
        GROUP BY l_partkey, l_suppkey
    ), best AS (
        SELECT l_partkey, l_suppkey, unit_cost,
               row_number() OVER (
                   PARTITION BY l_partkey ORDER BY unit_cost, l_suppkey
               ) AS rn
        FROM cost
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, unit_cost
    FROM best
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE rn = 1 AND p_size = 11
    """,
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp: supply cost = a supplier's average
    unit price on lineitem, region-scoped): correlated-min subquery —
    for each part, the cheapest regional supplier — then join back for
    supplier/nation/part attributes. The min is a min-of-struct
    aggregate keyed by (rounded cost, suppkey), not a window: partials
    collapse map-side and the tiebreak stays deterministic. The
    region-scoped supplier frame and the size-filtered part are both
    sf-proportional, so neither carries a forced broadcast hint — AQE
    broadcasts them while they measure small (VERDICT r3 rule). The
    only fact shuffle is the (partkey, suppkey) cost rollup. Cost
    rounds 6dp BEFORE the argmin so both engines pick the same
    supplier."""
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").filter(F.col("r_name") == "REGION_0")
    regional = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    cost = (
        li.join(regional, li.l_suppkey == regional.s_suppkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.round(
                F.avg(F.try_divide("l_extendedprice", "l_quantity")), 6
            ).alias("unit_cost")
        )
    )
    best = (
        cost.groupBy("l_partkey")
        .agg(F.min(F.struct("unit_cost", "l_suppkey")).alias("b"))
        .select(
            "l_partkey",
            F.col("b.l_suppkey").alias("l_suppkey"),
            F.col("b.unit_cost").alias("unit_cost"),
        )
    )
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 11)
        .select("p_partkey", "p_type")
    )
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .join(regional, best.l_suppkey == regional.s_suppkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
                "unit_cost")
    )


@register(
    "q_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)
                     - 0.1 * p_retailprice * l_quantity), 2) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%re%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (supply cost re-cut as 10% of retail price):
    profit on a part-name-filtered slice, rolled up by supplier nation
    x order year. Only nation (25 rows, fixed) carries a broadcast
    hint; the LIKE-filtered part and supplier are sf-proportional, so
    their joins stay plain and AQE decides (VERDICT r3 rule). lineitem
    shuffles once on orderkey to meet orders (the one fact-fact join).
    Profit partial-aggregates map-side into |nations| x |years| cells."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%re%"))
        .select("p_partkey", "p_retailprice")
    )
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = F.broadcast(
        table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


@register(
    "q_important_stock",
    oracle="""
    WITH v AS (
        SELECT l_partkey, sum(l_extendedprice) AS value
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
    )
    SELECT l_partkey, round(value, 2) AS value
    FROM v
    WHERE value > (SELECT 0.001 * sum(value) FROM v)
    """,
)
def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (stock value re-cut as shipped lineitem value
    from one nation's suppliers): per-part value filtered against a
    fraction of the SAME aggregate's grand total — the scalar-subquery-
    in-HAVING pattern. The grand total is a 1-row broadcast cross join
    over the per-part rollup, so the fact aggregates once and the
    threshold never forces a second scan. The nation-scoped supplier
    frame is sf-proportional — no forced hint on that join (VERDICT r3
    rule). The UNROUNDED value feeds both the threshold and the
    comparison (matching the oracle exactly); rounding happens only at
    projection."""
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_sup = sup.join(
        F.broadcast(nat), sup.s_nationkey == nat.n_nationkey
    ).select("s_suppkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    v = (
        li.join(nat_sup, li.l_suppkey == nat_sup.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    tot = v.agg((0.001 * F.sum("value")).alias("threshold"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", F.round("value", 2).alias("value"))
    )


@register(
    "q_supplier_cnt",
    oracle="""
    WITH ps AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'ECONOMY%'
      AND p_size IN (5, 11, 17, 23, 29, 35, 41, 47)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp re-cut as distinct lineitem
    part-supplier pairs; "complaint" suppliers re-cut as negative
    account balance): per-(brand, type, size) distinct-supplier counts
    with a NOT-IN exclusion expressed as a left-anti join. The
    blocklist and the filtered part are both sf-proportional slices,
    so neither carries a forced broadcast hint (VERDICT r3 rule — AQE
    broadcasts them while small).

    No standalone (partkey, suppkey) distinct (r14, guide §2.4): the
    count-distinct rewrite already dedups on (brand, type, size,
    suppkey) with map-side partials, and count(DISTINCT) is invariant
    under row multiplicity through the joins — so the pre-distinct was
    a full extra exchange of the fact for nothing, and it forced the
    fact to shuffle BEFORE the selective part filter could prune it."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    ps = li
    bad = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    part = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (~F.col("p_type").like("ECONOMY%"))
            & (F.col("p_size").isin(5, 11, 17, 23, 29, 35, 41, 47))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        ps.join(bad, ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, ps.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "q_small_qty_revenue",
    oracle="""
    WITH t AS (
        SELECT l_partkey, round(0.2 * avg(l_quantity), 6) AS qty_cut
        FROM lineitem GROUP BY l_partkey
    )
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN t USING (l_partkey)
    WHERE p_brand = 'Brand#3' AND l_quantity < qty_cut
    """,
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders — each row
    compares against ITS part's average quantity (correlated aggregate,
    expressed as aggregate-then-join-back so the fact is scanned twice
    but shuffled on partkey only once each). The per-part cut rounds
    6dp before the comparison so the boundary is bit-identical across
    engines. The brand-filtered part is an sf-proportional slice — no
    forced hint (AQE decides); final sum is a 1-row reduce."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    cuts = li.groupBy("l_partkey").agg(
        F.round(0.2 * F.avg("l_quantity"), 6).alias("qty_cut")
    )
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(cuts, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


@register(
    "q_excess_suppliers",
    oracle="""
    WITH demand AS (
        SELECT l_partkey, round(0.5 * sum(l_quantity), 2) AS half_demand
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_partkey
    ), supplied AS (
        SELECT l_partkey, l_suppkey, round(sum(l_quantity), 2) AS qty
        FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
        )
        GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s_name, s_acctbal
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_1'
      AND s_suppkey IN (
          SELECT l_suppkey FROM supplied
          JOIN demand USING (l_partkey)
          WHERE qty > half_demand
      )
    """,
)
def q_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (availqty re-cut as a supplier's total shipped
    quantity; the threshold is half the part's 1996 demand): the nested
    semi-join chain — suppliers IN (pairs over parts IN (name filter)).
    Both IN-subqueries become left-semi joins; the name-filtered part
    and the fact-derived qualifying supplier ids are sf-proportional,
    so neither carries a forced broadcast hint (VERDICT r3 rule — AQE
    broadcasts the semi sides while they measure small). Quantities
    round 2dp on both sides of the threshold so the comparison is
    engine-stable. The fact shuffles once per rollup on its group key,
    nothing else."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    demand = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_partkey")
        .agg(F.round(0.5 * F.sum("l_quantity"), 2).alias("half_demand"))
    )
    red_parts = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    supplied = (
        li.join(red_parts, li.l_partkey == red_parts.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
    )
    qualifying = (
        supplied.join(demand, "l_partkey")
        .filter(F.col("qty") > F.col("half_demand"))
        .select("l_suppkey")
    )
    sup = table(spark, sf_dir, "supplier")
    nat = F.broadcast(
        table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    )
    return (
        sup.join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(
            qualifying,
            sup.s_suppkey == qualifying.l_suppkey,
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .distinct()
    )
