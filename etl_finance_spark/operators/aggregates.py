"""Aggregation operators (SURVEY.md §2.2).

Hash-stability policy (SURVEY.md §7.3 item 1): sums of large-magnitude
doubles round to 2 decimals (a 1e8-scale sum rounded to 6dp sits at the
edge of double precision, where summation order could flip the hash);
averages and unit-scale values round to 6. Integer-valued double sums
(l_quantity) are exact in double arithmetic regardless of order (< 2^53)
so they stay unrounded.

Scale posture: every groupBy here partial-aggregates map-side before the
shuffle (Spark's HashAggregate does this for all built-in aggs), so the
shuffle carries one row per (partition × group), not per input row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_finance_spark.catalog import table, register_views
from etl_finance_spark.registry import register


@register(
    "q_agg_groupby",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           sum(l_quantity) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (SURVEY.md §5: fixtures are TPC-H-ish, not TPC-H)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q_agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(DISTINCT l_partkey) AS n_parts
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


@register(
    "q_agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) > 10
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 10)
    )


@register(
    "q_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals; sum over integer-valued doubles is exact."""
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_agg_gsets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def q_agg_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL entry point (same Catalyst plan as the
    DataFrame cube/rollup — demonstrates the engine's second API)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "q_agg_collect_sorted",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list(c_custkey)), ',') AS custkeys
    FROM customer
    WHERE c_custkey <= 200
    GROUP BY c_nationkey
    """,
)
def q_agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list is partition-order-nondeterministic → always
    sort_array before exposing (SURVEY.md §7.3 item 3). Joined to a
    string so the hash sees a scalar."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return cust.groupBy("c_nationkey").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("c_custkey")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("custkeys")
    )


@register(
    "q_bool_aggs",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity < 50) AS all_small,
           bool_or(l_discount > 0.09) AS any_big_disc,
           CAST(count_if(l_tax = 0.0) AS BIGINT) AS n_taxfree
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any/count_if) — data-quality assertion
    aggregates, evaluated map-side like any other partial agg."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") < 50).alias("all_small"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_big_disc"),
        F.count_if(F.col("l_tax") == 0.0).alias("n_taxfree"),
    )


@register("q_agg_approx_distinct", oracle=None)  # WEAK: sketch differs from DuckDB
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB path for cardinality
    (exact distinct shuffles every key; the sketch is mergeable and
    constant-size). Unit test bounds its error vs exact count."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
    )


@register(
    "q_histogram",
    oracle="""
    SELECT CAST(floor((l_quantity - 1) / 5) AS BIGINT) AS bin_id,
           1 + 5 * CAST(floor((l_quantity - 1) / 5) AS BIGINT) AS bin_lo,
           count(*) AS n
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (width_bucket shape): bin assignment is a
    map-side floor-divide, counts combine partially before the shuffle —
    the constant-memory profile pass every ingest pipeline runs first.
    Bin edges are integers so the floor is exact on both engines."""
    li = table(spark, sf_dir, "lineitem")
    bin_id = F.floor((F.col("l_quantity") - 1) / 5).cast("long")
    return (
        li.withColumn("bin_id", bin_id)
        .groupBy("bin_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin_id", (F.lit(1) + F.lit(5) * F.col("bin_id")).alias("bin_lo"), "n"
        )
    )


@register(
    "q_latest_per_key",
    oracle="""
    SELECT user_id, event_id AS last_event_id, value AS last_value
    FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY date_trunc('microseconds', ts) DESC,
                            event_id DESC
               ) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest record per key — the CDC-compaction / sessionstate shape.
    Implemented as max-of-struct, NOT the row_number window the oracle
    uses: the struct max partial-aggregates map-side (the shuffle
    carries one candidate per key per input partition), where a window
    must shuffle and sort every row. Lexicographic struct order (ts,
    then unique event_id) matches the window's DESC/DESC ordering."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.max(F.struct("ts", "event_id", "value")).alias("last")
        )
        .select(
            "user_id",
            F.col("last.event_id").alias("last_event_id"),
            F.col("last.value").alias("last_value"),
        )
    )


@register(
    "q_skew_distinct",
    oracle="""
    SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_skew_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant exact distinct: COUNT(DISTINCT) on a hot group
    funnels that group's entire key set through one reducer; salting by
    a deterministic function OF THE DISTINCT KEY (suppkey % 16) keeps
    each key in exactly one salt bucket, so per-(group, salt) distincts
    sum to the true per-group distinct while the hot group fans across
    16 reducers. Same two-phase shape AQE's skew mitigation cannot
    apply to distinct aggregates on its own."""
    li = table(spark, sf_dir, "lineitem")
    salted = li.select(
        "l_returnflag", "l_suppkey",
        F.pmod(F.col("l_suppkey"), F.lit(16)).alias("salt"),
    )
    per_salt = salted.groupBy("l_returnflag", "salt").agg(
        F.countDistinct("l_suppkey").alias("nd")
    )
    return per_salt.groupBy("l_returnflag").agg(
        F.sum("nd").alias("n_suppliers")
    )


@register(
    "q_agg_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with grouping_id — the disambiguator that tells a real NULL
    group from a rollup subtotal row (without it cube output is
    ambiguous for nullable keys). Bit order (left key = MSB) matches
    the SQL standard on both engines."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_median_by_group",
    oracle="""
    SELECT l_returnflag,
           round(median(l_quantity), 6) AS med_qty,
           round(median(l_extendedprice), 6) AS med_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_median_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median per group (the 50th percentile special-case both
    engines implement natively; interpolation arithmetic is identical
    double math so 6dp rounding is stable). Memory model at scale:
    Spark's exact percentile aggregates a per-group counts-map keyed
    by DISTINCT value (l_quantity has 50), not a buffer of all rows —
    mergeable and spillable, but O(distinct-values-per-group); the
    unbounded-cardinality path is the q_approx_percentiles /
    q_kll_quantiles sketch twins."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("med_qty"),
        F.round(F.median("l_extendedprice"), 6).alias("med_price"),
    )


@register(
    "q_corr_covar",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) + 0.0 AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 2) + 0.0
               AS qty_price_cov,
           round(covar_pop(l_discount, l_tax), 6) + 0.0 AS disc_tax_cov
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics (corr / sample + population covariance) —
    single-pass mergeable moment aggregates, the same partial-agg
    profile as sum/avg. Covariance of 1e4-scale values rounds 2dp
    (magnitude rule); correlation and the small-scale covariance
    round 6. The ``+ 0.0`` canonicalizes IEEE negative zero: a ~-1e-9
    covariance rounds to -0.0 on one engine and 0.0 on the other,
    which hashes (and sorts) differently."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (F.round(F.corr("l_quantity", "l_extendedprice"), 6) + F.lit(0.0))
        .alias("qty_price_corr"),
        (F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2) + F.lit(0.0))
        .alias("qty_price_cov"),
        (F.round(F.covar_pop("l_discount", "l_tax"), 6) + F.lit(0.0))
        .alias("disc_tax_cov"),
    )


@register(
    "q_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS distinct_direct,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS distinct_rollup
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct count via bitmaps — the precise
    counterpart of the HLL rung (operators/sketches.py): keys bucket
    into fixed 32k-bit bitmaps (`bitmap_bucket_number` /
    `bitmap_bit_position`), per-bucket bitmaps OR together under
    re-aggregation, and `bitmap_count` reads the cardinality back.
    Two paths computed side by side and oracle-checked equal:
    `distinct_direct` (bitmaps built at (priority, bucket) grain) and
    `distinct_rollup` (bitmaps persisted at (priority, status, bucket)
    grain, then `bitmap_or_agg`'d up — the incremental-rollup path).
    vs count(DISTINCT): the shuffle carries one bitmap per bucket
    instead of every distinct key; vs HLL: exact, but bitmap size
    scales with the key domain rather than staying 4 KB. Dense ids →
    bitmaps; huge sparse domains → sketches."""
    orders = table(spark, sf_dir, "orders")
    direct = (
        orders.groupBy(
            "o_orderpriority",
            F.bitmap_bucket_number("o_custkey").alias("bkt"),
        )
        .agg(
            F.bitmap_construct_agg(
                F.bitmap_bit_position("o_custkey")
            ).alias("bm")
        )
        .groupBy("o_orderpriority")
        .agg(F.sum(F.bitmap_count("bm")).alias("distinct_direct"))
    )
    rollup = (
        orders.groupBy(
            "o_orderpriority", "o_orderstatus",
            F.bitmap_bucket_number("o_custkey").alias("bkt"),
        )
        .agg(
            F.bitmap_construct_agg(
                F.bitmap_bit_position("o_custkey")
            ).alias("bm")
        )
        .groupBy("o_orderpriority", "bkt")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy("o_orderpriority")
        .agg(F.sum(F.bitmap_count("bm")).alias("distinct_rollup"))
    )
    return direct.join(rollup, "o_orderpriority")


@register(
    "q_mode_by_group",
    oracle="""
    WITH c AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY 1, 2
    ), r AS (
        SELECT *, row_number() OVER (
            PARTITION BY o_orderstatus
            ORDER BY n DESC, o_orderpriority DESC) AS rn
        FROM c
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority,
           CAST(n AS BIGINT) AS n
    FROM r WHERE rn = 1
    """,
)
def q_mode_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: built-in `mode()` picks an ARBITRARY value
    on ties, so the declared form is count + max-of-struct — ties
    break to the lexicographically largest value, pinned identically
    in the oracle's (n DESC, value DESC) ranking. Two aggregates whose
    partials both collapse map-side; the max-of-struct is the same
    argmax compaction as q_latest_per_key, never a per-group sort."""
    orders = table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    return (
        counts.groupBy("o_orderstatus")
        .agg(F.max(F.struct("n", "o_orderpriority")).alias("top"))
        .select(
            "o_orderstatus",
            F.col("top.o_orderpriority").alias("mode_priority"),
            F.col("top.n").cast("long").alias("n"),
        )
    )


@register(
    "q_moments",
    oracle="""
    WITH m AS (
        SELECT l_returnflag, avg(l_extendedprice) AS mu
        FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag,
        (round(avg((l_extendedprice - mu) ^ 3)
               / avg((l_extendedprice - mu) ^ 2) ^ 1.5, 6) + 0.0)
            AS skew_pop,
        (round(avg((l_extendedprice - mu) ^ 4)
               / avg((l_extendedprice - mu) ^ 2) ^ 2 - 3, 6) + 0.0)
            AS kurt_excess
    FROM lineitem JOIN m USING (l_returnflag)
    GROUP BY l_returnflag
    """,
)
def q_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher central moments per group: population skewness and
    excess kurtosis — single-pass streaming-moment aggregates in Spark
    (same mergeable partial-agg profile as variance). The oracle can't
    use DuckDB's skewness/kurtosis (sample-corrected: diverges at 6dp
    for small groups), so it states Spark's population definitions
    explicitly as centered moments with a two-pass mean — the formula
    IS the semantic contract. +0.0 guards IEEE -0.0 on the near-zero
    skew values."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (F.round(F.skewness("l_extendedprice"), 6) + F.lit(0.0))
        .alias("skew_pop"),
        (F.round(F.kurtosis("l_extendedprice"), 6) + F.lit(0.0))
        .alias("kurt_excess"),
    )


@register(
    "q_regr_ols",
    oracle="""
    SELECT l_returnflag,
        round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        round(regr_intercept(l_extendedprice, l_quantity), 6)
            AS intercept,
        (round(regr_r2(l_extendedprice, l_quantity), 6) + 0.0) AS r2,
        CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_regr_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares regression as AGGREGATES
    (regr_slope/intercept/r2/count) — the in-database OLS both engines
    define identically from covariance/variance partials, so the fit
    distributes exactly like var/covar: one pass, map-side partials,
    no feature matrix materialized. The trend-line rung under
    q_corr_covar (direction + strength → actual fit)."""
    li = table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        (F.round(F.regr_r2(y, x), 6) + F.lit(0.0)).alias("r2"),
        F.regr_count(y, x).cast("long").alias("n"),
    )
