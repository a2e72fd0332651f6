"""Mergeable-sketch aggregates (Apache DataSketches, built into Spark
4.x): HLL distinct-count, theta set-operation estimates, and KLL
quantile sketches.

These are THE 100 TB cardinality/quantile story: each executor builds a
few-KB sketch over its partition map-side, the shuffle moves sketches
(not rows), and sketches from yesterday's partitions union with today's
without rescanning — the re-aggregation property exact distinct counts
fundamentally lack. Every query here keeps the sketch JVM-side
(``hll_sketch_agg`` → ``hll_union_agg`` → ``hll_sketch_estimate`` are
Catalyst expressions inside whole-stage codegen); Python never sees a
sketch buffer.

Estimates are engine-specific (DataSketches layouts have no DuckDB
analog), so these register ``oracle=None`` (driver rows-only) and carry
the real verification in unit tests: error-bound vs exact, and the
union-of-partials == direct-sketch identity that justifies the design
(tests/test_sketches.py).

Reference provenance: none — /root/reference/etl.py has no approximate
aggregates; engine-surface mandate (SURVEY.md §2.2 sketch tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_finance_spark.catalog import table
from etl_finance_spark.registry import register


def hll_distinct_by(df: DataFrame, keys: list[str], col: str,
                    lg_k: int = 12) -> DataFrame:
    """Per-group HLL distinct estimate. lgConfigK=12 → 4 KB sketch,
    ~1.6% RSE — the size/accuracy point that lets a 1000-executor
    job ship one sketch per (group, partition) through the shuffle."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(col), F.lit(lg_k))
        ).alias("approx_distinct")
    )


@register("q_hll_distinct", oracle=None)  # WEAK: DataSketches estimate
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order priority, HLL-sketched, alongside
    the exact count and the relative error. One shuffle of 4 KB
    sketches; the exact column exists only to expose the error to the
    rows-only driver check and the bound test — the production plan is
    the sketch alone. Output is 5 stable rows."""
    orders = table(spark, sf_dir, "orders")
    sk = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("o_custkey", F.lit(12))
        ).alias("approx_customers"),
        F.count_distinct("o_custkey").alias("exact_customers"),
    )
    return sk.select(
        "o_orderpriority",
        "approx_customers",
        "exact_customers",
        F.round(
            F.abs(F.col("approx_customers") - F.col("exact_customers"))
            / F.col("exact_customers"), 4
        ).alias("rel_err"),
    )


@register("q_hll_union", oracle=None)  # WEAK: DataSketches estimate
def q_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch re-aggregation: build per-(priority, status) HLL sketches
    of custkeys — the grain a daily rollup would persist — then
    hll_union_agg them up to per-priority and estimate. At 100 TB this
    is the plan that answers "distinct users this quarter" from 90
    daily sketch rows instead of re-scanning a quarter of raw data.
    The union path routes through HLL_8 internally so it is not
    bit-identical to a direct sketch — tests/test_sketches.py asserts
    it hits the exact count within the same published bound."""
    orders = table(spark, sf_dir, "orders")
    cell = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey", F.lit(12)).alias("sk")
    )
    return (
        cell.groupBy("o_orderpriority")
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg("sk", F.lit(False))
            ).alias("approx_customers"),
            F.count("*").cast("long").alias("cells_merged"),
        )
    )


@register("q_theta_setops", oracle=None)  # WEAK: DataSketches estimate
def q_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches support the set algebra HLL can't: estimate the
    OVERLAP and DIFFERENCE of customer populations between order
    statuses, without materializing either set. Build one theta sketch
    per status (map-side partial, few KB), then cross the sketch pair
    through theta_union / theta_intersection / theta_difference —
    driver never sees a custkey. The scale use-case is audience
    overlap across 100 TB of event partitions: sketches persist
    per-partition, set algebra runs on the sketch table.

    Below the default nominal-entries threshold (4096) theta sketches
    are in exact mode, which the unit test pins: at sf0.01 every
    estimate here equals the true set cardinality."""
    orders = table(spark, sf_dir, "orders")
    sk = orders.groupBy("o_orderstatus").agg(
        F.theta_sketch_agg("o_custkey").alias("sk")
    )
    a = sk.filter(F.col("o_orderstatus") == "F").select(
        F.col("sk").alias("sk_f"))
    b = sk.filter(F.col("o_orderstatus") == "O").select(
        F.col("sk").alias("sk_o"))
    pair = a.crossJoin(b)  # 1×1
    return pair.select(
        F.theta_sketch_estimate(F.col("sk_f")).alias("customers_f"),
        F.theta_sketch_estimate(F.col("sk_o")).alias("customers_o"),
        F.theta_sketch_estimate(
            F.theta_union(F.col("sk_f"), F.col("sk_o"))
        ).alias("customers_either"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("sk_f"), F.col("sk_o"))
        ).alias("customers_both"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("sk_f"), F.col("sk_o"))
        ).alias("customers_f_only"),
    )


@register("q_kll_quantiles", oracle=None)  # WEAK: DataSketches estimate
def q_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-mergeable quantiles: KLL sketch over lineitem extended
    price per return flag, queried at p50/p90/p99. Unlike exact
    percentile (full sort of every group) or percentile_approx
    (Greenwald-Khanna, no union operator), KLL partials union across
    partitions AND across time — the incremental-rollup quantile. The
    rank-error bound (k=200 → ~1.65% @ 99% confidence) is asserted
    against exact percentiles in tests/test_sketches.py."""
    li = table(spark, sf_dir, "lineitem")
    sk = li.groupBy("l_returnflag").agg(
        F.kll_sketch_agg_double("l_extendedprice", F.lit(200)).alias("sk"),
        F.count("*").cast("long").alias("n_rows"),
    )
    return sk.select(
        "l_returnflag",
        "n_rows",
        F.round(F.kll_sketch_get_quantile_double(
            F.col("sk"), F.lit(0.5)), 2).alias("p50"),
        F.round(F.kll_sketch_get_quantile_double(
            F.col("sk"), F.lit(0.9)), 2).alias("p90"),
        F.round(F.kll_sketch_get_quantile_double(
            F.col("sk"), F.lit(0.99)), 2).alias("p99"),
    )
