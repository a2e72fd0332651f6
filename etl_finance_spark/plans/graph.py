"""Shared co-purchase graph build (used by q_copurchase_pairs,
q_pagerank, q_triangle_count).

Three declared queries analyze the same graph: parts are linked when
they appear together in at least ``MIN_ORDERS`` orders. Rebuilding that
edge rollup per query repeats the most expensive part of each plan (the
order-keyed self-join + pair aggregation) three times — a shared
dimension/graph build is materialized ONCE in any real warehouse and
every consumer reads the materialization. This helper is that seam:

- one canonical edge frame ``(p1, p2, n_orders)`` (p1 < p2, threshold
  applied), built with the order-keyed self-join (pair fan-out bounded
  by basket size squared, never keyed on the part — the skew-safe
  orientation);
- ``.persist()``-ed (MEMORY_AND_DISK — evictable and spillable, unlike
  a checkpoint) and memoized per (applicationId, sf_dir), so the three
  consumers share one cache entry instead of three rebuilds;
- consumers project/reorient it (copurchase keeps the count, triangle
  and PageRank take the oriented/symmetrized id pairs).

At 100 TB the memo is the hook where the edge list becomes a bucketed
table maintained incrementally; the query shapes downstream do not
change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_finance_spark.catalog import table
from etl_finance_spark.memo import session_memo

MIN_ORDERS = 2  # co-purchase edge threshold shared by all three consumers

_EDGE_MEMO: dict[tuple[str, str], DataFrame] = {}


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical thresholded co-purchase edges: (p1 < p2, n_orders)."""
    def build() -> DataFrame:
        items = (
            table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        a = items.select(F.col("l_orderkey").alias("k"),
                         F.col("l_partkey").alias("p1"))
        b = items.select(F.col("l_orderkey").alias("k"),
                         F.col("l_partkey").alias("p2"))
        return (
            a.join(b, "k")
            .filter(F.col("p1") < F.col("p2"))
            .groupBy("p1", "p2")
            .agg(F.count(F.lit(1)).alias("n_orders"))
            .filter(F.col("n_orders") >= MIN_ORDERS)
            .persist()
        )

    return session_memo(_EDGE_MEMO, spark, sf_dir, build)
