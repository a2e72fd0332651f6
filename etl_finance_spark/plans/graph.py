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
- baskets larger than ``MAX_BASKET`` distinct parts are dropped BEFORE
  the self-join. The per-order fan-out is quadratic in basket size, so
  one pathological mega-order (a bulk B2B purchase, a bot cart, a data
  error) with 10^5 lines would emit 10^10 pairs under a single join
  key — an unsplittable straggler task no amount of cluster helps
  with. Market-basket practice caps or discards such baskets as
  non-signal; the cap rides far above organic basket sizes (fixtures
  max out at 17 distinct parts; the TPC-H spec caps at 7 lines), and
  the basket-size count shares the self-join's own shuffle key, so the
  guard adds no extra exchange. Applied identically in the DuckDB
  oracles via ``ITEMS_CTE_SQL`` — capped semantics are THE semantics,
  not a Spark-side approximation;
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
from pyspark.sql.window import Window

from etl_finance_spark.catalog import table
from etl_finance_spark.lineage import ensure_persisted
from etl_finance_spark.memo import session_memo

MIN_ORDERS = 2  # co-purchase edge threshold shared by all three consumers
MAX_BASKET = 256  # mega-basket guard; see module docstring

# The capped item set as a DuckDB CTE body — every graph-query oracle
# interpolates this one string, so the Spark build and the three
# oracles can never drift apart.
ITEMS_CTE_SQL = f"""items AS (
        SELECT l_orderkey, l_partkey FROM (
            SELECT l_orderkey, l_partkey,
                   count(*) OVER (PARTITION BY l_orderkey) AS bsz
            FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        ) WHERE bsz <= {MAX_BASKET}
    )"""

_EDGE_MEMO: dict[tuple[str, str], DataFrame] = {}


def edges_from_items(items: DataFrame,
                     min_orders: int = MIN_ORDERS,
                     max_basket: int = MAX_BASKET) -> DataFrame:
    """Thresholded co-purchase edges from an (l_orderkey, l_partkey)
    frame (already distinct). The cap filters ONE side of the
    self-join only — a dropped order key can't match from either side,
    so one-sided capping is pair-for-pair identical to capping both,
    and the basket-size window partitions by the same key that side
    shuffles on for the join anyway (the guard rides the existing
    exchange; the uncapped side moves linearly, never quadratically)."""
    a = (
        items.withColumn(
            "bsz",
            F.count(F.lit(1)).over(Window.partitionBy("l_orderkey")),
        )
        .filter(F.col("bsz") <= max_basket)
        .select(F.col("l_orderkey").alias("k"),
                F.col("l_partkey").alias("p1"))
    )
    b = items.select(F.col("l_orderkey").alias("k"),
                     F.col("l_partkey").alias("p2"))
    return (
        a.join(b, "k")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= min_orders)
    )


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical thresholded co-purchase edges: (p1 < p2, n_orders)."""
    def build() -> DataFrame:
        items = (
            table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        return edges_from_items(items).persist()

    # self-heal against an external release draining a shared cache
    # entry (see similarity._corpus_unit_vecs for the ordering hazard)
    return ensure_persisted(session_memo(_EDGE_MEMO, spark, sf_dir, build))
