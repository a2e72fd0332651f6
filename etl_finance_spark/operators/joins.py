"""Join operators (SURVEY.md §2.2 X-JOIN-1..8).

Physical-plan posture per join, since joins are where 100 TB plans live
or die:

- only FIXED-cardinality dims (region 5, nation 25, 1-row/k-row
  aggregates) ever carry a forced broadcast hint; sf-proportional
  sides (customer/supplier/part slices, fact-derived aggregates) join
  plain and AQE broadcasts them only while their measured size allows
  (VERDICT r3: a static hint there is a broadcast-OOM class at 100 TB);
- fact-fact joins shuffle on the join key; AQE handles skew
  (session.py enables skewJoin) — at warehouse scale the same keys
  would be bucketed so the shuffle disappears;
- the range/as-of joins are equi-joins on the entity key with the
  temporal predicate as a post-join filter, so Spark still gets a
  hash/sort-merge join rather than a cartesian expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType
from pyspark.sql.window import Window

from etl_finance_spark.catalog import table
from etl_finance_spark.registry import register


@register(
    "q_join_inner",
    oracle="""
    SELECT o_orderkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-JOIN-1: inner equi-join fact→dim."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .select("o_orderkey", "c_name", "o_totalprice")
    )


@register(
    "q_join_broadcast",
    oracle="""
    SELECT l_orderkey, l_linenumber, p_brand
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size > 40
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-JOIN-2: same semantics as inner, physical broadcast hint — the
    dim ships to every executor, the fact never shuffles. This query IS
    the hint operator (the user asked for a forced broadcast), so the
    hint stays by definition; production plans in this repo reserve it
    for bounded builds (module header)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "l_linenumber", "p_brand")
    )


@register(
    "q_join_left",
    oracle="""
    SELECT c_custkey, o_orderkey
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-JOIN-3: left outer (unmatched dim rows survive with nulls)."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .select("c_custkey", "o_orderkey")
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-JOIN-4: left semi — EXISTS without duplicating matches."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT r_name, seg FROM region
    CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer)
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-JOIN-8: cross join of two tiny deterministic sets (5×5)."""
    region = table(spark, sf_dir, "region").select("r_name")
    segs = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("seg"))
        .distinct()
    )
    return region.crossJoin(segs)


@register(
    "q_join_range",
    oracle="""
    SELECT e1.event_id, count(*) AS n_following
    FROM events e1
    JOIN events e2
      ON e2.user_id = e1.user_id
     AND e2.event_id <> e1.event_id
     AND date_trunc('microseconds', e2.ts) > date_trunc('microseconds', e1.ts)
     AND date_trunc('microseconds', e2.ts)
         <= date_trunc('microseconds', e1.ts) + INTERVAL '1 hour'
    GROUP BY e1.event_id
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-JOIN-6: bounded temporal self-join — events followed within 1h
    by another event of the same user, via TIME-BUCKET DECOMPOSITION
    (the standard interval-join plan; bucket width = the 1h range
    bound). A bare user_id equi-join generates |events_u|^2 candidate
    pairs per user over the user's WHOLE history — quadratic in
    retention, the complexity class that kills a years-deep event store
    at 100 TB regardless of the 1h bound (the round-3 shape). Here the
    right side replicates to its own hour bucket and the previous one
    (2x, constant), the join keys on (user_id, bucket), and the exact
    range predicate filters inside the match: a qualifying pair has
    bucket(e2) - bucket(e1) in {0, 1}, so the cover is exact and each
    pair meets on EXACTLY one replica (no dedup). Candidates fall to
    |b| x (|b| + |b+1|) per user-hour — linear in history at bounded
    event density. Closed-form exact-checked at 1M rows in
    tests/test_scale_smoke.py (see range_join_following)."""
    events = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return range_join_following(events, "user_id", "ts", "event_id", 3600)


def range_join_following(events: DataFrame, key: str, ts_col: str,
                         id_col: str, bound_s: int) -> DataFrame:
    """Count, per row, the same-``key`` rows with ``ts_col`` strictly
    after it and at most ``bound_s`` seconds later (rows with no
    follower emit nothing — inner-join semantics). Bucketed interval
    join: left rows keep their floor(sec/bound_s) bucket, right rows
    replicate to {bucket, bucket-1}, and the exact µs-precision range
    predicate evaluates inside the (key, bucket) equi-match.

    The bucket's epoch seconds derive per dtype: TIMESTAMP_NTZ uses
    pure NTZ arithmetic (timestampdiff from the NTZ epoch) — NEVER
    ``unix_timestamp``, which converts through the session timezone,
    so under a DST zone the wall-clock delta and the epoch delta
    disagree and a qualifying pair can straddle 2 buckets and silently
    drop out of the cover (the range predicate compares the raw NTZ
    values, so the bucket metric must be consistent with it). Instant
    TIMESTAMP is already epoch-based and uses unix_timestamp directly.
    Post-1970 timestamps assumed (timestampdiff truncates toward zero,
    so pre-epoch values would bucket off-by-one)."""
    from pyspark.sql.types import TimestampNTZType

    if bound_s < 1:
        # floor(sec / bound_s) would raise DIVIDE_BY_ZERO at runtime
        # under ANSI mode (or bucket nonsense for negatives) — fail
        # loud and early instead
        raise ValueError(f"bound_s must be >= 1 second, got {bound_s}")
    if isinstance(events.schema[ts_col].dataType, TimestampNTZType):
        sec = F.expr(
            "timestampdiff(SECOND,"
            f" TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`)"
        )
    else:
        sec = F.unix_timestamp(F.col(ts_col))
    # collision-proof internal name (mirrors __zkey/__salt elsewhere):
    # a caller whose frame already carries a column named like the
    # bucket must not hit an ambiguous-reference failure
    b = F.floor(sec / bound_s)
    e1 = events.select(id_col, key, ts_col, b.alias("__bucket")).alias("e1")
    e2 = events.select(
        id_col, key, ts_col,
        F.explode(F.array(b, b - 1)).alias("__bucket"),
    ).alias("e2")
    return (
        e1.join(
            e2,
            (F.col(f"e2.{key}") == F.col(f"e1.{key}"))
            & (F.col("e2.__bucket") == F.col("e1.__bucket"))
            & (F.col(f"e2.{id_col}") != F.col(f"e1.{id_col}"))
            & (F.col(f"e2.{ts_col}") > F.col(f"e1.{ts_col}"))
            & (F.col(f"e2.{ts_col}")
               <= F.col(f"e1.{ts_col}")
               + F.make_dt_interval(secs=F.lit(bound_s))),
        )
        .groupBy(F.col(f"e1.{id_col}").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_following"))
    )


@register(
    "q_revenue_topk",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS DATE) AS order_date
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (SURVEY.md §5): selective dim filter → two joins →
    agg → top-k. The plan to want at 100 TB: the segment-filtered
    customer side is still ~1/5 of an sf-proportional table, so it
    carries NO forced broadcast hint (VERDICT r3) — AQE broadcasts it
    only while its measured size allows; orders⋈lineitem shuffles on
    orderkey (or stays local if both are bucketed on it), top-k never
    global-sorts."""
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey", "revenue",
            F.col("o_orderdate").cast("date").alias("order_date"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q_join_asof",
    oracle="""
    WITH j AS (
        SELECT o.o_orderkey, l.l_shipdate
        FROM orders o
        LEFT JOIN lineitem l
          ON l.l_orderkey = o.o_orderkey
         AND l.l_shipdate >= o.o_orderdate
    ), r AS (
        SELECT o_orderkey, l_shipdate,
               row_number() OVER (
                   PARTITION BY o_orderkey ORDER BY l_shipdate ASC NULLS LAST
               ) AS rn
        FROM j
    )
    SELECT o_orderkey,
           CAST(l_shipdate AS DATE) AS first_ship_date
    FROM r WHERE rn = 1
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-JOIN-7: as-of join — for each order, the *first* shipment
    at-or-after its order date. Spark has no native ASOF; the recipe
    (SURVEY.md §4) is equi-join on the entity key + temporal filter,
    then a MIN aggregate per key. Because the output only projects the
    matched timestamp, min() is semantically identical to the
    row_number()=1 window formulation but strictly cheaper: the partial
    min combines map-side before the shuffle instead of sorting every
    order's full shipment list (VERDICT.md round-1 finding #4 — the
    window version was the slowest driver-checked query). min() skips
    NULLs, so unmatched orders from the left join keep a NULL
    first_ship_date exactly as before. DuckDB's native `ASOF JOIN` only
    supports the >= direction on the left side, so the oracle uses an
    equivalent window formulation."""
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    joined = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate >= orders.o_orderdate),
        "left",
    )
    return joined.groupBy("o_orderkey").agg(
        F.min("l_shipdate").cast("date").alias("first_ship_date")
    )


def asof_backward(probes: DataFrame, quotes: DataFrame, keys: list[str],
                  ts_col: str, id_col: str,
                  payload_cols: list[str]) -> DataFrame:
    """Fact-fact backward as-of join via the union trick: for each
    probe row, attach the payload of the most recent quote
    at-or-before its timestamp with the same key (quote at the exact
    probe ts counts; same-ts quotes tie-break to the highest id).

    Never joins: tag each side, union, forward-fill the quote payload
    inside a (keys, ts, side, id)-ordered window, keep probe rows.
    Cost = one shuffle-sort of probes+quotes on the key — linear in
    input, the plan that survives two 100 TB fact streams (a
    join+filter formulation fans out |quotes_k| x |probes_k| per key
    first). Returns probes' (id, keys, ts) + one `<col>` per payload
    column (null when no quote precedes).

    The payload forward-fills as ONE struct, not per column: a quote
    row's struct is non-null even when its individual payload values
    are NULL, so every probe sees the whole payload of the single most
    recent quote. Per-column last(ignorenulls) would skip a NULL field
    backwards to an older quote, stitching a row that no quote ever
    contained (torn read)."""
    pay_t = StructType(
        [StructField(c, quotes.schema[c].dataType) for c in payload_cols]
    )
    qsel = quotes.select(
        *keys, ts_col, F.lit(0).alias("side"), id_col,
        F.struct(*[F.col(c) for c in payload_cols]).alias("_pay"),
    )
    psel = probes.select(
        *keys, ts_col, F.lit(1).alias("side"), id_col,
        F.lit(None).cast(pay_t).alias("_pay"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, "side", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = qsel.unionByName(psel).select(
        *keys, ts_col, "side", id_col,
        F.last("_pay", ignorenulls=True).over(w).alias("_pay"),
    )
    return filled.filter(F.col("side") == 1).select(
        *keys, ts_col, id_col,
        *[F.col("_pay").getField(c).alias(c) for c in payload_cols],
    )


@register(
    "q_join_asof_events",
    oracle="""
    WITH u AS (
        SELECT user_id, ts, 0 AS side, event_id,
               struct_pack(cid := event_id, cv := value) AS pay
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, ts, 1 AS side, event_id,
               CAST(NULL AS STRUCT(cid BIGINT, cv DOUBLE))
        FROM events WHERE event_type = 'purchase'
    ), f AS (
        SELECT user_id, ts, side, event_id,
               last_value(pay IGNORE NULLS) OVER w AS pay
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id AS purchase_id, user_id,
           date_trunc('microseconds', ts) AS ts,
           pay.cid AS click_id, pay.cv AS click_value
    FROM f WHERE side = 1
    """,
)
def q_join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact as-of join (X-JOIN-7 at stream-stream scale): for each
    purchase event, the most recent click at-or-before it by the same
    user. q_join_asof's equi-join + min-agg recipe works when one side
    is dimension-like, but here BOTH sides are fact streams — the
    join+filter formulation fans out to |clicks_u| x |purchases_u| rows
    per user before aggregating. The union trick never joins at all:
    tag each side, union, and fill the click payload forward (as one
    struct — id and value always travel together, see asof_backward)
    within a (user, ts, side, event_id)-ordered window, then keep
    purchase rows.
    Cost = ONE shuffle-sort of clicks+purchases on user_id, linear in
    input — the plan that survives 100 TB of events on both sides.
    Ties: a click at the purchase's exact ts counts (side orders clicks
    first); among same-ts clicks the max event_id wins (window order
    makes the pick deterministic on both engines). The operator itself
    is :func:`asof_backward` (property-tested against a brute-force
    reference in tests/test_property.py)."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id",
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    return asof_backward(
        purchases, clicks, ["user_id"], "ts", "event_id",
        ["click_id", "click_value"],
    ).select(
        F.col("event_id").alias("purchase_id"),
        "user_id", "ts", "click_id", "click_value",
    )
