"""Composite analytics over the event stream — the query shapes a user
of the engine runs daily (cohort retention, funnels, ordered string
aggregation). Each composes §2 operators into one multi-stage plan, so
they double as integration tests of the operator library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_finance_spark.catalog import table
from etl_finance_spark.plans.graph import ITEMS_CTE_SQL as _GRAPH_ITEMS_CTE
from etl_finance_spark.plans.graph import MIN_ORDERS as _GRAPH_MIN_ORDERS
from etl_finance_spark.registry import register


@register(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               min(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        FROM events
    )
    SELECT f.cohort_week,
           datediff('week', f.cohort_week, a.week) AS week_offset,
           count(DISTINCT a.user_id) AS active_users
    FROM activity a JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week,
    counted in each subsequent active week. Two aggregations sharing the
    events scan, shuffle-joined on user_id. The cohort map is one row
    PER USER — unbounded at scale (billions of rows at 100 TB), so it
    must NOT carry a broadcast hint; AQE may still broadcast at runtime
    when the measured size is genuinely small, which is the only safe
    way to make that call (VERDICT.md round-1 finding #3)."""
    events = table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).cast("date")
    firsts = events.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = events.select("user_id", week.alias("week")).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("long").alias(
                "week_offset"
            ),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "q_funnel",
    oracle="""
    WITH stage_ts AS (
        SELECT user_id,
               min(date_trunc('microseconds', ts))
                   FILTER (event_type = 'view') AS t_view,
               min(date_trunc('microseconds', ts))
                   FILTER (event_type = 'click') AS t_click,
               min(date_trunc('microseconds', ts))
                   FILTER (event_type = 'purchase') AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           count(*) FILTER (t_view IS NOT NULL) AS saw,
           count(*) FILTER (t_view IS NOT NULL AND t_click > t_view)
               AS clicked_after_view,
           count(*) FILTER (t_view IS NOT NULL AND t_click > t_view
                            AND t_purchase > t_click) AS purchased_after_click
    FROM stage_ts
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): per-user first-touch
    per stage in ONE aggregation pass (conditional min), then ordering
    predicates — no self-joins, no window over the whole stream."""
    events = table(spark, sf_dir, "events")

    def first_ts(etype: str):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    stages = events.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    clicked = F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("saw"),
        F.count(F.when(clicked, 1)).alias("clicked_after_view"),
        F.count(F.when(purchased, 1)).alias("purchased_after_click"),
    )


@register(
    "q_regional_revenue",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join through the region→nation→customer
    chain with the local-supplier predicate. Only the FIXED-cardinality
    dims (region 5 rows, nation 25) carry a broadcast hint; customer and
    supplier are sf-proportional, so their joins are plain equi-joins and
    AQE picks broadcast-vs-shuffle from measured sizes (VERDICT r3: a
    forced hint there is a broadcast-OOM class at 100 TB). orders⋈lineitem
    shuffles on orderkey."""
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    supplier = table(spark, sf_dir, "supplier")
    dims = (
        nation.join(F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey)
        .join(customer, customer.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "n_name", "n_nationkey")
    )
    return (
        orders.join(dims, orders.o_custkey == dims.c_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .join(
            supplier,
            (supplier.s_suppkey == lineitem.l_suppkey)
            & (supplier.s_nationkey == F.col("n_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q_large_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
    FROM orders
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    """,
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: semi-join against an aggregated subquery (orders
    whose total quantity exceeds a threshold). The agg output is a
    data-dependent fraction of the FACT, so it carries no broadcast hint
    (VERDICT r3); AQE broadcasts the semi side only when its measured
    size allows. The fact scans once either way."""
    orders = table(spark, sf_dir, "orders")
    big = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 150)
        .select("l_orderkey")
    )
    return (
        orders.join(
            big, orders.o_orderkey == big.l_orderkey, "left_semi"
        )
        .select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total")
        )
    )


@register(
    "q_string_agg",
    oracle="""
    SELECT c_nationkey,
           string_agg(c_mktsegment, ',' ORDER BY c_mktsegment, c_custkey)
               AS segs
    FROM customer
    WHERE c_custkey <= 100
    GROUP BY c_nationkey
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (Spark 4 listagg ↔ DuckDB string_agg
    with ORDER BY) — order fully pinned on both sides."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    return cust.groupBy("c_nationkey").agg(
        F.expr(
            "listagg(c_mktsegment, ',') "
            "WITHIN GROUP (ORDER BY c_mktsegment, c_custkey)"
        ).alias("segs")
    )


@register(
    "q_rolling_active_users",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events
    ), days AS (SELECT DISTINCT d FROM ud)
    SELECT days.d AS day, count(DISTINCT ud.user_id) AS wau
    FROM days JOIN ud ON ud.d BETWEEN days.d - 6 AND days.d
    GROUP BY 1
    """,
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct actives (WAU) per active day. Distinct
    counts cannot ride a sliding window frame, and a range join of days
    against user-days is a band join; the Spark plan instead EXPANDS
    each (user, day) into the ≤7 future days it contributes to
    (map-side sequence+explode, bounded 7× fan-out), semi-joins to real
    activity days, and counts distinct pairs — every stage is an
    equi-shuffle that scales linearly."""
    events = table(spark, sf_dir, "events")
    ud = events.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    days = ud.select(F.col("d").alias("day")).distinct()
    expanded = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("day"),
    )
    return (
        expanded.join(days, "day", "left_semi")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("wau"))
    )


@register(
    "q_snapshot_diff",
    oracle="""
    WITH old AS (
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders WHERE o_orderkey % 7 <> 0
    ), new AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 11 = 0
                    THEN round(o_totalprice * 2, 2)
                    ELSE round(o_totalprice, 2) END AS price
        FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           CASE WHEN old.o_orderkey IS NULL THEN 'added'
                WHEN new.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           old.price AS old_price,
           new.price AS new_price
    FROM old FULL JOIN new ON old.o_orderkey = new.o_orderkey
    WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
          OR old.price IS DISTINCT FROM new.price
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (CDC between two table versions): full outer join
    on the key, classify added/removed/changed, drop unchanged. The two
    "versions" are deterministic transforms of orders so the query is
    self-contained and oracle-checkable. The operator itself is
    :func:`etl_finance_spark.operators.cdc.snapshot_diff`
    (round-trip property-tested); prices compare after 2dp rounding so
    the changed-set is float-stable."""
    from etl_finance_spark.operators.cdc import snapshot_diff

    orders = table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    new = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 11 == 0, F.round(F.col("o_totalprice") * 2, 2)
        )
        .otherwise(F.round("o_totalprice", 2))
        .alias("price"),
    )
    return snapshot_diff(old, new, "o_orderkey", "price")


@register(
    "q_two_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def q_two_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between a nation pair by year.
    The 25-row nation dim broadcasts twice (always safe); supplier and
    customer joins carry NO hint — their sizes grow with the data, so
    AQE picks broadcast-vs-shuffle from measured sizes. The symmetric
    pair predicate lands on the already-joined nation names, after
    which one shuffle (the group-by) remains."""
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"),
                              F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("cn_key"),
                              F.col("n_name").alias("cust_nation")))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, s.s_nationkey == F.col("sn_key"))
        .join(n2, c.c_nationkey == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q_returned_revenue_topk",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY 1, 2
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_returned_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue on returned items.
    Returnflag filter pushes to the lineitem scan, the agg partial-
    combines before its shuffle, and the top-20 compiles to
    TakeOrderedAndProject (rank on the ROUNDED revenue with the unique
    custkey tiebreak, per the cross-engine ordering policy)."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q_ohlc_hourly",
    oracle="""
    WITH e AS (
        SELECT event_type, value,
               date_trunc('hour', date_trunc('microseconds', ts)) AS h,
               row_number() OVER (
                   PARTITION BY event_type,
                                date_trunc('hour', date_trunc('microseconds', ts))
                   ORDER BY date_trunc('microseconds', ts), event_id
               ) AS rn_a,
               row_number() OVER (
                   PARTITION BY event_type,
                                date_trunc('hour', date_trunc('microseconds', ts))
                   ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC
               ) AS rn_d
        FROM events WHERE value IS NOT NULL
    )
    SELECT CAST(floor(epoch(h)) AS BIGINT) AS hour_start,
           event_type,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           count(*) AS n
    FROM e
    GROUP BY 1, 2
    """,
)
def q_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candle resampling — THE finance downsampling primitive the
    reference's tick pipeline feeds (etl.py OHLCV ingest). Open/close
    are min/max-of-struct aggregates ordered by (ts, unique event_id):
    one groupBy with full map-side partial aggregation, against the
    oracle's two-window formulation — same result, half the shuffles,
    and no per-group sort. High/low/count ride the same pass."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    h = F.date_trunc("hour", F.col("ts"))
    return (
        ev.groupBy("event_type", h.alias("h"))
        .agg(
            F.min(F.struct("ts", "event_id", "value")).getField("value")
            .alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.struct("ts", "event_id", "value")).getField("value")
            .alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.unix_timestamp("h").alias("hour_start"),
            "event_type", "open", "high", "low", "close", "n",
        )
    )


@register(
    "q_copurchase_pairs",
    # threshold + mega-basket cap interpolated from plans/graph.py so
    # the oracle can never drift from the shared edge build all three
    # graph queries read
    oracle=f"""
    WITH {_GRAPH_ITEMS_CTE}
    SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_orders
    FROM items a
    JOIN items b ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= {_GRAPH_MIN_ORDERS}
    """,
)
def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing together in at
    least two orders. The self-join is keyed on the ORDER (pair fan-out
    bounded by basket size squared, ~tens per order), never on the
    part — the plan a recommender's candidate generator uses at scale.
    Reads the session's shared co-purchase graph build (plans/graph.py —
    one materialization serves this, q_pagerank and q_triangle_count)."""
    from etl_finance_spark.plans.graph import copurchase_edges

    return copurchase_edges(spark, sf_dir).select("p1", "p2", "n_orders")


@register(
    "q_session_stats",
    oracle="""
    WITH e AS (
        SELECT user_id, date_trunc('microseconds', ts) AS ts FROM events
    ), marked AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), grouped AS (
        SELECT user_id,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM marked
    ), per_session AS (
        SELECT user_id, session_id, count(*) AS n
        FROM grouped GROUP BY 1, 2
    )
    SELECT user_id,
           count(*) AS n_sessions,
           round(avg(n), 6) AS avg_events,
           CAST(max(n) AS BIGINT) AS max_events
    FROM per_session
    GROUP BY user_id
    """,
)
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session summary on top of the session_window operator
    (the composite a product-analytics user runs daily): Spark
    sessionizes with the native merging session_window — no lag/
    running-sum windows — then one re-aggregation per user. The oracle
    derives identical sessions via the gaps-and-islands formulation."""
    from etl_finance_spark.streaming.windows import session_counts

    ev = table(spark, sf_dir, "events")
    per_session = session_counts(ev)
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(F.avg("n"), 6).alias("avg_events"),
            F.max("n").alias("max_events"),
        )
    )


@register(
    "q_snapshot_apply",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 11 = 0
                THEN round(o_totalprice * 2, 2)
                ELSE round(o_totalprice, 2) END AS price
    FROM orders WHERE o_orderkey % 5 <> 0
    """,
)
def q_snapshot_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverse of q_snapshot_diff: applying the change set to the
    old snapshot reconstructs the new one exactly (the oracle IS the
    new snapshot, computed directly — the round-trip contract of
    :func:`etl_finance_spark.operators.cdc.snapshot_apply`, also
    property-tested on random tables)."""
    from etl_finance_spark.operators.cdc import snapshot_apply

    orders = table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    diff = q_snapshot_diff(spark, sf_dir)
    return snapshot_apply(old, diff, "o_orderkey", "price")


@register(
    "q_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type, median(value) AS med
        FROM events WHERE value IS NOT NULL GROUP BY 1
    ), dev AS (
        SELECT e.event_type, median(abs(e.value - m.med)) AS mad
        FROM events e JOIN med m USING (event_type)
        WHERE e.value IS NOT NULL
        GROUP BY 1
    )
    SELECT m.event_type,
           round(m.med, 6) AS med,
           round(d.mad, 6) AS mad,
           (SELECT count(*) FROM events e
            WHERE e.event_type = m.event_type AND e.value IS NOT NULL
              AND abs(e.value - m.med) > 3 * d.mad) AS n_outliers
    FROM med m JOIN dev d USING (event_type)
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier profile per event type: median absolute deviation
    instead of stddev (a single fat-tailed burst inflates sigma and
    hides every other outlier; MAD doesn't). Two grouped exact medians
    with a broadcast-size re-join of the per-group stats (bounded: one
    row per event type) — the robust twin of q_zscore. The exact
    medians carry the counts-map memory model documented at
    q_median_by_group; swap in approx_percentile at unbounded value
    cardinality."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
    )
    stats = med.join(dev, "event_type")
    flagged = (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
    )
    return (
        stats.join(flagged, "event_type", "left")
        .select(
            "event_type",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            F.coalesce("n_outliers", F.lit(0)).alias("n_outliers"),
        )
    )


@register(
    "q_retention_matrix",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               min(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        FROM events
    ), offsets AS (
        SELECT f.cohort_week,
               datediff('week', f.cohort_week, a.week) AS off,
               a.user_id
        FROM activity a JOIN firsts f USING (user_id)
    )
    SELECT cohort_week,
           count(DISTINCT CASE WHEN off = 0 THEN user_id END) AS w0,
           count(DISTINCT CASE WHEN off = 1 THEN user_id END) AS w1,
           count(DISTINCT CASE WHEN off = 2 THEN user_id END) AS w2,
           count(DISTINCT CASE WHEN off = 3 THEN user_id END) AS w3
    FROM offsets
    GROUP BY cohort_week
    """,
)
def q_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cohort table in its deliverable shape: one row per cohort
    week, one column per week offset (the matrix analysts actually
    read). Conditional count-distincts in a single aggregation pass —
    same plan Spark's pivot() produces, with explicit column names."""
    events = table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).cast("date")
    firsts = events.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = events.select("user_id", week.alias("week")).distinct()
    off = (F.datediff("week", "cohort_week") / 7).cast("long")
    offsets = activity.join(firsts, "user_id").select(
        "cohort_week", off.alias("off"), "user_id"
    )
    def wk(i: int):
        return F.countDistinct(
            F.when(F.col("off") == i, F.col("user_id"))
        ).alias(f"w{i}")
    return offsets.groupBy("cohort_week").agg(wk(0), wk(1), wk(2), wk(3))


@register(
    "q_interarrival",
    oracle="""
    WITH deltas AS (
        SELECT event_type,
               CAST(floor(epoch(date_trunc('microseconds', ts))) AS BIGINT)
                   - CAST(floor(epoch(lag(date_trunc('microseconds', ts)) OVER (
                         PARTITION BY user_id, event_type
                         ORDER BY date_trunc('microseconds', ts), event_id
                     ))) AS BIGINT) AS dt_s
        FROM events
    )
    SELECT event_type,
           round(median(dt_s), 6) AS med_s,
           round(quantile_cont(dt_s, 0.9), 6) AS p90_s,
           count(dt_s) AS n_gaps
    FROM deltas
    GROUP BY event_type
    """,
)
def q_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time profile per event type (the ops-health metric
    behind alerting thresholds): per-entity lag deltas in whole epoch
    seconds — integer math, so cross-engine percentile interpolation
    stays exact — then grouped median/p90 (counts-map memory model,
    see q_median_by_group: gap seconds cluster heavily, so the
    distinct-value domain stays small; approx_percentile is the
    unbounded-domain swap)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    dt = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))
    deltas = ev.select("event_type", dt.alias("dt_s"))
    return deltas.groupBy("event_type").agg(
        F.round(F.median("dt_s"), 6).alias("med_s"),
        F.round(F.expr("percentile(dt_s, 0.9)"), 6).alias("p90_s"),
        F.count("dt_s").alias("n_gaps"),
    )
