"""Window-function operators (SURVEY.md §2.2, beyond R-WIN-1).

Every window partitions by an entity key (customer / user / returnflag):
a global ORDER BY window is the reference's seam-bug anti-pattern
(etl.py:166) and a single-reducer bottleneck at scale. Every ORDER BY
carries a unique tiebreak suffix so row_number/ntile/top-k row *sets*
are deterministic (SURVEY.md §7.3 item 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_finance_spark.catalog import table
from etl_finance_spark.registry import register


@register(
    "q_win_rownum",
    oracle="""
    SELECT o_orderkey,
           row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS rn
    FROM orders
    """,
)
def q_win_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select("o_orderkey", F.row_number().over(w).cast("long").alias("rn"))


@register(
    "q_win_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           rank()       OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rnk,
           dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS drnk
    FROM lineitem
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank are tie-stable (depend only on the value), so no
    tiebreak key is needed for determinism here."""
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@register(
    "q_win_running_sum",
    oracle="""
    SELECT o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_spend
    FROM orders
    """,
)
def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "q_win_moving_avg",
    oracle="""
    SELECT event_id,
           round(avg(value) OVER (
               PARTITION BY user_id
               ORDER BY date_trunc('microseconds', ts), event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ), 6) AS ma7
    FROM events
    """,
)
def q_win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average — the forex-delta smoothing pattern
    (etl.py:418-422 family) per entity."""
    events = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return events.select(
        "event_id", F.round(F.avg("value").over(w), 6).alias("ma7")
    )


@register(
    "q_win_ntile",
    oracle="""
    SELECT o_orderkey,
           ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders
    WHERE o_orderkey <= 4000
    """,
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-ntile ORACLE RUNG with a CAPPED input (VERDICT r3 #4): the
    key-range filter bounds the slice to <= 4000 rows at EVERY scale
    factor (orderkeys are dense from 1), so the partitionBy-less window
    funnels a fixed-size set through one task — a constant, not a
    scale-killer. The production plan for full-table global bucketing
    is q_win_ntile_scalable (value cut points from one percentile_disc
    pass + map-side CASE; swaps to approx_percentile at scale). This
    rung stays declared because the reference surface includes exact
    rank-style global bucketing and the unique tiebreak makes tile
    assignment deterministic for the oracle."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 4000)
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return orders.select("o_orderkey", F.ntile(4).over(w).cast("long").alias("quartile"))


@register(
    "q_win_ntile_scalable",
    oracle="""
    WITH cuts AS (
        SELECT quantile_disc(o_totalprice, 0.25) AS p25,
               quantile_disc(o_totalprice, 0.50) AS p50,
               quantile_disc(o_totalprice, 0.75) AS p75
        FROM orders
    )
    SELECT o_orderkey,
           CAST(CASE WHEN o_totalprice <= p25 THEN 1
                     WHEN o_totalprice <= p50 THEN 2
                     WHEN o_totalprice <= p75 THEN 3
                     ELSE 4 END AS BIGINT) AS quartile
    FROM orders, cuts
    """,
)
def q_win_ntile_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of q_win_ntile (VERDICT.md round-1 finding: the
    exact global-window ntile funnels every row through ONE partition).
    Value-based quartiles instead: one aggregation pass computes the
    three discrete cut points (percentile_disc picks actual data values,
    so both engines agree exactly — no interpolation at the double-
    precision edge), a 1-row broadcast carries them to every executor,
    and bucket assignment is a map-side CASE. No global sort anywhere;
    at scale the agg swaps to approx_percentile with the same shape.
    Semantics differ from ntile only in tie handling (equal values share
    a bucket; bucket sizes are ~n/4 rather than exactly n/4)."""
    orders = table(spark, sf_dir, "orders")
    cuts = orders.agg(
        F.expr(
            "percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p25"),
        F.expr(
            "percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p50"),
        F.expr(
            "percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p75"),
    )
    return orders.crossJoin(F.broadcast(cuts)).select(
        "o_orderkey",
        F.when(F.col("o_totalprice") <= F.col("p25"), 1)
        .when(F.col("o_totalprice") <= F.col("p50"), 2)
        .when(F.col("o_totalprice") <= F.col("p75"), 3)
        .otherwise(4)
        .cast("long")
        .alias("quartile"),
    )


@register(
    "q_win_lead",
    oracle="""
    SELECT event_id,
           CAST(floor(epoch(date_trunc('microseconds', ts))) AS BIGINT) AS epoch_s,
           CAST(floor(epoch(lead(date_trunc('microseconds', ts)) OVER (
               PARTITION BY user_id
               ORDER BY date_trunc('microseconds', ts), event_id
           ))) AS BIGINT) AS next_epoch_s
    FROM events
    """,
)
def q_win_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead(): next event time per user (session-gap raw material)."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.unix_timestamp(F.lead("ts", 1).over(w)).alias("next_epoch_s"),
    )


@register(
    "q_win_first_last",
    oracle="""
    SELECT event_id,
           first_value(value) OVER (
               PARTITION BY user_id
               ORDER BY date_trunc('microseconds', ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS first_v,
           last_value(value) OVER (
               PARTITION BY user_id
               ORDER BY date_trunc('microseconds', ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_v
    FROM events
    """,
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last over an explicit full frame (raw values pass through —
    no arithmetic, so bit-exact across engines)."""
    events = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return events.select(
        "event_id",
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(w).alias("last_v"),
    )


def sessionize_gaps(df: DataFrame, entity: str, sec_col: str,
                    id_col: str, gap_s: int) -> DataFrame:
    """Gaps-and-islands session assignment: rows of ``df`` get a
    per-``entity`` ``session_id`` (1-based, in (sec, id) order) that
    increments whenever the gap since the previous row exceeds
    ``gap_s`` seconds. The pure-window formulation (lag -> boundary
    flag -> running sum): both windows share ONE
    hashpartitioning(entity) exchange; nothing global. Every ORDER BY
    carries the ``id_col`` tiebreak — same-second rows otherwise split
    or merge sessions depending on engine-internal tie order (observed
    live at sf0.1, user 1061). Returns (entity, id_col, sec_col,
    session_id); callers aggregate to the session grain themselves
    (plans/analytics3.q_sessionize_gaps) or keep the row grain.
    Exact-checked against a closed-form planted corpus at 1M rows in
    tests/test_scale_smoke.py."""
    w = Window.partitionBy(entity).orderBy(sec_col, id_col)
    marked = df.select(entity, id_col, sec_col).withColumn(
        "new_session",
        F.when(
            (F.col(sec_col) - F.lag(sec_col).over(w)).isNull()
            | ((F.col(sec_col) - F.lag(sec_col).over(w)) > gap_s),
            1,
        ).otherwise(0),
    )
    wrun = (
        Window.partitionBy(entity)
        .orderBy(sec_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return marked.select(
        entity, id_col, sec_col,
        F.sum("new_session").over(wrun).cast("long").alias("session_id"),
    )


def fill_forward(value, entity: str, order_cols: list[str]):
    """LOCF column expression: the entity's last non-null observation
    at-or-before each row in ``order_cols`` order (last ignore-nulls
    over a per-entity running frame — one shuffle on the entity key,
    no self-join). ``value`` is any Column; leading rows with no prior
    observation stay null (callers coalesce their own default).
    Property-tested against a Python reference in tests/test_property.py."""
    w = (
        Window.partitionBy(entity)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return F.last(value, ignorenulls=True).over(w)


@register(
    "q_fill_forward",
    oracle="""
    SELECT event_id,
           round(coalesce(last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY date_trunc('microseconds', ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), -1.0), 6) AS v_filled
    FROM (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        FROM events
    )
    """,
)
def q_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (LOCF): each null takes the entity's last non-null
    observation — the time-series imputation the reference's mean-fill
    (R-NULL-1) should arguably have been. See :func:`fill_forward`;
    leading nulls flagged with -1."""
    events = table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", None).otherwise(F.col("value"))
    return events.select(
        "event_id",
        F.round(
            F.coalesce(fill_forward(v, "user_id", ["ts", "event_id"]),
                       F.lit(-1.0)), 6
        ).alias("v_filled"),
    )


@register(
    "q_win_range_frame",
    oracle="""
    SELECT o_orderkey,
           count(*) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice
               RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW
           ) AS n_similar_cheaper
    FROM orders
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): peers within a price
    band — counts are tie-stable so no tiebreak key is needed."""
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_similar_cheaper"),
    )


@register(
    "q_win_pct_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(percent_rank() OVER (
               PARTITION BY l_returnflag ORDER BY l_quantity), 6) AS pr,
           round(cume_dist() OVER (
               PARTITION BY l_returnflag ORDER BY l_quantity), 6) AS cd
    FROM lineitem
    """,
)
def q_win_pct_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist — tie-stable relative ranks (both engines
    share the (rank-1)/(n-1) and rank_hi/n definitions)."""
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark's TakeOrderedAndProject — each partition
    keeps k rows, driver merges k·p rows; no global sort materialized."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


@register(
    "q_win_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q_win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group — also the relational half of similarity top-k
    (SURVEY.md §2.2)."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "q_zscore",
    oracle="""
    SELECT event_id,
           round((value - avg(value) OVER w)
                 / stddev_samp(value) OVER w, 6) AS z
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
)
def q_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity standardization (feature normalization for training
    pipelines): an unordered whole-partition window, so Spark computes
    avg/stddev in one pass per user partition with no sort. try_divide
    maps a zero/NULL stddev (single-row or constant users) to NULL the
    way DuckDB's `/` does."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    z = F.round(
        F.try_divide(
            F.col("value") - F.avg("value").over(w),
            F.stddev_samp("value").over(w),
        ),
        6,
    )
    return events.select("event_id", z.alias("z"))


@register(
    "q_win_cume_dist",
    oracle="""
    SELECT o_orderkey,
           round(cume_dist() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice, o_orderkey
           ), 6) AS cd
    FROM orders
    """,
)
def q_win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist per customer — the remaining rank-family member
    (rownum/rank/percent_rank/ntile already declared); entity-
    partitioned like every window here, unique tiebreak pins ties."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey", F.round(F.cume_dist().over(w), 6).alias("cd")
    )


@register(
    "q_interpolate_linear",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               avg(value) AS v
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1
    ), spine AS (
        SELECT user_id,
               CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM bounds
    ), j AS (
        SELECT s.user_id, s.day, d.v
        FROM spine s LEFT JOIN daily d USING (user_id, day)
    ), w AS (
        SELECT user_id, day, v,
               last_value(v IGNORE NULLS) OVER wp AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                   OVER wp AS pd,
               first_value(v IGNORE NULLS) OVER wn AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                   OVER wn AS nd
        FROM j
        WINDOW wp AS (PARTITION BY user_id ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY user_id ORDER BY day
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, day,
           round(CASE WHEN v IS NOT NULL THEN v
                      WHEN pv IS NULL THEN nv
                      WHEN nv IS NULL THEN pv
                      ELSE pv + (nv - pv)
                           * datediff('day', pd, day) * 1.0
                           / datediff('day', pd, nd) END, 6) AS v_interp
    FROM w
    """,
)
def q_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing daily values per entity — the
    time-series repair step past LOCF (q_fill_forward). See
    :func:`interpolate_daily` for the operator itself."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.avg("value").alias("v"))
    return interpolate_daily(daily, "user_id", "day", "v")


def interpolate_daily(daily: DataFrame, entity: str, day_col: str,
                      value_col: str) -> DataFrame:
    """Gap-filling linear interpolation over a per-entity daily series:
    a day spine spanning each entity's [min, max] observed day
    left-joins the observations, two ignore-nulls windows carry the
    bracketing known points, and each gap day fills proportionally to
    its distance between them. Boundary gaps fall back to
    nearest-known. All windows partition by the entity — no global
    sort; the spine explode is bounded by each entity's active date
    range. Returns (entity, day, <value>_interp rounded 6dp).
    Property-tested against a Python reference in tests/test_property.py."""
    bounds = daily.groupBy(entity).agg(
        F.min(day_col).alias("lo"), F.max(day_col).alias("hi")
    )
    spine = bounds.select(
        entity, F.explode(F.sequence("lo", "hi")).alias(day_col)
    )
    j = spine.join(daily, [entity, day_col], "left")
    wp = (
        Window.partitionBy(entity).orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy(entity).orderBy(day_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    known_day = F.when(v.isNotNull(), F.col(day_col))
    pv = F.last(value_col, ignorenulls=True).over(wp)
    pd_ = F.last(known_day, ignorenulls=True).over(wp)
    nv = F.first(value_col, ignorenulls=True).over(wn)
    nd = F.first(known_day, ignorenulls=True).over(wn)
    frac = F.datediff(F.col(day_col), pd_) / F.datediff(nd, pd_)
    interp = (
        F.when(v.isNotNull(), v)
        .when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .otherwise(pv + (nv - pv) * frac)
    )
    return j.select(
        entity, day_col, F.round(interp, 6).alias(f"{value_col}_interp")
    )
