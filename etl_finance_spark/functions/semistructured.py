"""Semi-structured VARIANT operators (Spark 4.x open VARIANT type).

The reference ingests nested JSON API payloads and plucks fields with
pandas accessors (/root/reference/etl.py news + forex extractors, e.g.
``data['articles']`` / ``data['rates']['EUR']``); `plans/news.py` maps
that to schema'd ``from_json``. This module adds the schemaless
alternative Spark 4 ships for the same problem: ``parse_json`` into the
binary VARIANT encoding, then typed path extraction with
``variant_get``. At 100 TB the trade is: keep one VARIANT column for
heterogeneous/evolving payloads (no schema migration on producer
change), extract hot fields at query time — extraction is a Catalyst
expression over the variant binary, whole-stage-codegen'd, no JSON
re-parse per access and no Python.

Oracled EXACT: the JSON text is constructed from fixture columns inside
the query, so DuckDB verifies the parse→extract round trip recovers
the original values through its own json_extract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_finance_spark.catalog import table
from etl_finance_spark.registry import register


@register(
    "q_variant_get",
    oracle="""
    SELECT o_orderkey,
           json_extract_string(payload, '$.status') AS status,
           CAST(json_extract(payload, '$.pricing.total') AS DOUBLE)
               AS total,
           CAST(json_extract(payload, '$.pricing.buckets[1]') AS BIGINT)
               AS mid_bucket
    FROM (
        SELECT o_orderkey,
               to_json(struct_pack(
                   status := o_orderstatus,
                   pricing := struct_pack(
                       total := o_totalprice,
                       buckets := [
                           CAST(floor(o_totalprice / 1000) AS BIGINT),
                           CAST(floor(o_totalprice / 100) AS BIGINT),
                           CAST(floor(o_totalprice / 10) AS BIGINT)]))) AS payload
        FROM orders WHERE o_orderkey % 7 = 0
    )
    """,
)
def q_variant_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON → VARIANT → typed path extraction, including a nested
    object and an array index. Both engines build the same JSON text
    from orders columns, parse it, and extract '$.status',
    '$.pricing.total', '$.pricing.buckets[1]' — proving the variant
    encoding round-trips strings, doubles, and array elements exactly.
    Map-side only (filter + projection, no shuffle); the filter and
    the three-column projection push down to the parquet scan
    (plan-asserted in tests/test_plans.py)."""
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 7 == 0
    )
    payload = orders.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.struct(
                    F.col("o_totalprice").alias("total"),
                    F.array(
                        F.floor(F.col("o_totalprice") / 1000).cast("long"),
                        F.floor(F.col("o_totalprice") / 100).cast("long"),
                        F.floor(F.col("o_totalprice") / 10).cast("long"),
                    ).alias("buckets"),
                ).alias("pricing"),
            )
        ).alias("payload"),
    )
    v = payload.select(
        "o_orderkey", F.parse_json("payload").alias("v"))
    return v.select(
        "o_orderkey",
        F.variant_get("v", "$.status", "string").alias("status"),
        F.variant_get("v", "$.pricing.total", "double").alias("total"),
        F.variant_get(
            "v", "$.pricing.buckets[1]", "long").alias("mid_bucket"),
    )


@register(
    "q_variant_agg",
    oracle="""
    SELECT status,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(total), 2) AS revenue,
           CAST(max(top_bucket) AS BIGINT) AS max_bucket
    FROM (
        SELECT json_extract_string(payload, '$.status') AS status,
               CAST(json_extract(payload, '$.pricing.total') AS DOUBLE)
                   AS total,
               CAST(json_extract(payload, '$.pricing.buckets[2]')
                   AS BIGINT) AS top_bucket
        FROM (
            SELECT to_json(struct_pack(
                       status := o_orderstatus,
                       pricing := struct_pack(
                           total := o_totalprice,
                           buckets := [
                               CAST(floor(o_totalprice / 1000) AS BIGINT),
                               CAST(floor(o_totalprice / 100) AS BIGINT),
                               CAST(floor(o_totalprice / 10) AS BIGINT)])))
                   AS payload
            FROM orders
        )
    )
    GROUP BY status ORDER BY status
    """,
)
def q_variant_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shred-then-aggregate over VARIANT: extract typed fields from
    the variant payload and group on them. This is the 100 TB pattern
    for heterogeneous event lakes — extraction happens BEFORE the
    shuffle, so the exchange carries (string, double, long) columns,
    never the variant binary, and the aggregate partials map-side
    combine as usual. Sum rounds 2dp post-aggregation (1e8-scale
    total); count/max cast to long for DuckDB BIGINT width parity."""
    orders = table(spark, sf_dir, "orders")
    payload = orders.select(
        F.to_json(
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.struct(
                    F.col("o_totalprice").alias("total"),
                    F.array(
                        F.floor(F.col("o_totalprice") / 1000).cast("long"),
                        F.floor(F.col("o_totalprice") / 100).cast("long"),
                        F.floor(F.col("o_totalprice") / 10).cast("long"),
                    ).alias("buckets"),
                ).alias("pricing"),
            )
        ).alias("payload")
    )
    shred = payload.select(F.parse_json("payload").alias("v")).select(
        F.variant_get("v", "$.status", "string").alias("status"),
        F.variant_get("v", "$.pricing.total", "double").alias("total"),
        F.variant_get(
            "v", "$.pricing.buckets[2]", "long").alias("top_bucket"),
    )
    return (
        shred.groupBy("status")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum("total"), 2).alias("revenue"),
            F.max("top_bucket").alias("max_bucket"),
        )
        .orderBy("status")
    )
