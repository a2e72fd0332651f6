"""SparkSession factory.

One place to pin every config that correctness or scale depends on:

- AQE on (runtime re-plan, skew-join handling, shuffle coalescing) —
  the 100 TB path relies on it; harmless at test scale.
- Session timezone UTC so parquet timestamp[ms]/[ns] values agree with
  the DuckDB oracle (SURVEY.md §7.3 item 2).
- shuffle.partitions sized for local[32] tests; on a real cluster this
  is left to AQE's coalescing from a higher initial value.
- Arrow enabled for the Pandas-UDF path (the only sanctioned Python
  compute path; row-at-a-time Python UDFs are banned in the hot path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "etl-finance-spark", *, cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or 32 (the driver's bench
    environment). On a real cluster the master/URL comes from
    spark-submit and the ``local[n]`` default is ignored.
    """
    n = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or n
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{n}]"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # several operators broadcast a <=1-row aggregate DERIVED FROM a
        # full input scan (fillna_mean's means, ntile_scalable's
        # cutpoints, frequent_items' total-slack row, embed_standardize's
        # stats): the broadcast future runs that scan under
        # spark.sql.broadcastTimeout, and the 300s default is sized for
        # prebuilt dim tables, not derived aggregates — at 100 TB the
        # scan legitimately outlives it. 1h matches what warehouses ship
        # for exactly this pattern; the rows broadcast stay tiny.
        .config("spark.sql.broadcastTimeout", "3600")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # events.ts is parquet TIMESTAMP(NANOS), which Spark cannot read
        # natively; read as long (ns since epoch), converted to a µs
        # timestamp in catalog.table (FIXTURES.md caution on ns).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # managed tables (bucketing) land outside the repo tree
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/spark-warehouse"))
    )
    return builder.getOrCreate()
