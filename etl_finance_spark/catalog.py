"""Fixture-table catalog.

Registers the driver's ten parquet tables (TESTDATA.md / FIXTURES.md §A)
as temp views so queries can be written against stable names — the same
names the DuckDB oracle pre-registers (__spark_entry__.py docstring).

At 100 TB these would be partitioned external tables (catalog-backed,
partition-pruned); the API here is the seam where that swap happens:
every operator goes through :func:`table`/:func:`register_views`, never
a hard-coded path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_session_confs(spark: SparkSession) -> None:
    """Pin the runtime confs correctness depends on, so queries behave
    identically on a caller-provided vanilla session (e.g. the driver's):
    ns-parquet readable, UTC wall-clock to match the DuckDB oracle."""
    for key, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        # derived-aggregate broadcasts (fillna_mean's means, ntile
        # cutpoints, frequent_items' total-slack row) run their input
        # scan under this timer; the 300s default is sized for prebuilt
        # dims, not a scan that legitimately runs long at scale — and
        # the driver's vanilla session never passes through
        # session.get_spark, so the conf must pin HERE to cover it
        ("spark.sql.broadcastTimeout", "3600"),
    ):
        try:
            if spark.conf.get(key, None) != val:
                spark.conf.set(key, val)
        except Exception:  # pragma: no cover - conf missing in future Spark
            pass


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (column pruning/filter pushdown reach the
    parquet scan because this is a plain declarative read)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Normalize events.ts to TIMESTAMP_NTZ at µs precision, whatever
        # the fixture generation wrote. Two physical layouts have shipped:
        # parquet TIMESTAMP(NANOS) (arrives as long ns under the
        # nanosAsLong conf; rounds ≤3 early) and parquet TIMESTAMP(MICROS)
        # (arrives as TIMESTAMP_NTZ directly; current). Branching on the
        # scanned dtype keeps every declared query working against both —
        # the DuckDB oracle mirrors with date_trunc('microseconds', ts),
        # which is ns-truncation on the old layout and identity on the new.
        df = df.withColumn("ts", _ts_to_ntz_us(df))
    return df


def _ts_to_ntz_us(df: DataFrame) -> F.Column:
    """events.ts → TIMESTAMP_NTZ(µs), adaptive to the scanned dtype."""
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        return F.expr(
            "timestampadd(MICROSECOND, ts div 1000,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        )
    return F.col("ts").cast("timestamp_ntz")


def events_between(spark: SparkSession, sf_dir: str,
                   start: str, end: str) -> DataFrame:
    """Time-range scan of events with the predicate PUSHED DOWN.

    ``table(...,'events')`` converts the raw int64 nanoseconds to a
    timestamp, so a filter on the converted column cannot reach the
    parquet scan (derived-column predicates never do). This helper
    filters the raw ns column first — the row-group min/max statistics
    prune at the scan — then converts. At 100 TB, where events would be
    date-partitioned, this is the difference between reading a day and
    reading the table."""
    import datetime as _dt

    from pyspark.sql.types import LongType

    def ns(s: str) -> int:
        t = _dt.datetime.fromisoformat(s).replace(tzinfo=_dt.timezone.utc)
        # int(t.timestamp()) * 1e9 would silently drop fractional
        # seconds from the bound (round-1 ADVICE); build ns from whole
        # seconds + microseconds so sub-second endpoints filter exactly.
        return int(t.timestamp()) * 10**9 + t.microsecond * 1_000

    _ensure_session_confs(spark)
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(raw.schema["ts"].dataType, LongType):
        # old ns-long layout: int64 bounds prune at row-group statistics
        lo, hi = F.lit(ns(start)), F.lit(ns(end))
    else:
        # µs-timestamp layout: native timestamp literals push down the
        # same way (comparisons on the stored column, not a derived one)
        lo = F.to_timestamp_ntz(F.lit(start))
        hi = F.to_timestamp_ntz(F.lit(end))
    raw = raw.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
    return raw.withColumn("ts", _ts_to_ntz_us(raw))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view named after itself."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
