"""Stock OHLCV pipeline — the reference's StockETL re-expressed
(/root/reference/etl.py:111-191) as composable DataFrame stages.

Stage shape mirrors the reference's template method run() = extract →
clean → transform → load (etl.py:104-108), but each stage is a pure
``DataFrame → DataFrame`` function, so the pipeline is one lazy plan:
nothing materializes until the sink.

Documented divergences from the reference (SURVEY.md §2.1 bug ledger):
- mean-fill works (the reference's ``df.mean`` without parens crashes
  whenever its NaN branch is reached, etl.py:142);
- pct-change windows partition by stock_name (the reference shifts over
  the *concatenated* multi-ticker frame, etl.py:132+166, so each
  ticker's first row reads the previous ticker's last close — a seam
  bug);
- the sink is a keyed idempotent upsert, batched — not one INSERT per
  row (etl.py:183-191).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType, TimestampNTZType,
)
from pyspark.sql.window import Window

from etl_finance_spark.operators.core import (
    add_tag, fill_nulls_with_mean, union_all,
)
from etl_finance_spark.sources.sinks import write_upsert

# Raw per-ticker bar schema (googlefinance.client frame shape,
# etl.py:121-134: Date index + OHLCV columns).
RAW_BAR_SCHEMA = StructType([
    StructField("date", TimestampNTZType()),
    StructField("open", DoubleType()),
    StructField("high", DoubleType()),
    StructField("low", DoubleType()),
    StructField("close", DoubleType()),
    StructField("volume", LongType()),
])

PRICE_COLS = ("price_open", "price_high", "price_low", "price_close")

# Sink schema = stock_ticks DDL (etl.py:176-180), FIXTURES.md §B.
UPSERT_KEYS = ("time_stamp", "stock_name")


def extract_stocks(frames: Iterable[tuple[str, DataFrame]]) -> DataFrame:
    """R-SRC-1 + R-UNION-1 + R-PROJ-1 (etl.py:121-134): tag each
    per-ticker frame with its entity id and union once."""
    return union_all(
        add_tag(df, "stock_name", ticker) for ticker, df in frames
    )


def clean_stocks(df: DataFrame) -> DataFrame:
    """R-CAST-1 + R-NULL-1 (etl.py:137-150): normalize names/types, then
    mean-fill missing prices (broadcast 1-row agg, never a driver trip)."""
    renamed = df.select(
        F.col("date"),
        F.col("open").cast("double").alias("price_open"),
        F.col("high").cast("double").alias("price_high"),
        F.col("low").cast("double").alias("price_low"),
        F.col("close").cast("double").alias("price_close"),
        F.col("volume").cast("long").alias("volume"),
        F.col("stock_name"),
    )
    return fill_nulls_with_mean(renamed, list(PRICE_COLS))


def transform_stocks(df: DataFrame) -> DataFrame:
    """R-DT-1/2 + R-WIN-1 (etl.py:154-170): date encodings + per-ticker
    lag-1 percent changes, null→0 for each ticker's first bar."""
    w = Window.partitionBy("stock_name").orderBy("date")
    # try_divide: zero/absent previous bar → null → 0 via the coalesce
    pct_ret = F.try_divide(F.col("price_open"),
                           F.lag("price_close", 1).over(w)) - 1
    pct_vol = F.try_divide(F.col("volume"), F.lag("volume", 1).over(w)) - 1
    return df.select(
        F.unix_timestamp("date").alias("time_stamp"),
        F.date_format("date", "dd-MM-yyyy").alias("short_date"),
        "stock_name",
        *PRICE_COLS,
        "volume",
        F.coalesce(pct_ret, F.lit(0.0)).alias("pct_ret"),
        F.coalesce(pct_vol, F.lit(0.0)).alias("pct_vol"),
    )


def load_stocks(spark: SparkSession, df: DataFrame, target: str) -> None:
    """R-SNK-1/2 (etl.py:174-191): create-if-absent + keyed upsert.
    short_date is dropped at the sink exactly as the reference's INSERT
    omits it (etl.py:182-191 — dead column, bug ledger)."""
    write_upsert(spark, df.drop("short_date"), target, UPSERT_KEYS)


def run_stock_pipeline(spark: SparkSession,
                       frames: Iterable[tuple[str, DataFrame]],
                       target: str) -> DataFrame:
    """run() = extract → clean → transform → load (etl.py:104-108)."""
    out = transform_stocks(clean_stocks(extract_stocks(frames)))
    load_stocks(spark, out, target)
    return out
