"""Custom batch data source via the Spark 4 Python Data Source API
(`pyspark.sql.datasource`).

The reference's sources are driver-side HTTP fetches into pandas
(/root/reference/etl.py `get_data` / `get_forex_data`: one requests.get,
one process). The Spark-native equivalent of "a source that is not a
file" is a DataSource implementation whose `partitions()` plans N
independent splits and whose `read(partition)` runs ON THE EXECUTORS —
here a deterministic synthetic tick feed, the same shape a partitioned
REST/paginated-API connector would take at 100 TB (one partition per
page/shard/day, fetched in parallel, no driver bottleneck, task retry =
source retry, which is how R-CTL-2's retry concern maps onto Spark).

Rows are a pure function of the row index, so the DuckDB oracle
reconstructs the identical feed from `range(n)` and the driver checks
the whole read→aggregate path EXACT — proving partition planning,
executor-side generation, and the aggregate all preserve values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_finance_spark.registry import register

SYMBOLS = ("AAPL", "MSFT", "GOOG", "AMZN", "META", "NVDA", "TSLA", "AMD")

TICK_SCHEMA = "tick_id bigint, symbol string, price double, qty bigint"


def _tick_row(i: int) -> tuple:
    """Row i of the synthetic feed — shared by reader and tests.
    Integer arithmetic only until the final /100.0, so every engine
    (Python here, DuckDB in the oracle) lands the same IEEE double."""
    cents = 10000 + (i * 48271) % 1000
    return (i, SYMBOLS[i % 8], cents / 100.0, 1 + (i * 16807) % 50)


def register_tick_source(spark: SparkSession) -> None:
    """Define and register the 'synthtick' source on this session.

    The DataSource subclass is created inside this function because the
    pyspark.sql.datasource API pickles the class to executors — keeping
    it closure-local avoids import-path coupling and lets the module
    import cleanly even if a future runtime lacks the API."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    class _RangePartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class _TickReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 10000))
            self.parts = int(options.get("parts", 8))

        def partitions(self):
            # Even row-range splits: this is the planner seam where a
            # real connector would enumerate pages / shards / dates.
            # An empty feed still plans one empty split — the API
            # expects at least one partition.
            step = max(1, -(-self.n // max(1, self.parts)))
            return [
                _RangePartition(lo, min(lo + step, self.n))
                for lo in range(0, self.n, step)
            ] or [_RangePartition(0, 0)]

        def read(self, partition):
            # Vectorized path: yield Arrow RecordBatches, not tuples —
            # the API's batch transfer (same Arrow lane Pandas UDFs
            # use) instead of per-row Python→JVM pickling. NumPy does
            # the integer formula columnwise; ~10× over row yields.
            import numpy as np
            import pyarrow as pa

            i = np.arange(partition.start, partition.end,
                          dtype=np.int64)
            cents = 10000 + (i * 48271) % 1000
            # explicit Arrow types: an empty object array can't infer
            # a string type, and the schema must hold for 0-row splits
            yield pa.record_batch(
                [
                    pa.array(i, type=pa.int64()),
                    pa.array(np.array(SYMBOLS, dtype=object)[i % 8],
                             type=pa.string()),
                    pa.array(cents / 100.0, type=pa.float64()),
                    pa.array(1 + (i * 16807) % 50, type=pa.int64()),
                ],
                names=["tick_id", "symbol", "price", "qty"],
            )

    class _TickStreamReader(SimpleDataSourceStreamReader):
        """Micro-batch form of the same feed: the offset is the row
        index, each batch advances it by `batch_rows` until `n`. This
        is the shape of a cursor/checkpoint-based API poller — offsets
        are exactly-once bookkeeping the engine persists to the
        checkpoint, and `readBetweenOffsets` replays a committed range
        deterministically on recovery."""

        def __init__(self, options):
            self.n = int(options.get("n", 10000))
            self.batch_rows = int(options.get("batch_rows", 1000))

        def initialOffset(self):
            return {"i": 0}

        def read(self, start):
            lo = int(start["i"])
            hi = min(lo + self.batch_rows, self.n)
            return (
                iter([_tick_row(i) for i in range(lo, hi)]),
                {"i": hi},
            )

        def readBetweenOffsets(self, start, end):
            return iter(
                [_tick_row(i)
                 for i in range(int(start["i"]), int(end["i"]))]
            )

    class TickDataSource(DataSource):
        @classmethod
        def name(cls):
            return "synthtick"

        def schema(self):
            return TICK_SCHEMA

        def reader(self, schema):
            return _TickReader(self.options)

        def simpleStreamReader(self, schema):
            return _TickStreamReader(self.options)

    spark.dataSource.register(TickDataSource)


def read_ticks(spark: SparkSession, n: int = 10000,
               parts: int = 8) -> DataFrame:
    register_tick_source(spark)
    return (
        spark.read.format("synthtick")
        .option("n", str(n))
        .option("parts", str(parts))
        .load()
    )


@register(
    "q_python_datasource",
    oracle="""
    SELECT symbol,
           CAST(count(*) AS BIGINT) AS n_ticks,
           round(sum(CAST(round(price * 100, 0) AS BIGINT)) / 100.0, 2)
               AS revenue,
           CAST(min(tick_id) AS BIGINT) AS first_tick,
           CAST(max(tick_id) AS BIGINT) AS last_tick,
           CAST(sum(qty) AS BIGINT) AS total_qty
    FROM (
        SELECT i AS tick_id,
               ['AAPL','MSFT','GOOG','AMZN','META','NVDA','TSLA','AMD']
                   [CAST(i % 8 AS BIGINT) + 1] AS symbol,
               (10000 + (i * 48271) % 1000) / 100.0 AS price,
               1 + (i * 16807) % 50 AS qty
        FROM range(0, 20000) t(i)
    )
    GROUP BY symbol ORDER BY symbol
    """,
)
def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the custom Python data source (20k ticks over 8 planned
    partitions) and aggregate per symbol. Revenue sums integer cents
    (recovered with round(price*100)) so the result is order-exact
    across engines; counts/extrema cast long for oracle width parity.
    The sf_dir argument is unused — this source exists precisely to
    show a non-file connector under the same query contract."""
    ticks = read_ticks(spark, n=20000, parts=8)
    return (
        ticks.groupBy("symbol")
        .agg(
            F.count("*").cast("long").alias("n_ticks"),
            F.round(
                F.sum(F.round(F.col("price") * 100, 0).cast("long"))
                / 100.0, 2,
            ).alias("revenue"),
            F.min("tick_id").alias("first_tick"),
            F.max("tick_id").alias("last_tick"),
            F.sum("qty").alias("total_qty"),
        )
    )
