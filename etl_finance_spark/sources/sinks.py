"""Sinks (SURVEY.md §2.1 R-SNK-1/2, §2.2 X-SNK-1/2).

The reference's load path is one INSERT per row over a single
connection (/root/reference/etl.py:183-191). The engine's equivalents:

- partitioned parquet append (the warehouse path);
- keyed idempotent upsert = dedup + anti-join + append (the unique-
  index insert-ignore contract, etl.py:187-189);
- JDBC egress batched per partition (executemany), never per row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str,
                      partition_by: Sequence[str] = ()) -> None:
    """X-SNK-1: partitioned parquet append. Partition columns become
    directories → partition pruning on read; at 100 TB pick low-
    cardinality keys (date, region) so files stay > ~100 MB."""
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_upsert(spark: SparkSession, incoming: DataFrame, path: str,
                 keys: Sequence[str]) -> None:
    """R-SNK-2: insert-if-absent on the key against a parquet target.
    Creates the target on first write. (On a Delta/Iceberg catalog this
    is `MERGE WHEN NOT MATCHED THEN INSERT`; plain parquet gets the
    equivalent anti-join append.)"""
    from pyspark.errors import AnalysisException

    from etl_finance_spark.operators.core import upsert_new_rows

    try:
        target = spark.read.parquet(path)
    except AnalysisException as e:
        # Same contract as streaming's foreach_batch_upsert: only a
        # missing target means "first write"; any other failure must
        # re-raise or redelivered rows would append un-deduplicated.
        if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
            raise
        incoming.dropDuplicates(list(keys)).write.parquet(path)
        return
    upsert_new_rows(incoming, target, keys).write.mode("append").parquet(path)


def write_jdbc(df: DataFrame, url: str, table: str, *,
               mode: str = "append", batchsize: int = 10_000,
               properties: dict | None = None) -> None:
    """X-SNK-2: JDBC egress — Spark batches `batchsize` rows per
    executemany per partition; one connection per partition, not per
    row (replaces etl.py:183's iterrows loop). Integration-tested
    against embedded Derby (ships in Spark's jars dir); a server-side
    target (MySQL, etl.py:84) is the same call with a different URL."""
    df.write.jdbc(url=url, table=table, mode=mode,
                  properties={"batchsize": str(batchsize),
                              **(properties or {})})


def write_orc(df: DataFrame, path: str,
              partition_by: Sequence[str] = ()) -> None:
    """ORC twin of write_partitioned — same layout guidance (low-
    cardinality partition keys, files > ~100 MB)."""
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
