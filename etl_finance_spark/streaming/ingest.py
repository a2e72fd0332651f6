"""Incremental file ingestion: process only files never seen before.

THE lake-operations primitive at 100 TB: a landing zone accumulates
files forever, and a daily/hourly refresh must cost |new files|, never
a rescan of the history. The Spark-first answer is not a hand-rolled
file-listing ledger — Structured Streaming's file source already
maintains an exactly-once FILE LOG in its checkpoint, and
``Trigger.AvailableNow`` turns the stream into a terminating batch
job: "process everything that has arrived since the last run, in
bounded micro-batches, then stop." Wrapping that is strictly better
than a bespoke manifest:

- **Exactly-once at file granularity** across crashes and re-runs —
  the checkpointed offsets commit per micro-batch; a re-run resumes,
  never re-reads (pinned in tests/test_ingest.py, including the
  nothing-new no-op run).
- **Bounded memory for any backlog**: ``max_files_per_trigger`` caps
  each micro-batch, so a 10-year backfill is a sequence of bounded
  jobs, not one giant one (witnessed: same rows, more batches).
- **Composes with every foreachBatch sink in this repo** — the
  anti-join upsert (streaming/windows.py), the rollup-partials
  maintenance sink (operators/incremental.py), or any (DataFrame,
  batch_id) function; batch_id-keyed sinks stay idempotent under
  redelivery of the LAST uncommitted batch, which is the streaming
  contract.

Latency-sensitive deployments pass a real trigger instead of one-shot
(this wrapper is for the scheduled-refresh shape); cloud object
stores with notification services would set cloudFiles-style options
on the same reader seam.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def incremental_ingest(
    spark: SparkSession,
    src_path: str,
    schema,
    checkpoint: str,
    batch_fn: Callable[[DataFrame, int], None],
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> int:
    """Run one incremental refresh over ``src_path``: every file not
    recorded in ``checkpoint``'s file log flows through ``batch_fn``
    in bounded micro-batches; returns the number of micro-batches
    executed (0 = nothing new). Blocks until the backlog drains
    (Trigger.AvailableNow), then stops — a scheduled-job body, not a
    daemon. The reader is the shared schema'd file-source seam
    (streaming/windows.read_event_stream); ``schema`` is required
    there so no run ever pays a directory-inference scan."""
    from etl_finance_spark.streaming.windows import read_event_stream

    batches = _CountingSink(batch_fn)
    q = (
        read_event_stream(spark, src_path, schema, fmt=fmt,
                          max_files_per_trigger=max_files_per_trigger)
        .writeStream.foreachBatch(batches)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return batches.n_batches


class _CountingSink:
    """foreachBatch wrapper that counts executed micro-batches (the
    only run-level signal the caller needs: 0 means the checkpoint
    already covered every file)."""

    def __init__(self, fn: Callable[[DataFrame, int], None]) -> None:
        self.fn = fn
        self.n_batches = 0

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.n_batches += 1
        self.fn(batch_df, batch_id)


def parquet_batch_sink(out: str) -> Callable[[DataFrame, int], None]:
    """batch_id-keyed idempotent parquet sink: each micro-batch lands
    in its own ``b{batch_id}`` directory with OVERWRITE, so redelivery
    of the last uncommitted batch (the streaming at-least-once seam)
    rewrites its own directory and converges instead of
    double-appending — the foreachBatch contract the module docstring
    asks of every sink. Directory names carry no ``=`` so read-back
    never triggers partition-column discovery."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out}/b{batch_id:09d}")

    return sink


def read_batch_dirs(spark: SparkSession, out: str, schema) -> DataFrame:
    """Read back everything ``parquet_batch_sink(out)`` landed. An
    empty landing run (zero batches ever executed — the source had no
    files) returns an empty frame of the given schema instead of
    failing PATH_NOT_FOUND on a directory no batch ever created.

    The listing happens ENGINE-side (a ``b*`` glob through Spark's
    Hadoop-FS layer), never via driver-local os.listdir: the sink
    writes through Spark, so ``out`` may be any filesystem Spark can
    reach (s3://, hdfs://) where a driver-local probe would silently
    see nothing and mistake present data for the empty-landing case.
    Only the PATH_NOT_FOUND condition maps to the empty frame — any
    other read failure propagates."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(schema).parquet(f"{out}/b*")
    except AnalysisException as e:
        # Prefer the structured error condition (stable API) over the
        # rendered message, which is just a formatting detail: Spark 4
        # names it getCondition(), older builds getErrorClass(). The
        # substring check stays as a last-resort fallback for builds
        # where neither accessor exists.
        getter = getattr(e, "getCondition", None) or getattr(
            e, "getErrorClass", None
        )
        cond = getter() if getter is not None else None
        if (cond == "PATH_NOT_FOUND") or (
            cond is None and "PATH_NOT_FOUND" in str(e)
        ):
            return spark.createDataFrame([], schema)
        raise


# ---------------------------------------------------------------------------
# Declared query — the batch-observable projection of the file-log tier
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    LongType, StringType, StructField, StructType,
)

from etl_finance_spark.registry import register  # noqa: E402

# Deliberately ts-free: the stream reads the fixture parquet RAW (the
# landing-zone shape — no catalog.table normalization layer exists in
# front of a landing zone), so the schema selects only layout-stable
# columns and the ts dual-physical-layout issue never arises.
_INGEST_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
])


@register(
    "q_incremental_ingest",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS events,
           CAST(min(event_id) AS BIGINT) AS first_event,
           CAST(max(event_id) AS BIGINT) AS last_event,
           CAST(0 AS BIGINT) AS rerun_batches
    FROM events GROUP BY event_type
    """,
)
def q_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once incremental ingestion, projected to a batch-
    checkable result: run the checkpointed AvailableNow refresh over
    the events landing path TWICE into a parquet sink, then aggregate
    what landed. Files-seen-once semantics make the output equal ONE
    copy of the source (the oracle's plain GROUP BY over events), and
    the witnessed second-run batch count is exposed as a column the
    oracle pins to 0 — a re-run after no new drops must cost nothing.
    Fresh checkpoint/sink dirs per call keep the query idempotent for
    repeated harness invocations; the sink is the batch_id-keyed
    overwrite sink (executor-side, no driver collect), so even a
    redelivered uncommitted batch would converge rather than
    double-count."""
    import atexit
    import os
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="q_incremental_ingest_")
    # the frame is consumed in-process (driver collect / noop sink), so
    # the checkpoint + staged output can go with the process — without
    # this every harness invocation leaks a dir onto /tmp forever
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    ck, out = f"{work}/ck", f"{work}/out"
    sink = parquet_batch_sink(out)

    # The file source's path must be a DIRECTORY (the landing zone);
    # stage the fixture file into one — symlinked, so no data copy.
    # abspath: the link lives in /tmp, so a relative sf_dir (which
    # catalog.table accepts fine) would otherwise dangle.
    fixture = os.path.abspath(f"{sf_dir}/events.parquet")
    src = f"{work}/landing"
    os.mkdir(src)
    try:
        os.symlink(fixture, f"{src}/events.parquet")
    except OSError:  # pragma: no cover - symlink-less FS
        shutil.copy(fixture, f"{src}/events.parquet")
    incremental_ingest(spark, src, _INGEST_SCHEMA, ck, sink)
    rerun_batches = incremental_ingest(spark, src, _INGEST_SCHEMA, ck, sink)
    return (
        read_batch_dirs(spark, out, _INGEST_SCHEMA)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("events"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        .withColumn("rerun_batches", F.lit(rerun_batches).cast("long"))
    )
