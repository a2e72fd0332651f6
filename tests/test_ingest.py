"""Incremental file ingestion (streaming/ingest.py): exactly-once file
discovery across runs, bounded-backlog micro-batching, and composition
with the repo's idempotent sinks."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from etl_finance_spark.streaming.ingest import (
    incremental_ingest, parquet_batch_sink, read_batch_dirs,
)

SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("tag", StringType()),
])


def _drop(spark, path, ids, tag):
    spark.createDataFrame([(i, tag) for i in ids], SCHEMA) \
        .coalesce(1).write.mode("append").parquet(path)


class _Collect:
    """Driver-side collecting sink (local-mode test harness)."""

    def __init__(self):
        self.rows: list[tuple] = []

    def __call__(self, df, batch_id):
        self.rows.extend((r["id"], r["tag"]) for r in df.collect())


def test_incremental_ingest_processes_each_file_exactly_once(spark, tmp_path):
    """Run 1 sees the initial drop; run 2 sees ONLY the new file; a
    run with nothing new executes zero batches and emits zero rows —
    refresh cost is |new files|, independent of history size."""
    src = str(tmp_path / "landing")
    ck = str(tmp_path / "ck")
    sink = _Collect()

    _drop(spark, src, [1, 2, 3], "a")
    n1 = incremental_ingest(spark, src, SCHEMA, ck, sink)
    assert n1 >= 1
    assert sorted(sink.rows) == [(1, "a"), (2, "a"), (3, "a")]

    _drop(spark, src, [4, 5], "b")
    sink.rows.clear()
    n2 = incremental_ingest(spark, src, SCHEMA, ck, sink)
    assert n2 >= 1
    assert sorted(sink.rows) == [(4, "b"), (5, "b")], (
        "a re-run must not re-read files the checkpoint already covers"
    )

    sink.rows.clear()
    n3 = incremental_ingest(spark, src, SCHEMA, ck, sink)
    assert n3 == 0 and sink.rows == []


def test_incremental_ingest_bounds_backlog_batches(spark, tmp_path):
    """max_files_per_trigger caps each micro-batch: a 4-file backlog
    at cap 1 drains in >= 4 batches with the same total rows — the
    bounded-memory backfill shape (one giant batch is exactly what a
    100 TB landing-zone catch-up must not be)."""
    import pytest

    src = str(tmp_path / "landing")
    for i in range(4):
        _drop(spark, src, [i], f"f{i}")
    sink = _Collect()
    n = incremental_ingest(spark, src, SCHEMA, str(tmp_path / "ck1"), sink,
                           max_files_per_trigger=1)
    assert n >= 4
    assert sorted(sink.rows) == sorted((i, f"f{i}") for i in range(4))
    # same files, one batch, same rows — the cap changes batching only
    sink2 = _Collect()
    n_all = incremental_ingest(spark, src, SCHEMA, str(tmp_path / "ck2"),
                               sink2)
    assert n_all == 1
    assert sorted(sink2.rows) == sorted(sink.rows)
    with pytest.raises(ValueError, match="max_files_per_trigger"):
        incremental_ingest(spark, src, SCHEMA, str(tmp_path / "ck3"), sink,
                           max_files_per_trigger=0)


def test_incremental_ingest_composes_with_upsert_sink(spark, tmp_path):
    """End-to-end with the repo's anti-join upsert sink: two refresh
    runs land disjoint keys; a key redelivered in a LATER drop (a
    republished file) is dropped by the upsert — the at-least-once
    file boundary composes with the idempotent sink into exactly-once
    rows at rest."""
    from etl_finance_spark.streaming.windows import foreach_batch_upsert

    src = str(tmp_path / "landing")
    ck = str(tmp_path / "ck")
    target = str(tmp_path / "table")
    sink = foreach_batch_upsert(target, ["id"])

    _drop(spark, src, [1, 2], "a")
    incremental_ingest(spark, src, SCHEMA, ck, sink)
    _drop(spark, src, [2, 3], "b")  # id=2 republished
    incremental_ingest(spark, src, SCHEMA, ck, sink)

    rows = {(r["id"], r["tag"])
            for r in spark.read.parquet(target).collect()}
    assert rows == {(1, "a"), (2, "a"), (3, "b")}
    assert spark.read.parquet(target).groupBy("id").count() \
        .filter(F.col("count") > 1).count() == 0


def test_parquet_batch_sink_redelivery_converges(spark, tmp_path):
    """The streaming contract: foreachBatch may redeliver the LAST
    uncommitted micro-batch after a crash. The batch_id-keyed overwrite
    sink must converge (one copy of the batch at rest), where a blind
    append would double-count."""
    out = str(tmp_path / "out")
    sink = parquet_batch_sink(out)
    batch = spark.createDataFrame([(1, "a"), (2, "a")], SCHEMA)
    sink(batch, 0)
    sink(batch, 0)  # redelivery of the same uncommitted batch
    sink(spark.createDataFrame([(3, "b")], SCHEMA), 1)
    rows = sorted(
        (r["id"], r["tag"])
        for r in read_batch_dirs(spark, out, SCHEMA).collect()
    )
    assert rows == [(1, "a"), (2, "a"), (3, "b")]


def test_read_batch_dirs_empty_source_returns_empty_frame(spark, tmp_path):
    """Zero batches ever ran (empty landing zone): the read-back must
    return an empty frame of the declared schema, not PATH_NOT_FOUND —
    both for a never-created out dir and a created-but-empty one."""
    missing = read_batch_dirs(spark, str(tmp_path / "never_created"), SCHEMA)
    assert missing.count() == 0 and missing.schema == SCHEMA
    empty = tmp_path / "out"
    empty.mkdir()
    df = read_batch_dirs(spark, str(empty), SCHEMA)
    assert df.count() == 0 and df.schema == SCHEMA


def test_ingest_schema_stays_raw_read_safe():
    """q_incremental_ingest streams the events fixture RAW (a landing
    zone has no normalization layer in front of it — the CLAUDE.md
    sanctioned exception). That is safe ONLY while _INGEST_SCHEMA
    selects ts-free, layout-stable columns: the events.ts column is
    physically TIMESTAMP(NANOS) parquet, which a vanilla driver session
    cannot read without catalog.table's conf. Pin the property so a
    future schema edit re-derives the safety argument instead of
    silently inheriting it."""
    from pyspark.sql.types import LongType, StringType

    from etl_finance_spark.streaming.ingest import _INGEST_SCHEMA

    for f in _INGEST_SCHEMA.fields:
        assert isinstance(f.dataType, (LongType, StringType)), (
            f"{f.name}: raw-read schema must stay scalar long/string"
        )
        assert "ts" != f.name and not f.name.endswith("_ts"), (
            f"{f.name}: no timestamp columns in the raw landing read"
        )
