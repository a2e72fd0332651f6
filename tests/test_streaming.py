"""Streaming tests: stream/batch equivalence + the upsert sink's
idempotency (SURVEY.md §5 layers 2-3, §2.3)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE
from etl_finance_spark.catalog import table
from etl_finance_spark.streaming.windows import (
    foreach_batch_upsert, read_event_stream, session_counts,
    streaming_dedup, tumbling_counts,
)


@pytest.fixture()
def event_stream_dir(spark):
    """events sf0.001 split into 3 parquet drop-files (deterministic
    micro-batches via maxFilesPerTrigger=1)."""
    events = table(spark, SF_SMOKE, "events")
    tmp = tempfile.mkdtemp(prefix="stream-src-")
    for i in range(3):
        events.filter(F.pmod(F.col("event_id"), F.lit(3)) == i).coalesce(
            1
        ).write.mode("append").parquet(tmp)
    yield tmp, events.schema
    shutil.rmtree(tmp, ignore_errors=True)


def _run_stream(spark, stream_df, query_name, mode="complete"):
    out = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .start()
    )
    out.processAllAvailable()
    out.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def test_tumbling_stream_equals_batch(spark, event_stream_dir):
    path, schema = event_stream_dir
    stream = read_event_stream(spark, path, schema)
    got = _run_stream(spark, tumbling_counts(stream), "t_tumbling")
    want = tumbling_counts(spark.read.schema(schema).parquet(path))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_session_stream_equals_batch(spark, event_stream_dir):
    path, schema = event_stream_dir
    stream = read_event_stream(spark, path, schema)
    got = _run_stream(spark, session_counts(stream), "t_session")
    want = session_counts(spark.read.schema(schema).parquet(path))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_streaming_dedup_drops_duplicate_keys(spark, event_stream_dir):
    path, schema = event_stream_dir
    # duplicate every event by writing the whole dir again as new files
    dup_dir = tempfile.mkdtemp(prefix="stream-dup-")
    try:
        df = spark.read.schema(schema).parquet(path)
        df.coalesce(1).write.mode("append").parquet(dup_dir)
        df.coalesce(1).write.mode("append").parquet(dup_dir)
        stream = read_event_stream(spark, dup_dir, schema)
        got = _run_stream(
            spark, streaming_dedup(stream).select("event_id"), "t_dedup",
            mode="append",
        )
        ids = [r.event_id for r in got.collect()]
        assert len(ids) == len(set(ids)) == df.count()
    finally:
        shutil.rmtree(dup_dir, ignore_errors=True)


def test_foreach_batch_upsert_idempotent(spark, event_stream_dir):
    path, schema = event_stream_dir
    target = tempfile.mkdtemp(prefix="upsert-tgt-") + "/t"
    try:
        stream = read_event_stream(spark, path, schema)
        q = (
            stream.writeStream.foreachBatch(
                foreach_batch_upsert(target, ["event_id"])
            )
            .start()
        )
        q.processAllAvailable()
        q.stop()
        first = spark.read.parquet(target).count()
        # redeliver the whole stream from scratch → no new rows
        stream2 = read_event_stream(spark, path, schema)
        q2 = (
            stream2.writeStream.foreachBatch(
                foreach_batch_upsert(target, ["event_id"])
            )
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt-"))
            .start()
        )
        q2.processAllAvailable()
        q2.stop()
        again = spark.read.parquet(target)
        assert again.count() == first
        assert again.select("event_id").distinct().count() == first
    finally:
        shutil.rmtree(target, ignore_errors=True)


def test_sliding_stream_equals_batch(spark, event_stream_dir):
    path, schema = event_stream_dir
    from etl_finance_spark.streaming.windows import sliding_counts

    stream = read_event_stream(spark, path, schema)
    got = _run_stream(spark, sliding_counts(stream), "t_sliding")
    want = sliding_counts(spark.read.schema(schema).parquet(path))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_watermark_bounds_dedup_state(spark):
    """X-STR-4/5 observable: dropDuplicatesWithinWatermark evicts a
    key's dedup state once the watermark passes its expiry — the
    bounded-state contract, read deterministically from the state-store
    metrics (numRowsRemoved) with lexically-ordered micro-batches.

    (Empirically pinned semantics: late input rows are NOT dropped by
    this operator — numRowsDroppedByWatermark stays 0 — and duplicates
    are only guaranteed removed when they arrive within the delay;
    what the watermark bounds is the STATE, which is what matters for
    a 100 TB stream.)"""
    import datetime as dt
    import glob
    import shutil
    import tempfile

    from pyspark.sql.types import (
        LongType, StructField, StructType, TimestampNTZType,
    )

    schema = StructType([
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
    ])
    base = dt.datetime(2024, 1, 1)
    src = tempfile.mkdtemp(prefix="wm-src-")
    staging = tempfile.mkdtemp(prefix="wm-stage-")
    try:
        batches = [
            [(1, base)],                          # state: {1}
            [(2, base + dt.timedelta(hours=2))],  # watermark → +1h50m
            [(3, base + dt.timedelta(hours=2, minutes=1))],  # 1 evicted here
        ]
        for i, rows in enumerate(batches):
            d = f"{staging}/{i}"
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
            part = glob.glob(f"{d}/part-*.parquet")[0]
            # lexical names pin micro-batch order under maxFilesPerTrigger=1
            shutil.copy(part, f"{src}/batch-{i}.parquet")
        stream = read_event_stream(spark, src, schema)
        out = (
            streaming_dedup(stream, delay="10 minutes")
            .select("event_id")
            .writeStream.format("memory")
            .queryName("t_wm_evict")
            .outputMode("append")
            .start()
        )
        out.processAllAvailable()
        removed = sum(
            p["stateOperators"][0]["numRowsRemoved"]
            for p in out.recentProgress
            if p["stateOperators"]
        )
        final_state = [
            p["stateOperators"][0]["numRowsTotal"]
            for p in out.recentProgress
            if p["stateOperators"]
        ][-1]
        out.stop()
        ids = sorted(
            r.event_id for r in spark.sql("SELECT * FROM t_wm_evict").collect()
        )
        assert ids == [1, 2, 3]
        assert removed >= 1          # id 1's entry was evicted
        assert final_state < len(ids)  # state stays bounded below key count
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(staging, ignore_errors=True)


def test_stateful_running_totals(spark, event_stream_dir):
    """applyInPandasWithState: state accumulates across micro-batches —
    the LAST emission per user equals the batch groupBy aggregate."""
    from pyspark.sql import functions as F

    from etl_finance_spark.streaming.stateful import running_user_totals

    path, schema = event_stream_dir
    stream = read_event_stream(spark, path, schema).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("append")
        .start()
    )
    out.processAllAvailable()
    out.stop()
    emitted = spark.sql("SELECT * FROM t_stateful").collect()
    # keep the max-count emission per user (the final state)
    final = {}
    for r in emitted:
        if r.user_id not in final or r.n_events > final[r.user_id].n_events:
            final[r.user_id] = r
    batch = {
        r.user_id: r
        for r in spark.read.schema(schema)
        .parquet(path)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .collect()
    }
    assert set(final) == set(batch)
    for uid, want in batch.items():
        got = final[uid]
        assert got.n_events == want.n_events
        assert abs(got.total_value - want.total_value) < 1e-6


def test_stream_static_enrichment(spark, event_stream_dir):
    """Stream-static join: every micro-batch row picks up its dim
    attributes; stream result equals the batch join."""
    from etl_finance_spark.streaming.joins import enrich_with_dim

    path, schema = event_stream_dir
    dim = spark.createDataFrame(
        [(i, f"tier{i % 3}") for i in range(200)], ["user_id", "tier"]
    )
    stream = read_event_stream(spark, path, schema).select(
        "event_id", "user_id"
    )
    got = _run_stream(
        spark, enrich_with_dim(stream, dim), "t_enrich", mode="append"
    )
    want = enrich_with_dim(
        spark.read.schema(schema).parquet(path).select("event_id", "user_id"),
        dim,
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_stream_stream_join_equals_batch(spark):
    """Watermarked stream-stream join: click→purchase pairs within 60
    minutes; the streamed result equals the batch formulation when the
    stream arrives in (rough) time order — which is the realistic
    arrival pattern the watermark contract assumes. (A stream split
    arbitrarily across the full time range WOULD lose cross-batch pairs
    to state eviction: that's the watermark doing its job, not a bug.)"""
    import shutil
    import tempfile

    from etl_finance_spark.streaming.joins import followed_within
    from etl_finance_spark.streaming.windows import with_watermark

    events = table(spark, SF_SMOKE, "events")
    schema = events.schema
    path = tempfile.mkdtemp(prefix="ss-join-")
    # chronological micro-batches: ~10-day slices of the month
    for lo, hi in (("2024-01-01", "2024-01-11"),
                   ("2024-01-11", "2024-01-21"),
                   ("2024-01-21", "2024-02-01")):
        events.filter(
            (F.col("ts") >= lo) & (F.col("ts") < hi)
        ).coalesce(1).write.mode("append").parquet(path)

    def split(df):
        clicks = df.filter(F.col("event_type") == "click")
        purchases = df.filter(F.col("event_type") == "purchase")
        return clicks, purchases

    s = read_event_stream(spark, path, schema)
    sc, sp = split(s)
    got = _run_stream(
        spark,
        followed_within(
            with_watermark(sc, "2 days"), with_watermark(sp, "2 days")
        ),
        "t_ss_join",
        mode="append",
    )
    b = spark.read.schema(schema).parquet(path)
    b = b.withColumn("ts", F.col("ts").cast("timestamp"))
    bc, bp = split(b)
    want = followed_within(bc, bp)
    try:
        assert got.count() > 0
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_foreach_batch_upsert_reraises_non_missing_errors(spark, tmp_path):
    """Only a MISSING target means 'first batch'. A corrupt target must
    raise, not silently append without the anti-join (round-1 ADVICE —
    that would duplicate redelivered rows)."""
    import pytest

    target = str(tmp_path / "corrupt_target")
    (tmp_path / "corrupt_target").mkdir()
    (tmp_path / "corrupt_target" / "part-0.parquet").write_text("not parquet")
    batch = spark.createDataFrame([(1, "a")], ["event_id", "v"])
    sink = foreach_batch_upsert(target, ["event_id"])
    with pytest.raises(Exception):
        sink(batch, 0)
    # and a genuinely missing path still bootstraps the target
    fresh_target = str(tmp_path / "fresh_target")
    sink2 = foreach_batch_upsert(fresh_target, ["event_id"])
    sink2(batch, 0)
    assert spark.read.parquet(fresh_target).count() == 1


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401
        return True
    except ImportError:
        return False


class TestCogroupAsof:
    def test_cogroup_matches_relational_asof(self, spark):
        """Third independent implementation of the as-of semantics:
        cogrouped applyInPandas (orders ⋈ lineitem per orderkey, first
        shipment at-or-after order date computed in pandas) must equal
        the declared relational plan (equi-join + temporal filter +
        min aggregate, q_join_asof) — which the DuckDB oracle already
        checks. Covers the cogroup API surface the other pandas paths
        (grouped apply, mapInPandas, withState) don't touch."""
        import pandas as pd

        from etl_finance_spark import registry
        from etl_finance_spark.catalog import table

        sf = SF_SMOKE
        orders = table(spark, sf, "orders").select(
            "o_orderkey", "o_orderdate")
        li = table(spark, sf, "lineitem").select(
            "l_orderkey", "l_shipdate")

        def first_ship(left: pd.DataFrame,
                       right: pd.DataFrame) -> pd.DataFrame:
            if left.empty:
                return pd.DataFrame(
                    columns=["o_orderkey", "first_ship_date"])
            cut = left["o_orderdate"].iloc[0]
            ok = right.loc[right["l_shipdate"] >= cut, "l_shipdate"]
            return pd.DataFrame({
                "o_orderkey": left["o_orderkey"].iloc[:1],
                "first_ship_date":
                    [ok.min() if len(ok) else pd.NaT],
            })

        via_cogroup = (
            orders.groupBy("o_orderkey")
            .cogroup(li.groupBy("l_orderkey"))
            .applyInPandas(
                first_ship,
                "o_orderkey long, first_ship_date timestamp")
            .select("o_orderkey",
                    F.col("first_ship_date").cast("date")
                    .alias("first_ship_date"))
        )
        declared = registry.collect()["q_join_asof"].fn(spark, sf)
        got = {(r.o_orderkey, r.first_ship_date)
               for r in via_cogroup.collect()}
        want = {(r.o_orderkey, r.first_ship_date)
                for r in declared.collect()}
        assert got == want


@pytest.mark.skipif(not _has_protobuf(), reason=(
    "transformWithStateInPandas needs protobuf (its state-server "
    "protocol: pyspark.sql.streaming.proto); not shipped in this "
    "container — applyInPandasWithState above is the covered "
    "stateful rung. This test activates wherever protobuf exists. "
    "(r13 re-checked: no google.protobuf on the import path and the "
    "environment forbids package installs, so the gate stands.)"))
class TestTransformWithState:
    def test_running_totals_carry_state(self, spark, tmp_path):
        import pandas as pd
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
        )
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType,
        )

        from etl_finance_spark.sources.pysource import (
            register_tick_source,
        )

        class RunningQty(StatefulProcessor):
            def init(self, handle):
                self.state = handle.getValueState(
                    "tot",
                    StructType([StructField("total", LongType())]))

            def handleInputRows(self, key, rows, timerValues):
                total = (self.state.get()[0]
                         if self.state.exists() else 0)
                for pdf in rows:
                    total += int(pdf["qty"].sum())
                self.state.update((total,))
                yield pd.DataFrame(
                    {"symbol": [key[0]], "total": [total]})

            def close(self):
                pass

        register_tick_source(spark)
        stream = (
            spark.readStream.format("synthtick")
            .option("n", "2000").option("batch_rows", "500").load()
        )
        out = stream.groupBy("symbol").transformWithStateInPandas(
            RunningQty(),
            outputStructType=StructType([
                StructField("symbol", StringType()),
                StructField("total", LongType()),
            ]),
            outputMode="Update", timeMode="None",
        )
        q = (
            out.writeStream.format("memory").queryName("tws_test")
            .option("checkpointLocation", str(tmp_path / "ck")).start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        last = {
            r.symbol: r.t
            for r in spark.sql(
                "SELECT symbol, max(total) AS t FROM tws_test"
                " GROUP BY symbol").collect()
        }
        batch = {
            r.symbol: r.t
            for r in spark.read.format("synthtick").option("n", "2000")
            .load().groupBy("symbol")
            .agg(F.sum("qty").alias("t")).collect()
        }
        assert last == batch


def test_watermark_drops_late_rows_from_windowed_agg(spark):
    """THE append-mode watermark contract: a windowed aggregate emits a
    window exactly once, in the batch whose watermark first exceeds the
    window end (evicting its state), and a row for that window arriving
    in any LATER batch is dropped (numRowsDroppedByWatermark) — never a
    second, corrected emission. A consumer of an emitted window can
    treat it as immutable; that is what bounds result mutability on an
    unbounded stream. (Empirically pinned nuance: a late row landing in
    the SAME batch that evicts its window still merges — the late
    filter and eviction share the batch watermark — so the drop is
    observable only once the window left the state store.)"""
    import datetime as dt
    import glob
    import shutil
    import tempfile

    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampNTZType,
    )

    from etl_finance_spark.streaming.windows import (
        tumbling_counts, with_watermark,
    )

    schema = StructType([
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampNTZType()),
    ])
    base = dt.datetime(2024, 1, 1)
    src = tempfile.mkdtemp(prefix="late-src-")
    staging = tempfile.mkdtemp(prefix="late-stage-")
    try:
        batches = [
            [(1, "click", base)],                       # window [00:00,01:00)
            [(2, "click", base + dt.timedelta(hours=3))],   # wm → 02:50 after
            # wm=02:50 is in force HERE, so window1 evicts+emits (n=1)
            [(4, "click", base + dt.timedelta(hours=3, minutes=5))],
            # window1 is closed and gone from state: this row must DROP
            # (a row late while its window is merely still open merges
            # instead — eviction and the late-filter share the batch
            # watermark, so the drop needs a previously-evicted window)
            [(3, "click", base + dt.timedelta(minutes=5))],
        ]
        for i, rows in enumerate(batches):
            d = f"{staging}/{i}"
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
            part = glob.glob(f"{d}/part-*.parquet")[0]
            shutil.copy(part, f"{src}/batch-{i}.parquet")
        stream = read_event_stream(spark, src, schema)
        q = (
            tumbling_counts(with_watermark(stream, "10 minutes"))
            .writeStream.format("memory")
            .queryName("t_late_drop")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        dropped = sum(
            p["stateOperators"][0]["numRowsDroppedByWatermark"]
            for p in q.recentProgress
            if p["stateOperators"]
        )
        q.stop()
        rows = {
            (r.window_start, r.event_type): r.n
            for r in spark.sql("SELECT * FROM t_late_drop").collect()
        }
        first_window = int(base.replace(
            tzinfo=dt.timezone.utc).timestamp())
        # the closed window emitted once with ONLY the on-time row
        assert rows[(first_window, "click")] == 1
        assert dropped >= 1
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(staging, ignore_errors=True)


def test_stream_stream_left_outer_emits_on_eviction(spark):
    """Left-outer stream-stream join tier (followed_within
    how='left_outer'): unmatched firsts null-pad, but only once the
    watermark passes their match deadline (ts + bound) — eviction IS
    emission, so results trail the watermark by the join window and a
    still-matchable first must NOT emit early. Deterministic
    lexically-ordered micro-batches:

      batch 0: v1(u1 10:00), c1(u1 10:30 click), v2(u2 10:05)
      batch 1: x1(u9 13:00)            → watermark 13:00 after it
      batch 2: v3(u3 15:30), x2(u9 16:00 click)

    v1 matches c1; v2's deadline (11:05) is behind the 13:00 watermark
    when batch 2 runs → (v2, NULL) emits; v3's deadline (16:30) is
    ahead of the final 16:00 watermark → pending forever, absent. The
    batch formulation of the same function null-pads everything
    immediately — the streamed rows must be exactly the batch rows
    whose deadline the final watermark passed, plus all matches."""
    import datetime as dt
    import glob
    import shutil
    import tempfile

    from pyspark.sql.types import (
        StringType, StructField, StructType, TimestampNTZType,
    )

    from etl_finance_spark.streaming.joins import followed_within
    from etl_finance_spark.streaming.windows import with_watermark

    schema = StructType([
        StructField("event_id", StringType()),
        StructField("user_id", StringType()),
        StructField("ts", TimestampNTZType()),
        StructField("event_type", StringType()),
    ])
    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    batches = [
        [("v1", "u1", t(10, 0), "view"),
         ("c1", "u1", t(10, 30), "click"),
         ("v2", "u2", t(10, 5), "view")],
        [("x1", "u9", t(13, 0), "view")],
        [("v3", "u3", t(15, 30), "view"),
         ("x2", "u9", t(16, 0), "click")],
    ]
    src = tempfile.mkdtemp(prefix="lo-src-")
    staging = tempfile.mkdtemp(prefix="lo-stage-")
    try:
        for i, rows in enumerate(batches):
            d = f"{staging}/{i}"
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
            part = glob.glob(f"{d}/part-*.parquet")[0]
            shutil.copy(part, f"{src}/batch-{i}.parquet")

        def split(df):
            views = df.filter(F.col("event_type") == "view")
            clicks = df.filter(F.col("event_type") == "click")
            return views, clicks

        s = read_event_stream(spark, src, schema)
        sv, sc = split(s)
        got_df = _run_stream(
            spark,
            followed_within(
                with_watermark(sv, "0 seconds"),
                with_watermark(sc, "0 seconds"),
                minutes=60, how="left_outer",
            ),
            "t_lo_join",
            mode="append",
        )
        got = {(r.a_id, r.b_id) for r in got_df.collect()}

        b = spark.read.schema(schema).parquet(src)
        b = b.withColumn("ts", F.col("ts").cast("timestamp"))
        bv, bc = split(b)
        batch_rows = {
            (r.a_id, r.b_id)
            for r in followed_within(
                bv, bc, minutes=60, how="left_outer").collect()
        }
        assert batch_rows == {
            ("v1", "c1"), ("v2", None), ("x1", None), ("v3", None)
        }

        assert ("v1", "c1") in got            # matches emit normally
        assert ("v2", None) in got            # deadline long past → emitted
        assert ("v3", None) not in got        # still matchable → pending
        # every streamed row is a batch row; the only rows allowed to be
        # missing are unmatched views whose deadline the final watermark
        # (16:00) hasn't passed — v3 always, x1 only if the post-batch
        # watermark bump never got a no-data batch to act on
        assert got <= batch_rows
        assert batch_rows - got <= {("v3", None), ("x1", None)}
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(staging, ignore_errors=True)
