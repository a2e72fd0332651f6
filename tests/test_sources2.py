"""Source/sink surface beyond parquet+CSV+JSON+JDBC: ORC round-trip,
text lines, the binaryFile multimodal-ingest rung, the Observation API
(single-pass ingest metrics), and the streaming form of the custom
Python data source (offset bookkeeping + deterministic replay).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Observation
from pyspark.sql import functions as F

from etl_finance_spark.catalog import table
from etl_finance_spark.sources.pysource import register_tick_source
from etl_finance_spark.sources.readers import (
    read_binary_files,
    read_orc,
    read_text,
)
from etl_finance_spark.sources.sinks import write_orc

from conftest import SF_CORRECT


class TestOrc:
    def test_round_trip_partitioned(self, spark):
        """nation → ORC partitioned by region key → read back: values
        and schema survive (partition column comes back, possibly
        re-typed by directory inference — compare as int)."""
        src = table(spark, SF_CORRECT, "nation")
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "nation_orc")
            write_orc(src, path, partition_by=["n_regionkey"])
            back = read_orc(spark, path)
            want = {
                (r.n_nationkey, r.n_name, int(r.n_regionkey))
                for r in src.collect()
            }
            got = {
                (r.n_nationkey, r.n_name, int(r.n_regionkey))
                for r in back.collect()
            }
            assert got == want


class TestText:
    def test_line_and_document_grain(self, spark):
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "a.txt")
            with open(p, "w") as f:
                f.write("alpha\nbeta\ngamma\n")
            lines = read_text(spark, d)
            assert lines.columns == ["value"]
            assert {r.value for r in lines.collect()} == {
                "alpha", "beta", "gamma"}
            whole = read_text(spark, d, whole=True)
            assert whole.count() == 1
            assert whole.collect()[0].value == "alpha\nbeta\ngamma\n"


class TestBinaryFile:
    def test_content_and_metadata_filter(self, spark):
        """Two payload files + one decoy; the glob excludes the decoy
        and a length filter selects on metadata alone. Content bytes
        round-trip exactly — the invariant llm/multimodal.py's decode
        rung depends on."""
        with tempfile.TemporaryDirectory() as d:
            small = b"\x00\x01\x02"
            big = bytes(range(256)) * 4
            open(os.path.join(d, "a.bin"), "wb").write(small)
            open(os.path.join(d, "b.bin"), "wb").write(big)
            open(os.path.join(d, "ignore.txt"), "w").write("nope")
            df = read_binary_files(spark, d, glob="*.bin")
            rows = {os.path.basename(r.path): r for r in df.collect()}
            assert set(rows) == {"a.bin", "b.bin"}
            assert bytes(rows["a.bin"].content) == small
            assert rows["b.bin"].length == len(big)
            only_big = df.filter(F.col("length") > 100)
            assert [os.path.basename(r.path)
                    for r in only_big.collect()] == ["b.bin"]


class TestObservation:
    def test_single_pass_ingest_metrics(self, spark):
        """Observation attaches metric expressions to a plan and
        harvests them from the SAME action that produced the output —
        the zero-extra-scan form of q_profile_events' ingest counters.
        Metrics must equal a direct aggregate."""
        orders = table(spark, SF_CORRECT, "orders")
        obs = Observation("ingest")
        observed = orders.observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            # DISTINCT aggregates are rejected in observed metrics
            # (they'd break single-pass harvesting); the sketch form
            # is the supported spelling — same trade as
            # operators/sketches.py
            F.approx_count_distinct("o_custkey", 0.01).alias("customers"),
        )
        out = observed.filter(F.col("o_orderstatus") == "F").count()
        assert out > 0
        direct = orders.agg(
            F.count(F.lit(1)).alias("rows"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count_distinct("o_custkey").alias("customers"),
        ).collect()[0]
        got = obs.get
        assert got["rows"] == direct.rows
        assert got["revenue"] == direct.revenue
        assert abs(got["customers"] - direct.customers) <= (
            0.05 * direct.customers)


class TestTickStream:
    def test_drains_exactly_once(self, spark):
        """The streaming form of the synthtick source: offsets advance
        by batch_rows until n, the memory sink accumulates every row
        exactly once, and values match the batch read (same formula,
        same engine-checkpointed offset ranges)."""
        register_tick_source(spark)
        stream = (
            spark.readStream.format("synthtick")
            .option("n", "2500").option("batch_rows", "1000").load()
        )
        with tempfile.TemporaryDirectory() as ckpt:
            q = (
                stream.writeStream.format("memory")
                .queryName("tick_stream_test")
                .option("checkpointLocation", ckpt)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            agg = spark.sql(
                "SELECT count(*) AS n, count(DISTINCT tick_id) AS d,"
                " min(tick_id) AS lo, max(tick_id) AS hi,"
                " sum(qty) AS qty FROM tick_stream_test"
            ).collect()[0]
            assert (agg.n, agg.d, agg.lo, agg.hi) == (2500, 2500, 0, 2499)
            batch_qty = (
                spark.read.format("synthtick").option("n", "2500")
                .load().agg(F.sum("qty").alias("q")).collect()[0].q
            )
            assert agg.qty == batch_qty

    def test_restart_recovers_offsets_exactly_once(self, spark):
        """Stop after the first availableNow run (a strict prefix of
        the stream — how many prefetch batches it packs per run is a
        Spark implementation detail, so only 0 < n < total is pinned,
        per ADVICE r3), then restart from the SAME checkpoint: the
        committed offset must carry over — the second run appends only
        the remaining rows, no duplicates, no gaps. This is the
        recovery contract readBetweenOffsets exists for."""
        register_tick_source(spark)

        def stream():
            return (
                spark.readStream.format("synthtick")
                .option("n", "2500").option("batch_rows", "1000").load()
            )

        with tempfile.TemporaryDirectory() as d:
            ckpt, out = os.path.join(d, "ckpt"), os.path.join(d, "out")
            q1 = (
                stream().writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True).start()
            )
            q1.awaitTermination(120)
            first = (
                spark.read.parquet(out)
                .agg(F.count("*").alias("n"),
                     F.count_distinct("tick_id").alias("d"),
                     F.max("tick_id").alias("hi")).collect()[0]
            )
            # a strict, gap-free, duplicate-free prefix — not pinned to
            # one prefetch batch (batching granularity may change
            # across Spark versions)
            assert 0 < first.n < 2500
            assert (first.d, first.hi) == (first.n, first.n - 1)
            q2 = (
                stream().writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .start()
            )
            try:
                q2.processAllAvailable()
            finally:
                q2.stop()
            total = (
                spark.read.parquet(out)
                .agg(F.count("*").alias("n"),
                     F.count_distinct("tick_id").alias("d"),
                     F.min("tick_id").alias("lo"),
                     F.max("tick_id").alias("hi")).collect()[0]
            )
            # resume from the committed offset: all 2500 rows exactly
            # once across both runs — no replay, no gap
            assert (total.n, total.d, total.lo, total.hi) == (
                2500, 2500, 0, 2499)

    def test_empty_source(self, spark):
        from etl_finance_spark.sources.pysource import read_ticks

        assert read_ticks(spark, n=0, parts=4).count() == 0


class TestLakeLayout:
    def test_sorted_layout_gives_disjoint_file_ranges(self, spark,
                                                      tmp_path):
        """write_sorted_layout must produce files whose min/max ranges
        on the sort key barely overlap — verified from the parquet
        FOOTERS (the statistics scan-time pruning actually uses), not
        from Spark's plan."""
        import pyarrow.parquet as pq
        from etl_finance_spark.sources.sinks import write_sorted_layout

        li = table(spark, SF_CORRECT, "lineitem").select(
            "l_orderkey", "l_shipdate", "l_extendedprice")
        path = str(tmp_path / "li_sorted")
        write_sorted_layout(li, path, ["l_shipdate"], n_files=4)
        ranges = []
        for f in sorted(os.listdir(path)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            idx = md.schema.to_arrow_schema().get_field_index(
                "l_shipdate")
            lo = min(md.row_group(i).column(idx).statistics.min
                     for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max
                     for i in range(md.num_row_groups))
            ranges.append((lo, hi))
        assert len(ranges) == 4
        ranges.sort()
        # each file's range must end before the NEXT-plus-one begins:
        # adjacent boundaries may share one value (range partitioner
        # splits on a key), but ranges must not blanket each other
        for i in range(len(ranges) - 1):
            assert ranges[i][1] <= ranges[i + 1][0], ranges
        # and the read-back is complete
        assert spark.read.parquet(path).count() == li.count()

    def test_zorder_layout_prunes_both_dimensions(self, spark, tmp_path):
        """write_zorder must keep footer min/max selective on BOTH
        clustering columns — measured as the fraction of files whose
        [min, max] overlaps a 5%-wide mid-range predicate on each
        dimension. The x-sorted baseline pins the contrast: it prunes
        x hard but reads EVERY file for a y predicate, which is the
        defect z-order exists to fix."""
        import pyarrow.parquet as pq

        from etl_finance_spark.sources.sinks import (
            write_sorted_layout, write_zorder,
        )

        n = 200_000
        df = spark.range(n).select(
            F.pmod(F.xxhash64("id"), F.lit(1000)).alias("x"),
            F.pmod(F.xxhash64(F.col("id") + 1), F.lit(1000)).alias("y"),
        )
        zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
        write_zorder(df, zpath, ["x", "y"], n_files=64)
        write_sorted_layout(df, spath, ["x"], n_files=64)

        def overlap_fraction(path, col, lo, hi):
            files = [f for f in os.listdir(path) if f.endswith(".parquet")]
            hit = 0
            for f in files:
                md = pq.ParquetFile(os.path.join(path, f)).metadata
                idx = md.schema.to_arrow_schema().get_field_index(col)
                fl = min(md.row_group(i).column(idx).statistics.min
                         for i in range(md.num_row_groups))
                fh = max(md.row_group(i).column(idx).statistics.max
                         for i in range(md.num_row_groups))
                if fh >= lo and fl <= hi:
                    hit += 1
            return hit / len(files)

        zx = overlap_fraction(zpath, "x", 475, 525)
        zy = overlap_fraction(zpath, "y", 475, 525)
        sx = overlap_fraction(spath, "x", 475, 525)
        sy = overlap_fraction(spath, "y", 475, 525)
        assert sx <= 0.15, sx   # single-sort prunes its own key hard...
        assert sy == 1.0, sy    # ...and nothing on the other dimension
        assert zx <= 0.5 and zy <= 0.5, (zx, zy)
        assert spark.read.parquet(zpath).count() == n

    def test_zorder_survives_degenerate_and_null_columns(self, spark,
                                                         tmp_path):
        """The rank math must not divide by zero on a constant column
        (min == max -> try_divide NULL -> rank 0) nor lose NULL rows
        (NULL rank coalesces to 0): the write succeeds and every row
        round-trips."""
        from etl_finance_spark.sources.sinks import write_zorder

        df = spark.range(1_000).select(
            F.lit(7).alias("const"),
            F.when(F.col("id") % 3 == 0, F.col("id")).alias("sparse"),
            F.col("id").alias("payload"),
        )
        path = str(tmp_path / "zdegen")
        write_zorder(df, path, ["const", "sparse"], n_files=2)
        back = spark.read.parquet(path)
        assert back.count() == 1_000
        assert back.agg(F.sum("payload")).collect()[0][0] == 499_500

    def test_zorder_bit_budget_guard(self, spark, tmp_path):
        """ADVICE r4: a long z-key has 63 usable bits. At the default
        bits=8 an 8th clustering column would put its top bit in the
        SIGN position (top-bucket rows sort first) and a 9th would wrap
        the shift count mod 64 — both silently scramble the Morton
        order. write_zorder must auto-shrink bits to fit (8 cols ->
        7 bits: still a correct, coarser z-order; every row must
        round-trip) and reject the degenerate calls loudly."""
        import pytest

        from etl_finance_spark.sources.sinks import write_zorder

        df = spark.range(256).select(
            *[((F.col("id") + i) % 16).alias(f"c{i}") for i in range(8)],
            F.col("id").alias("payload"),
        )
        path = str(tmp_path / "z8")
        write_zorder(df, path, [f"c{i}" for i in range(8)], n_files=4)
        back = spark.read.parquet(path)
        assert back.count() == 256
        assert back.agg(F.sum("payload")).collect()[0][0] == 256 * 255 // 2

        with pytest.raises(ValueError, match="at least one"):
            write_zorder(df, str(tmp_path / "z0"), [], n_files=2)
        with pytest.raises(ValueError, match="at most 63"):
            write_zorder(df, str(tmp_path / "z64"),
                         ["c0"] * 64, n_files=2)

    def test_write_target_size_hits_the_band(self, spark, tmp_path):
        """write_target_size must land non-tail files inside a sane
        band around the target (the bytes/row estimate from the sample
        write biases conservatively UNDER — see docstring), adapt the
        records-per-file bound to row WIDTH (wide rows => fewer rows
        per file), clean up its sizing directory, and validate args."""
        import glob
        import os

        import pytest

        from etl_finance_spark.sources.sinks import write_target_size

        li = table(spark, SF_CORRECT, "lineitem")
        target_mb = 0.25
        path = str(tmp_path / "sized")
        per_file = write_target_size(li, path, target_mb=target_mb)
        assert per_file > 0
        assert not os.path.exists(path + "__sizing")
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        assert len(files) >= 3, files
        sizes = [os.path.getsize(f) for f in files]
        target = target_mb * 1024 * 1024
        # all files bounded above; the non-tail bulk near the target
        assert max(sizes) <= 2.0 * target, sizes
        big = [s for s in sizes if s >= 0.25 * target]
        assert len(big) >= len(sizes) // 2, sizes
        # row-width adaptivity: a 1-column projection packs MORE rows
        # per file than the full-width frame at the same target
        narrow = write_target_size(li.select("l_orderkey"),
                                   str(tmp_path / "narrow"),
                                   target_mb=target_mb)
        assert narrow > per_file
        # round-trip integrity
        assert spark.read.parquet(path).count() == li.count()
        with pytest.raises(ValueError, match="target_mb"):
            write_target_size(li, str(tmp_path / "x"), target_mb=0)
        with pytest.raises(ValueError, match="sample_rows"):
            write_target_size(li, str(tmp_path / "x"), sample_rows=0)

    def test_write_target_size_survives_clustered_data(self, spark,
                                                       tmp_path):
        """The adversary for prefix sampling: a frame whose FIRST
        partitions are constant (encode to almost nothing — long RLE
        runs) and whose later partitions are high-entropy hashes. A
        limit()-based sample would estimate bytes/row from the
        compressible prefix and set the rows-per-file bound 10-50x too
        high, producing giant files from the entropy half; the
        per-partition head sample must blend both regimes and keep
        every file bounded."""
        import glob
        import os

        from etl_finance_spark.sources.sinks import write_target_size

        const = spark.range(150_000).select(
            F.lit("a" * 64).alias("s"))
        rand = spark.range(150_000).select(
            F.sha2(F.col("id").cast("string"), 256).alias("s"))
        clustered = const.unionAll(rand)  # constant partitions first
        target_mb = 0.25
        path = str(tmp_path / "clustered")
        write_target_size(clustered, path, target_mb=target_mb)
        sizes = [os.path.getsize(f)
                 for f in glob.glob(os.path.join(path, "*.parquet"))]
        assert sizes
        assert max(sizes) <= 3.0 * target_mb * 1024 * 1024, sorted(sizes)
        assert spark.read.parquet(path).count() == 300_000

    def test_compact_partitions(self, spark, tmp_path):
        from etl_finance_spark.sources.sinks import compact_partitions

        path = str(tmp_path / "frag")
        nation = table(spark, SF_CORRECT, "nation")
        nation.repartition(8).write.parquet(path)
        want = {tuple(r) for r in nation.collect()}
        before = compact_partitions(spark, path, target_files=2)
        assert before == 8
        files = [f for f in os.listdir(path) if f.endswith(".parquet")]
        assert len(files) == 2
        got = {tuple(r) for r in spark.read.parquet(path).collect()}
        assert got == want

    def test_compact_refuses_partitioned_layout(self, spark, tmp_path):
        """A hive-partitioned root must be refused (ADVICE r3): blind
        compaction would read partition columns back as data columns
        and flatten the directory layout."""
        import pytest
        from etl_finance_spark.sources.sinks import compact_partitions

        path = str(tmp_path / "hive")
        nation = table(spark, SF_CORRECT, "nation")
        nation.write.partitionBy("n_regionkey").parquet(path)
        with pytest.raises(ValueError, match="flat parquet directory"):
            compact_partitions(spark, path, target_files=1)
        # untouched: still readable with partition columns intact
        back = spark.read.parquet(path)
        assert back.count() == nation.count()
        assert "n_regionkey" in back.columns

    def test_compact_restores_original_on_failed_swap(self, spark,
                                                      tmp_path,
                                                      monkeypatch):
        """If the second rename of the swap dies, the original directory
        must come back (ADVICE r3) — readers never observe `path`
        absent with the data stranded in the __old backup."""
        import pytest
        from etl_finance_spark.sources.sinks import compact_partitions

        path = str(tmp_path / "frag2")
        nation = table(spark, SF_CORRECT, "nation")
        nation.repartition(4).write.parquet(path)
        want = {tuple(r) for r in nation.collect()}

        real_rename = os.rename
        calls = {"n": 0}

        def flaky_rename(src, dst):
            calls["n"] += 1
            if calls["n"] == 2:  # the tmp -> path rename
                raise OSError("simulated rename failure")
            real_rename(src, dst)

        monkeypatch.setattr(os, "rename", flaky_rename)
        with pytest.raises(OSError, match="simulated"):
            compact_partitions(spark, path, target_files=1)
        monkeypatch.undo()
        assert os.path.isdir(path)
        got = {tuple(r) for r in spark.read.parquet(path).collect()}
        assert got == want
        # the failed swap must not strand a second copy of the dataset:
        # both the freshly written __compact dir and the __old backup
        # are gone (ADVICE r4 follow-up)
        assert not os.path.exists(path + "__compact")
        assert not os.path.exists(path + "__old")

    def test_merge_schema_evolution(self, spark, tmp_path):
        """Appends with a widened schema read back as one frame under
        mergeSchema, old rows null-filled for the new column — the
        reader-side contract q_union_by_name provides query-side."""
        path = str(tmp_path / "evolve")
        v1 = spark.range(3).select(
            F.col("id"), F.lit("a").alias("tag"))
        v1.write.parquet(path)
        v2 = spark.range(3, 5).select(
            F.col("id"), F.lit("b").alias("tag"),
            (F.col("id") * 10).alias("score"))
        v2.write.mode("append").parquet(path)
        merged = spark.read.option("mergeSchema", "true").parquet(path)
        assert set(merged.columns) == {"id", "tag", "score"}
        rows = {r.id: (r.tag, r.score) for r in merged.collect()}
        assert rows[0] == ("a", None) and rows[4] == ("b", 40)

    def test_backfill_replaces_only_its_partitions(self, spark, tmp_path):
        """backfill_partitions: dynamic overwrite replaces exactly the
        partitions in the incoming frame — untouched days keep their
        FILES (not just their rows), the repaired day is replaced (not
        appended), and re-running the same backfill is a no-op."""
        import glob

        from etl_finance_spark.sources.sinks import (
            backfill_partitions, write_partitioned,
        )

        path = str(tmp_path / "days")
        base = spark.createDataFrame(
            [(1, "d1", 10.0), (2, "d2", 20.0), (3, "d3", 30.0),
             (4, "d2", 21.0)],
            "id long, day string, v double",
        )
        write_partitioned(base, path, ["day"])
        d1_files = sorted(glob.glob(f"{path}/day=d1/*.parquet"))
        fixed_d2 = spark.createDataFrame(
            [(2, "d2", 200.0), (4, "d2", 210.0)],
            "id long, day string, v double",
        )
        backfill_partitions(fixed_d2, path, ["day"])
        got = {r.id: r.v for r in spark.read.parquet(path).collect()}
        assert got == {1: 10.0, 2: 200.0, 3: 30.0, 4: 210.0}
        # other partitions' files untouched byte-for-byte (same paths)
        assert sorted(glob.glob(f"{path}/day=d1/*.parquet")) == d1_files
        # idempotent re-run converges
        backfill_partitions(fixed_d2, path, ["day"])
        again = {r.id: r.v for r in spark.read.parquet(path).collect()}
        assert again == got
        import pytest as _pytest
        with _pytest.raises(ValueError, match="partition columns"):
            backfill_partitions(fixed_d2, path, [])


class TestXml:
    def test_round_trip_and_from_xml(self, spark, tmp_path):
        """XML landed in Spark 4 core: write nation as XML, read back
        by rowTag with an explicit schema — values survive. The scalar
        twin from_xml parses embedded XML strings column-side (the
        from_json analog for XML payload columns)."""
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType,
        )

        from etl_finance_spark.sources.readers import read_xml

        nation = table(spark, SF_CORRECT, "nation").select(
            "n_nationkey", "n_name")
        path = str(tmp_path / "nation_xml")
        nation.write.format("xml").option("rowTag", "nation").save(path)
        schema = StructType([
            StructField("n_nationkey", LongType()),
            StructField("n_name", StringType()),
        ])
        back = read_xml(spark, path, "nation", schema)
        assert {(r.n_nationkey, r.n_name) for r in back.collect()} == {
            (r.n_nationkey, r.n_name) for r in nation.collect()}
        # scalar parse of an XML payload column
        payload = nation.select(
            F.concat(
                F.lit("<r><k>"), F.col("n_nationkey"),
                F.lit("</k><v>"), F.col("n_name"), F.lit("</v></r>"),
            ).alias("xml")
        )
        parsed = payload.select(
            F.from_xml("xml", "k BIGINT, v STRING").alias("p")
        ).select(F.col("p.k").alias("k"), F.col("p.v").alias("v"))
        assert {(r.k, r.v) for r in parsed.collect()} == {
            (r.n_nationkey, r.n_name) for r in nation.collect()}


class TestZorderNullPlacement:
    def test_null_cluster_values_rank_into_the_bottom_bucket(
            self, spark, tmp_path):
        """NULLs in a clustering column must rank 0 (the documented
        contract): least() SKIPS null operands, so a fallback outside
        least() is dead code and NULLs would silently rank into the
        TOP bucket, interleaving null rows with genuine max-value rows
        and poisoning footer-stat pruning for high-range predicates.
        Pin placement physically: every output file that contains
        null-y rows must sit in the LOW part of the y range, never
        with the y-max rows."""
        import glob

        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        from etl_finance_spark.sources.sinks import write_zorder

        df = spark.range(2000).select(
            (F.col("id") % 1024).alias("x"),
            F.when(F.col("id") < 500, None)
            .otherwise(512 + F.col("id") % 512).alias("y"),
        )
        path = str(tmp_path / "znull")
        write_zorder(df, path, ["x", "y"], n_files=8)
        saw_nulls = False
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            nulls = 0
            y_max = None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == "y" and col.is_stats_set:
                        nulls += col.statistics.null_count
                        if col.statistics.max is not None:
                            y_max = max(y_max or 0, col.statistics.max)
            if nulls:
                saw_nulls = True
                assert y_max is None or y_max < 768, (
                    f"null-y rows landed in a top-bucket file "
                    f"(y_max={y_max}) — NULL ranked high, not 0"
                )
        assert saw_nulls
