"""Sketch-family verification (operators/sketches.py) and the Python
data source (sources/pysource.py).

The sketch queries are WEAK (DataSketches estimates have no DuckDB
analog), so the correctness weight sits here: published error bounds
hold against exact answers, and the merge identities that justify the
100 TB design are exact (union-of-partials == direct sketch — same
algorithm, deterministic layout).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_finance_spark.catalog import table
from etl_finance_spark.operators import sketches
from etl_finance_spark.sources.pysource import (
    SYMBOLS,
    _tick_row,
    read_ticks,
)

from conftest import SF_CORRECT


class TestHll:
    def test_error_bound(self, spark):
        """lg_k=12 → RSE ≈ 1.04/sqrt(4096) ≈ 1.6%; assert within 5%
        (≈3 sigma) per group against the exact distinct count."""
        df = sketches.q_hll_distinct(spark, SF_CORRECT)
        for r in df.collect():
            assert r.exact_customers > 0
            assert r.rel_err <= 0.05, r

    def test_union_of_partials_within_bound(self, spark):
        """The re-aggregation property: per-(priority,status) sketch
        partials unioned per priority must estimate the priority's
        exact distinct count within the same published bound as a
        direct sketch (the union path routes through HLL_8 internally,
        so it is NOT bit-identical to the direct estimate — only
        equally accurate; that accuracy is what makes persisted daily
        sketches sound at 100 TB)."""
        via_union = {
            r.o_orderpriority: r.approx_customers
            for r in sketches.q_hll_union(spark, SF_CORRECT).collect()
        }
        orders = table(spark, SF_CORRECT, "orders")
        exact = {
            r.o_orderpriority: r.n
            for r in orders.groupBy("o_orderpriority")
            .agg(F.count_distinct("o_custkey").alias("n"))
            .collect()
        }
        assert set(via_union) == set(exact)
        for prio, est in via_union.items():
            assert abs(est - exact[prio]) / exact[prio] <= 0.05, (
                prio, est, exact[prio])

    def test_helper_matches_query_shape(self, spark):
        out = sketches.hll_distinct_by(
            table(spark, SF_CORRECT, "orders"),
            ["o_orderstatus"], "o_custkey")
        assert out.columns == ["o_orderstatus", "approx_distinct"]
        assert out.count() == 3


class TestTheta:
    def test_exact_mode_below_nominal_entries(self, spark):
        """Theta sketches are EXACT below the 4096 nominal-entries
        threshold. sf0.01 distinct custkeys per status sit under it,
        so every estimate must equal the true set cardinality —
        including the union / intersection / difference algebra."""
        row = sketches.q_theta_setops(spark, SF_CORRECT).collect()[0]
        orders = table(spark, SF_CORRECT, "orders")
        f_set = {
            r.o_custkey for r in orders.filter("o_orderstatus = 'F'")
            .select("o_custkey").distinct().collect()
        }
        o_set = {
            r.o_custkey for r in orders.filter("o_orderstatus = 'O'")
            .select("o_custkey").distinct().collect()
        }
        assert len(f_set) < 4096 and len(o_set) < 4096, (
            "fixture outgrew theta exact mode; loosen to error bound")
        assert round(row.customers_f) == len(f_set)
        assert round(row.customers_o) == len(o_set)
        assert round(row.customers_either) == len(f_set | o_set)
        assert round(row.customers_both) == len(f_set & o_set)
        assert round(row.customers_f_only) == len(f_set - o_set)


class TestKll:
    def test_rank_error_bound(self, spark):
        """KLL k=200 → rank error ~1.65% @ 99% confidence. For each
        returned quantile estimate, the fraction of group values at or
        below it must sit within ±2.5% of the target rank."""
        li = table(spark, SF_CORRECT, "lineitem")
        out = sketches.q_kll_quantiles(spark, SF_CORRECT).collect()
        for r in out:
            grp = li.filter(F.col("l_returnflag") == r.l_returnflag)
            n = grp.count()
            for target, est in ((0.5, r.p50), (0.9, r.p90),
                                (0.99, r.p99)):
                below = grp.filter(
                    F.col("l_extendedprice") <= est).count()
                assert abs(below / n - target) <= 0.025, (
                    r.l_returnflag, target, below / n)

    def test_merge_matches_direct(self, spark):
        """kll partials built per returnflag then pairwise-merged
        (kll_sketch_merge_double is a binary scalar) answer the global
        p50 within the published rank error, as does the direct
        one-pass sketch — the incremental-rollup property."""
        li = table(spark, SF_CORRECT, "lineitem")
        parts = (
            li.groupBy("l_returnflag")
            .agg(F.kll_sketch_agg_double(
                "l_extendedprice", F.lit(200)).alias("sk"))
            .agg(F.collect_list("sk").alias("sks"))
        )
        merged = parts.select(
            F.kll_sketch_get_quantile_double(
                F.kll_sketch_merge_double(
                    F.kll_sketch_merge_double(
                        F.col("sks")[0], F.col("sks")[1]),
                    F.col("sks")[2],
                ),
                F.lit(0.5),
            ).alias("p50")
        ).collect()[0].p50
        direct = li.agg(
            F.kll_sketch_get_quantile_double(
                F.kll_sketch_agg_double("l_extendedprice", F.lit(200)),
                F.lit(0.5),
            ).alias("p50")
        ).collect()[0].p50
        # different insertion/merge order → both are valid sketches;
        # assert each answers the true median within the rank bound
        n = li.count()
        for est in (merged, direct):
            below = li.filter(F.col("l_extendedprice") <= est).count()
            assert abs(below / n - 0.5) <= 0.025


class TestPythonDataSource:
    def test_partition_planning(self, spark):
        """parts=4 must plan 4 executor-side splits covering all rows
        exactly once."""
        df = read_ticks(spark, n=1000, parts=4)
        parts = (
            df.select(F.spark_partition_id().alias("p"))
            .distinct().count()
        )
        assert parts == 4
        assert df.count() == 1000
        assert df.select("tick_id").distinct().count() == 1000

    def test_values_match_formula(self, spark):
        rows = {
            r.tick_id: (r.tick_id, r.symbol, r.price, r.qty)
            for r in read_ticks(spark, n=64, parts=3).collect()
        }
        for i in range(64):
            assert rows[i] == _tick_row(i)

    def test_uneven_split_covers_all(self, spark):
        df = read_ticks(spark, n=103, parts=8)
        assert df.count() == 103
        agg = df.agg(
            F.min("tick_id").alias("lo"), F.max("tick_id").alias("hi")
        ).collect()[0]
        assert (agg.lo, agg.hi) == (0, 102)
        assert set(
            r.symbol for r in df.select("symbol").distinct().collect()
        ) <= set(SYMBOLS)
