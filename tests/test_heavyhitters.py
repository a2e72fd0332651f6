"""Frequent-items summaries (operators/heavyhitters.py): the
lower ≤ exact ≤ upper sandwich, the no-false-negative guarantee at the
total-slack threshold, and adversarial recovery of a hitter spread
thin across every partition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE
from etl_finance_spark.catalog import table
from etl_finance_spark.operators.heavyhitters import (
    frequent_items, topk_partials,
)


def _exact(df, col):
    return {
        str(r[0]): r[1]
        for r in df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).cast("string")).count().collect()
    }


def _total_slack(df, col, k):
    # one NULL-item marker row per non-empty partition carries slack
    rows = topk_partials(df, col, k).filter(
        F.col("item").isNull()
    ).collect()
    return sum(r.slack for r in rows)


def test_bounds_sandwich_exact_counts(spark):
    orders = table(spark, SF_SMOKE, "orders").repartition(8)
    col = "o_custkey"
    got = {r.item: (r.lower, r.upper)
           for r in frequent_items(orders, col, k=25).collect()}
    exact = _exact(orders, col)
    assert got, "no candidates"
    for item, (lo, hi) in got.items():
        assert lo <= exact[item] <= hi, (item, lo, exact[item], hi)


def test_no_false_negatives_above_slack_threshold(spark):
    """Constructed skew so the premise is guaranteed non-vacuous: one
    item holds half the rows, a 40-value uniform background forces
    real truncation at k=3. The hot item's count must clear Σ slack
    (asserted — a vacuous pass is itself a failure) and therefore
    must be a candidate."""
    n = 8_000
    df = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, "hot")
        .otherwise(F.concat(F.lit("bg-"), F.col("id") % 40))
        .alias("v")
    ).repartition(8)
    k = 3
    s = _total_slack(df, "v", k)
    exact = _exact(df, "v")
    above = {i for i, f in exact.items() if f > s}
    assert "hot" in above, (
        f"premise vacuous: hot count {exact['hot']} <= total slack {s}"
    )
    cand = {r.item for r in frequent_items(df, "v", k=k).collect()}
    missed = above - cand
    assert missed == set(), f"guaranteed items missing: {missed}"


def test_recovers_hitter_spread_thin_across_partitions(spark):
    """Adversarial placement: a background of near-unique ids plus one
    item spread ~3× per partition — never locally dominant (a count-1
    straggler even LOSES the tiebreak against the count-1 background),
    but globally far above the Σ-slack bar, so candidacy is guaranteed
    and the [lower, upper] sandwich must bracket the true count within
    total slack."""
    n, parts, copies = 20_000, 16, 3
    f = parts * copies
    base = spark.range(n).select(
        F.concat(F.lit("bg-"), F.col("id")).alias("v")
    )
    planted = spark.range(f).select(F.lit("needle").alias("v"))
    df = base.unionAll(planted).repartition(parts)  # round-robin spread
    s = _total_slack(df, "v", 8)
    assert f > s  # the premise of the no-false-negative guarantee
    got = {r.item: (r.lower, r.upper)
           for r in frequent_items(df, "v", k=8).collect()}
    assert "needle" in got
    lo, hi = got["needle"]
    assert lo <= f <= hi
    assert hi - lo <= s  # uncertainty never exceeds total slack


def test_partials_truncate_to_k_plus_marker(spark):
    orders = table(spark, SF_SMOKE, "orders").repartition(8)
    k = 5
    parts = topk_partials(orders, "o_custkey", k).withColumn(
        "pid", F.spark_partition_id()
    )
    per = parts.groupBy("pid").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("item").isNull(), 1)).alias("markers"),
        F.min("slack").alias("s"),
    )
    rows = per.collect()
    assert rows
    for r in rows:
        assert r.n <= k + 1      # top-k + the one slack marker row
        assert r.markers == 1    # exactly one marker per partition
        assert r.s >= 0


def test_nulls_ignored_and_empty_input_empty_output(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], "v string"
    )
    got = {r.item: (r.lower, r.upper)
           for r in frequent_items(df, "v", k=10).collect()}
    assert got["a"][0] == 2 and "None" not in got and None not in got
    empty = df.filter(F.lit(False))
    assert frequent_items(empty, "v", k=3).count() == 0


def test_k_must_be_positive(spark):
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError, match="k must be"):
        topk_partials(df, "v", 0)


def test_top_tokens_on_documents_corpus(spark):
    """LLM-pipeline tie-in: top tokens of the documents fixture. The
    candidates' bounds must sandwich the exact token counts, and the
    true top-5 tokens (by exact count) must all be candidates whose
    counts clear the Σ-slack guarantee."""
    docs = table(spark, SF_SMOKE, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("tok")
    ).filter(F.col("tok") != "").repartition(8)
    k = 30
    got = {r.item: (r.lower, r.upper)
           for r in frequent_items(toks, "tok", k).collect()}
    exact = _exact(toks, "tok")
    s = _total_slack(toks, "tok", k)
    top5 = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    for tok, f in top5:
        assert f > s, "fixture degenerated — top tokens under slack"
        assert tok in got
        lo, hi = got[tok]
        assert lo <= f <= hi


def test_single_input_scan_via_persisted_candidates(spark):
    """frequent_items needs the per-item sums AND the total-slack
    scalar — two consumers of the aggregated candidate frame. The
    frame PERSISTS so the input is scanned once (a bare branch would
    re-run the whole scan per consumer — two passes over 100 TB for
    one summary), and the total spreads back as a broadcast 1-ROW
    join, never a global window funneling the candidate set (up to
    k·partitions rows) through one task. Pin all three properties:
    the candidate aggregate is cached, the spread side is a broadcast,
    and no empty-partition-list window spec remains in the plan."""
    from conftest import explain_simple
    from test_plan_sweep import global_window_specs

    orders = table(spark, SF_SMOKE, "orders").repartition(8)
    out = frequent_items(orders, "o_custkey", k=10)
    plan = explain_simple(spark, out)
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoop" in plan, plan
    assert not global_window_specs(plan), plan
    # single-scan pin: the explain re-prints the cached subtree per
    # consumer, so every printed FileScan must correspond to an
    # InMemoryRelation reference (scan only inside the cache build) —
    # an uncached second read of the input would print one more scan
    # than cached references
    assert plan.count("orders.parquet") == plan.count("InMemoryRelation"), plan
    exact = _exact(orders, "o_custkey")
    for r in out.collect():
        assert r.lower <= exact[r.item] <= r.upper


def test_items_use_sql_cast_spelling(spark):
    """Item strings must follow Spark's CAST-to-string semantics, not
    Python str(): a boolean column yields 'true'/'false' (matching any
    SQL oracle or join-back on the source column), never
    'True'/'False'."""
    df = spark.createDataFrame(
        [(True,), (True,), (False,), (None,)], "v boolean"
    )
    got = {r.item: r.lower for r in frequent_items(df, "v", k=5).collect()}
    assert got == {"true": 2, "false": 1}
