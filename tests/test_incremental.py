"""Incremental rollup maintenance (operators/incremental.py): the
merge(state(A), state(B)) == state(A ∪ B) algebra, fact-scan
independence of the refresh plan, and the streaming partials sink's
redelivery idempotency."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE, explain_simple
from etl_finance_spark.catalog import table
from etl_finance_spark.operators.incremental import (
    finalize_state, foreach_batch_rollup_partials, incremental_update,
    merge_states, read_rollup, rollup_state,
)

KEYS = ["o_orderpriority"]
SPECS = {
    "revenue": ("sum", "o_totalprice"),
    "n_orders": ("count", None),
    "first_day": ("min", "o_orderdate"),
    "last_day": ("max", "o_orderdate"),
}
HLL = {"approx_customers": ("hll", "o_custkey")}


def _rows(df, ndigits=2):
    out = []
    for r in sorted(df.collect(), key=lambda r: str(r[0])):
        out.append(tuple(
            round(v, ndigits) if isinstance(v, float) else v for v in r
        ))
    return out


def test_merge_of_split_states_equals_direct_rollup(spark):
    orders = table(spark, SF_SMOKE, "orders")
    parts = [
        orders.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) == i)
        for i in range(3)
    ]
    merged = merge_states(
        [rollup_state(p, KEYS, SPECS) for p in parts], KEYS, SPECS
    )
    direct = rollup_state(orders, KEYS, SPECS)
    assert _rows(merged) == _rows(direct)


def test_merge_is_associative_on_exact_measures(spark):
    orders = table(spark, SF_SMOKE, "orders")
    a, b, c = [
        rollup_state(
            orders.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) == i),
            KEYS, SPECS,
        )
        for i in range(3)
    ]
    left = merge_states([merge_states([a, b], KEYS, SPECS), c], KEYS, SPECS)
    flat = merge_states([a, b, c], KEYS, SPECS)
    assert _rows(left) == _rows(flat)


def test_incremental_update_plan_never_scans_the_fact_table(spark, tmp_path):
    """The refresh reads stored state + the delta — the fact history
    must not appear in the physical plan (that independence IS the
    operator; without it the 'incremental' refresh is a full rescan)."""
    orders = table(spark, SF_SMOKE, "orders")
    state_path = str(tmp_path / "state")
    rollup_state(
        orders.filter(F.col("o_orderkey") % 2 == 0), KEYS, SPECS
    ).write.parquet(state_path)
    base = spark.read.parquet(state_path)
    delta = orders.filter(F.col("o_orderkey") % 2 == 1)
    plan = explain_simple(
        spark, incremental_update(base, delta, KEYS, SPECS)
    )
    assert plan.count("orders.parquet") == 1  # the delta side only
    assert "state" in plan
    # and the refreshed state matches the direct rollup over everything
    got = incremental_update(base, delta, KEYS, SPECS)
    assert _rows(got) == _rows(rollup_state(orders, KEYS, SPECS))


def test_hll_state_union_tracks_exact_distinct(spark):
    orders = table(spark, SF_SMOKE, "orders")
    parts = [
        orders.filter(F.pmod(F.col("o_custkey"), F.lit(2)) == i)
        for i in range(2)
    ]
    merged = finalize_state(
        merge_states([rollup_state(p, KEYS, HLL) for p in parts], KEYS, HLL),
        KEYS, HLL,
    )
    exact = orders.groupBy(*KEYS).agg(
        F.count_distinct("o_custkey").alias("exact")
    )
    j = merged.join(exact, KEYS).collect()
    assert j, "no groups"
    for r in j:
        assert abs(r.approx_customers - r.exact) <= 0.05 * r.exact


def test_empty_delta_is_a_noop(spark):
    orders = table(spark, SF_SMOKE, "orders")
    base = rollup_state(orders, KEYS, SPECS)
    refreshed = incremental_update(
        base, orders.filter(F.lit(False)), KEYS, SPECS
    )
    assert _rows(refreshed) == _rows(base)


def test_null_measure_values_merge_like_direct(spark):
    rows = [("a", None), ("a", 3.0), ("b", None)]
    df = spark.createDataFrame(rows, "k string, v double")
    specs = {"s": ("sum", "v"), "n": ("count", None),
             "lo": ("min", "v"), "hi": ("max", "v")}
    merged = merge_states(
        [rollup_state(df.limit(1), ["k"], specs),
         rollup_state(df.subtract(df.limit(1)), ["k"], specs)],
        ["k"], specs,
    )
    # all-NULL group keeps NULL extremes/sum but counts its rows
    got = {r.k: (r.s, r.n, r.lo, r.hi) for r in merged.collect()}
    assert got["a"] == (3.0, 2, 3.0, 3.0)
    assert got["b"] == (None, 1, None, None)


def test_bad_specs_rejected(spark):
    orders = table(spark, SF_SMOKE, "orders")
    with pytest.raises(ValueError, match="unknown measure kind"):
        rollup_state(orders, KEYS, {"x": ("median", "o_totalprice")})
    with pytest.raises(ValueError, match="needs a source column"):
        rollup_state(orders, KEYS, {"x": ("sum", None)})
    # empty state list is a clear error, not a bare StopIteration
    # (which PEP 479 would morph into RuntimeError inside generators)
    with pytest.raises(ValueError, match="at least one state"):
        merge_states([], KEYS, SPECS)


def test_streaming_partials_sink_is_idempotent_on_redelivery(spark):
    orders = table(spark, SF_SMOKE, "orders")
    b0 = orders.filter(F.col("o_orderkey") % 2 == 0)
    b1 = orders.filter(F.col("o_orderkey") % 2 == 1)
    target = tempfile.mkdtemp(prefix="rollup-partials-") + "/t"
    try:
        sink = foreach_batch_rollup_partials(target, KEYS, SPECS)
        sink(b0, 0)
        sink(b1, 1)
        want = _rows(finalize_state(
            rollup_state(orders, KEYS, SPECS), KEYS, SPECS
        ))
        assert _rows(read_rollup(spark, target, KEYS, SPECS)) == want
        # redelivered batch 0 (failure/retry) overwrites its own
        # partition — the rollup must not double-count
        sink(b0, 0)
        assert _rows(read_rollup(spark, target, KEYS, SPECS)) == want
    finally:
        shutil.rmtree(target.rsplit("/", 1)[0], ignore_errors=True)


def test_rollup_partials_through_a_real_stream(spark):
    """End-to-end streaming maintenance: a file-source stream of events
    drives foreach_batch_rollup_partials via writeStream.foreachBatch;
    the merged-on-read rollup must equal the batch rollup over the
    whole input (exact measures), whatever micro-batch boundaries the
    source chose."""
    from etl_finance_spark.catalog import table as cat_table
    from etl_finance_spark.streaming.windows import read_event_stream

    events = cat_table(spark, SF_SMOKE, "events")
    src = tempfile.mkdtemp(prefix="roll-src-")
    target = tempfile.mkdtemp(prefix="roll-tgt-") + "/t"
    keys = ["event_type"]
    specs = {"total": ("sum", "value"), "n": ("count", None)}
    try:
        for i in range(3):
            events.filter(F.pmod(F.col("event_id"), F.lit(3)) == i) \
                .coalesce(1).write.mode("append").parquet(src)
        stream = read_event_stream(spark, src, events.schema)
        q = (
            stream.writeStream.foreachBatch(
                foreach_batch_rollup_partials(target, keys, specs)
            ).start()
        )
        q.processAllAvailable()
        q.stop()
        got = _rows(read_rollup(spark, target, keys, specs))
        want = _rows(finalize_state(
            rollup_state(events, keys, specs), keys, specs
        ))
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(target.rsplit("/", 1)[0], ignore_errors=True)
