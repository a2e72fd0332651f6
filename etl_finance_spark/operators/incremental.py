"""Incremental rollup maintenance: keep an aggregate table current by
merging deltas, never rescanning the fact history.

THE sustainability pattern at 100 TB: a daily "revenue by (nation,
month)" rollup must not cost a full fact scan per refresh. Distributive
and algebraic measures re-aggregate from stored partial state —
sum/count re-sum, min/max re-extremize, HLL sketches union
(operators/sketches.py), and avg derives from a (sum, count) pair — so
yesterday's rollup plus today's delta IS today's rollup:

    merge(rollup_state(A), rollup_state(B)) == rollup_state(A ∪ B)

(the algebraic identity tests/test_incremental.py pins on random
splits). The refresh cost is |delta| + |rollup|, independent of the
fact history's size.

Three layers, mirroring how a warehouse deploys this:

- :func:`rollup_state` — raw rows → keyed state (one partial-agg
  shuffle; holistic measures are impossible here BY DESIGN: an exact
  median cannot merge, which is why the quantile rung of this pattern
  is the KLL sketch).
- :func:`merge_states` — union state frames and re-aggregate with each
  measure's MERGE function. Cost is proportional to the states, never
  the facts.
- :func:`finalize_state` — project user-facing values (HLL binary →
  estimate). Kept separate so stored state stays mergeable; a
  finalized column is a dead end.

The streaming form writes one state partition per micro-batch
(:func:`foreach_batch_rollup_partials`) with dynamic partition
overwrite, so a redelivered batch REPLACES its own partial instead of
double-counting — idempotent without any read-modify-write on the
rollup, and the partial write commutes with concurrent readers.
:func:`read_rollup` merges partials on read; periodically compacting
them back through :func:`merge_states` into a single partition is the
same operation at rest.

Measure kinds: ``sum`` / ``min`` / ``max`` (column-typed), ``count``
(rows; long), ``hll`` (distinct-estimate sketch, binary state).
Declared surface: ``q_rollup_merge`` below splits the fact in two,
builds a state per half, merges and finalizes — the DuckDB oracle is
the direct GROUP BY over the union, so the merge identity itself is
what the driver hash-checks (random-split form in
tests/test_incremental.py).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_HLL_LG_K = 12  # 4 KB sketches, ~1.6% RSE (operators/sketches.py)

_KINDS = ("sum", "count", "min", "max", "hll")

Spec = tuple[str, str | None]  # (kind, source column; None for count)


def _check(specs: Mapping[str, Spec]) -> None:
    for name, (kind, src) in specs.items():
        if kind not in _KINDS:
            raise ValueError(f"{name}: unknown measure kind {kind!r}")
        if kind != "count" and src is None:
            raise ValueError(f"{name}: {kind} needs a source column")


def rollup_state(df: DataFrame, keys: Sequence[str],
                 specs: Mapping[str, Spec]) -> DataFrame:
    """Build keyed mergeable state from raw rows (one partial-agg
    shuffle; map-side combine shrinks it to |keys| rows per task)."""
    _check(specs)
    build = {
        "sum": lambda c: F.sum(c),
        "count": lambda c: F.count(F.lit(1)),
        "min": lambda c: F.min(c),
        "max": lambda c: F.max(c),
        "hll": lambda c: F.hll_sketch_agg(c, F.lit(_HLL_LG_K)),
    }
    return df.groupBy(*keys).agg(
        *[build[kind](src).alias(name)
          for name, (kind, src) in specs.items()]
    )


def merge_states(states: Sequence[DataFrame], keys: Sequence[str],
                 specs: Mapping[str, Spec]) -> DataFrame:
    """Merge rollup-state frames (any number ≥ 1) into one: union, then
    re-aggregate each measure with its merge function. A key present in
    only some states merges from those alone — an empty delta is a
    no-op by construction."""
    _check(specs)
    if not states:
        raise ValueError("merge_states needs at least one state frame")
    merge = {
        "sum": lambda c: F.sum(c),
        "count": lambda c: F.sum(c).cast("long"),
        "min": lambda c: F.min(c),
        "max": lambda c: F.max(c),
        "hll": lambda c: F.hll_union_agg(c, F.lit(False)),
    }
    it = iter(states)
    u = next(it)
    for s in it:
        u = u.unionByName(s)
    return u.groupBy(*keys).agg(
        *[merge[kind](name).alias(name)
          for name, (kind, src) in specs.items()]
    )


def finalize_state(state: DataFrame, keys: Sequence[str],
                   specs: Mapping[str, Spec]) -> DataFrame:
    """User-facing projection of a state frame: HLL binaries become
    long estimates; scalar measures pass through unchanged."""
    _check(specs)
    cols = [F.col(k) for k in keys]
    for name, (kind, _src) in specs.items():
        cols.append(
            F.hll_sketch_estimate(name).alias(name)
            if kind == "hll" else F.col(name)
        )
    return state.select(*cols)


def incremental_update(base_state: DataFrame, delta_rows: DataFrame,
                       keys: Sequence[str],
                       specs: Mapping[str, Spec]) -> DataFrame:
    """One maintenance step: fold raw delta rows into an existing state
    frame. Cost: one partial-agg shuffle of the delta + one merge over
    |rollup| rows — the fact history is never read."""
    return merge_states(
        [base_state, rollup_state(delta_rows, keys, specs)], keys, specs
    )


def foreach_batch_rollup_partials(target_path: str, keys: Sequence[str],
                                  specs: Mapping[str, Spec]):
    """Streaming maintenance sink: per micro-batch, aggregate the batch
    to state and write it under ``batch_id=<id>`` with DYNAMIC partition
    overwrite — a redelivered batch (failure/retry; Structured Streaming
    reuses the batch_id) overwrites its own partial bit-for-bit instead
    of appending a double-count. No read-modify-write on the rollup:
    writers only ever touch their own partition, so the sink needs no
    lock against readers or other writers."""
    _check(specs)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            rollup_state(batch_df, keys, specs)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(target_path)
        )

    return sink


def read_rollup(spark: SparkSession, path: str, keys: Sequence[str],
                specs: Mapping[str, Spec]) -> DataFrame:
    """Merge-on-read over the partial partitions a streaming run wrote.
    Compaction is the same merge written back as one partition."""
    parts = spark.read.parquet(path).drop("batch_id")
    return finalize_state(merge_states([parts], keys, specs), keys, specs)


# ---------------------------------------------------------------------------
# Declared query
# ---------------------------------------------------------------------------

from etl_finance_spark.catalog import table  # noqa: E402
from etl_finance_spark.registry import register  # noqa: E402


@register(
    "q_rollup_merge",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           count(*) AS n_rows,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def q_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-rollup merge identity, driver-checked end to end:
    the fact splits into two disjoint halves (even/odd orderkey — the
    'yesterday's rollup + today's delta' shape), each half builds keyed
    state, `merge_states` folds them, `finalize_state` projects. The
    oracle is the direct GROUP BY over the WHOLE table, so the check
    is exactly merge(state(A), state(B)) == state(A ∪ B). Measures are
    the exact-mergeable kinds only: quantity casts to long BEFORE
    summing (integral 1..50 by TPC-H construction; double re-addition
    order would differ between the merged and direct plans), count
    re-sums, min/max re-extremize with no arithmetic. Refresh cost at
    100 TB is |delta| + |rollup| — the half-states here stand in for a
    stored rollup and a new day's partial."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_orderkey", "l_extendedprice",
        F.col("l_quantity").cast("long").alias("qty_l"),
    )
    keys = ["l_returnflag", "l_linestatus"]
    specs: Mapping[str, Spec] = {
        "sum_qty": ("sum", "qty_l"),
        "n_rows": ("count", None),
        "min_price": ("min", "l_extendedprice"),
        "max_price": ("max", "l_extendedprice"),
    }
    half_a = rollup_state(li.filter(F.col("l_orderkey") % 2 == 0), keys, specs)
    half_b = rollup_state(li.filter(F.col("l_orderkey") % 2 == 1), keys, specs)
    merged = merge_states([half_a, half_b], keys, specs)
    return finalize_state(merged, keys, specs)
