"""Third point on the wall-time scale curve (VERDICT r07 item 5).

test_scale_probe.py compares sf0.01 -> sf0.1; this module adds a
synthetic ~sf0.3 (3x the sf0.1 fixture rows, generated once into /tmp)
so the linear envelope has a third point and the candidate-fraction
constants tuned on small fixtures (e.g. the LSH band width, IVF
probe/cell ratios) are measured where they start to matter.

Generation is id-disjoint replication: each copy offsets its key
column far past the original id range, so

- embeddings: 3x corpus, the SAME query set (vec_id < N_QUERY lives in
  copy 0 only) -> candidate work should scale ~linearly with corpus;
- lineitem: l_orderkey offsets keep baskets intact and disjoint across
  copies (no basket merging -> copurchase fan-out stays per-basket
  quadratic but corpus-linear, exactly the property the tripwire pins);
- documents: doc_id offsets (q_dedup_clusters self-caps at doc_id<500,
  so it stays flat here by design — trivially inside the envelope).

The replicas are written through Spark (same parquet physical types as
a Spark re-write of the fixture); none of the three tables needs the
events nanos-timestamp special case, which is why events is NOT in the
probe dir — a heavy query that starts reading events must extend the
generator first (the KeyError from catalog.table is the reminder).

Envelope: t(probe) <= SLACK * 3 * max(t(sf0.1), FLOOR) — same SLACK
rationale as test_scale_probe.py (honest linear scaling passes on a
2.4x-swing host; a quadratic blowup at 3x = ~9x growth fails).
"""

from __future__ import annotations

import os
import time

import pytest

from pyspark.sql import functions as F

from etl_finance_spark import registry

SF_BASE = "/root/testdata/sf0.1"
PROBE_DIR = "/tmp/spark_graft_probe_sf03"
REP = 3          # replication factor (probe ~ sf0.3)
SLACK = 4.0      # host noise envelope, matching test_scale_probe.py
FLOOR = 1.0      # sec; fixed-overhead floor for tiny denominators

# key column to offset per replicated table; the offset stride is far
# beyond any fixture id so replicas never collide or merge baskets
TABLES = {
    "embeddings": ("vec_id", 10_000_000),
    "documents": ("doc_id", 10_000_000),
    "lineitem": ("l_orderkey", 100_000_000),
}

HEAVY = (
    "q_ivfpq_topk",
    "q_ann_ivf_topk",
    "q_dedup_clusters",
    "q_copurchase_pairs",
    "q_percentiles",
)


def _generate(spark) -> None:
    for name, (key, stride) in TABLES.items():
        out = f"{PROBE_DIR}/{name}.parquet"
        if os.path.exists(f"{out}/_SUCCESS"):
            continue
        base = spark.read.parquet(f"{SF_BASE}/{name}.parquet")
        parts = [
            base.withColumn(key, F.col(key) + F.lit(i * stride))
            for i in range(REP)
        ]
        rep = parts[0]
        for p in parts[1:]:
            rep = rep.unionAll(p)
        rep.write.mode("overwrite").parquet(out)


def _timed_run(spark, fn, sf_dir: str) -> float:
    from etl_finance_spark.lineage import release_cuts

    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    release_cuts()  # drain outside the timer, like bench.py
    return dt


@pytest.fixture(scope="module")
def probe_dir(spark):
    _generate(spark)
    return PROBE_DIR


@pytest.mark.scaleprobe
@pytest.mark.parametrize("name", HEAVY)
def test_heavy_query_linear_at_third_point(spark, probe_dir, name):
    specs = registry.collect()
    fn = specs[name].fn
    # warm both scales (session-memoized models + codegen are one-time
    # session costs, not marginal dataflow cost — same rationale as
    # test_scale_probe.py)
    _timed_run(spark, fn, SF_BASE)
    _timed_run(spark, fn, probe_dir)
    t_base = _timed_run(spark, fn, SF_BASE)
    t_probe = _timed_run(spark, fn, probe_dir)
    budget = SLACK * REP * max(t_base, FLOOR)
    assert t_probe <= budget, (
        f"{name}: t(~sf0.3)={t_probe:.2f}s vs t(sf0.1)={t_base:.2f}s — "
        f"exceeds the {REP}x linear envelope {budget:.2f}s; a constant "
        f"tuned on small fixtures (band width, probe fraction) has "
        f"likely gone super-linear"
    )
