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
generator first (the reminder fires as the parquet scan's
AnalysisException PATH_NOT_FOUND on the missing probe-dir file;
'events' is in catalog.TABLES, so catalog.table itself raises nothing).

Envelope: t(probe) <= SLACK * 3 * max(t(sf0.1), FLOOR) — same SLACK
rationale as test_scale_probe.py (honest linear scaling passes on a
2.4x-swing host; a quadratic blowup at 3x = ~9x growth fails).
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from etl_finance_spark import registry

# shared with the two-point probe so the query set and envelope
# constants cannot drift apart between the scale points
from test_scale_probe import FLOOR, HEAVY, SLACK, _timed_run

SF_BASE = "/root/testdata/sf0.1"
PROBE_DIR = "/tmp/spark_graft_probe_sf03"
REP = 3          # replication factor (probe ~ sf0.3)

# key column to offset per replicated table; the offset stride is far
# beyond any fixture id so replicas never collide or merge baskets
TABLES = {
    "embeddings": ("vec_id", 10_000_000),
    "documents": ("doc_id", 10_000_000),
    "lineitem": ("l_orderkey", 100_000_000),
}


def _base_fingerprint(name: str) -> str:
    """Cheap identity of the base fixture table: total bytes + newest
    mtime of its parquet files. The /tmp replicas outlive fixture
    regenerations (the layout has changed once already: events
    ns -> us), and _SUCCESS alone would silently pin a replica of the
    OLD fixture — the envelope would then compare mismatched
    datasets."""
    root = f"{SF_BASE}/{name}.parquet"
    size, mtime = 0, 0
    for d, _, files in os.walk(root):
        for f in files:
            st = os.stat(os.path.join(d, f))
            size += st.st_size
            mtime = max(mtime, st.st_mtime_ns)
    return f"{size}:{mtime}"


def _generate(spark) -> None:
    for name, (key, stride) in TABLES.items():
        out = f"{PROBE_DIR}/{name}.parquet"
        fp_file = f"{PROBE_DIR}/{name}.fingerprint"
        fp = _base_fingerprint(name)
        if os.path.exists(f"{out}/_SUCCESS"):
            try:
                with open(fp_file) as fh:
                    if fh.read() == fp:
                        continue  # replica matches the current fixture
            except OSError:
                pass  # no/unreadable fingerprint -> regenerate
        base = spark.read.parquet(f"{SF_BASE}/{name}.parquet")
        parts = [
            base.withColumn(key, F.col(key) + F.lit(i * stride))
            for i in range(REP)
        ]
        rep = parts[0]
        for p in parts[1:]:
            rep = rep.unionAll(p)
        rep.write.mode("overwrite").parquet(out)
        os.makedirs(PROBE_DIR, exist_ok=True)
        with open(fp_file, "w") as fh:
            fh.write(fp)


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
