"""Offline config-robustness matrix: run EVERY declared query's
differential under each deployment-config override, one subprocess per
axis (session-global confs cannot be safely flipped mid-suite).

    python scripts/config_matrix.py            # all axes at sf0.01
    python scripts/config_matrix.py aqe tz     # chosen axes

Backs the README claim that results never ride on a tuning knob; the
per-axis SENSITIVE subsets stay pinned in tests/test_scale.py — this
script is the periodic full-width sweep (re-run whenever the declared
surface grows). Each axis subprocess reuses scripts/diffcheck.py's
``_run`` loop, so the sweep inherits the baseline harness's exact
semantics (WEAK rows-only handling, per-query exception isolation,
and the post-consumption release_cuts drain) instead of a drifting
copy."""

from __future__ import annotations

import subprocess
import sys

AXES = {
    "aqe": {"spark.sql.adaptive.enabled": "false"},
    "ansi": {"spark.sql.ansi.enabled": "false"},
    "codegen": {"spark.sql.codegen.wholeStage": "false"},
    "tz": {"spark.sql.session.timeZone": "Asia/Tokyo"},
    # granularity axes: odd, non-divisible reducer count and 1 MB scan
    # splits (maximum task fragmentation) — partition-layout hazards
    "parts": {"spark.sql.shuffle.partitions": "5"},
    "splits": {"spark.sql.files.maxPartitionBytes": "1m",
               "spark.sql.files.openCostInBytes": "0"},
    # join-strategy independence (r12): auto-broadcast disabled flips
    # every non-hinted dim join to sort-merge/shuffle-hash — results
    # must not ride on the planner's broadcast pick (explicit
    # broadcast() hints are unaffected by the threshold and still
    # broadcast, which is the other half of the claim)
    "broadcast": {"spark.sql.autoBroadcastJoinThreshold": "-1"},
    # Arrow batch-boundary hazards (r12): 7-row batches force every
    # mapInPandas/applyInPandas/pandas_udf operator to see many tiny
    # batches per partition — a per-batch assumption that should be
    # per-partition (dedup state, partial aggregates, frame windows)
    # diverges immediately under this axis
    "arrowbatch": {"spark.sql.execution.arrow.maxRecordsPerBatch": "7"},
    # scan-decode independence (r12): the row-based parquet reader is
    # the documented fallback on clusters that hit vectorized-reader
    # bugs (nested schemas, rare decimal/timestamp encodings) — every
    # answer must survive the decode-path swap, especially the
    # nanos-timestamp events read catalog.table normalizes
    "vecreader": {"spark.sql.parquet.enableVectorizedReader": "false"},
}

_RUNNER = r"""
import sys
sys.path.insert(0, ".")
sys.path.insert(0, "scripts")
from diffcheck import _run
from etl_finance_spark import registry
from etl_finance_spark.session import get_spark

spark = get_spark("config-matrix", cpus=8, shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
for k, v in dict(%(confs)r).items():
    spark.conf.set(k, v)
failures = _run(spark, registry.collect(), "/root/testdata/sf0.01", set())
print("FAILCOUNT:", failures)
"""


def main() -> int:
    axes = sys.argv[1:] or list(AXES)
    unknown = [a for a in axes if a not in AXES]
    if unknown:
        print(f"unknown axes {unknown}; choose from {sorted(AXES)}",
              file=sys.stderr)
        return 2
    rc = 0
    for axis in axes:
        script = _RUNNER % {"confs": AXES[axis]}
        try:
            out = subprocess.run([sys.executable, "-c", script],
                                 capture_output=True, text=True,
                                 timeout=3600)
        except subprocess.TimeoutExpired:
            print(f"[{axis}] RED\n  timed out after 3600s")
            rc = 1
            continue
        lines = out.stdout.replace("\r", "\n").splitlines()
        tail = [ln for ln in lines if ln.startswith(("FAILCOUNT:", "FAIL "))]
        ok = out.returncode == 0 and "FAILCOUNT: 0" in tail
        print(f"[{axis}] {'GREEN' if ok else 'RED'}",
              *tail[:6], sep="\n  ")
        if not ok:
            rc = 1
            print(out.stderr[-1000:])
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
