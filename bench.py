"""Benchmark runner — times every declared query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "total_declared_query_time", "value": N, "unit": "sec",
     "queries": {...}, "sf": ...}

Each query is executed to completion (count + a cheap checksum collect of
the aggregated frame is avoided — we force computation with ``count()``
on the result, which runs the full plan; results are small projections so
write-out cost would dominate otherwise).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_finance_spark import registry
from etl_finance_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.collect()
    timings: dict[str, float] = {}
    # Warm the JVM/codegen once with the cheapest query so q-times are
    # not dominated by first-job startup.
    first = specs.get("q_scan_parquet")
    if first is not None:
        first.fn(spark, sf_dir).count()
    total = 0.0
    for name, spec in sorted(specs.items()):
        t0 = time.time()
        try:
            spec.fn(spark, sf_dir).count()
            dt = time.time() - t0
        except Exception:
            dt = float("nan")
        timings[name] = round(dt, 3)
        if dt == dt:
            total += dt
    print(json.dumps({
        "metric": "total_declared_query_time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
