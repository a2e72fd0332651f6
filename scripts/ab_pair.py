"""Bench-faithful same-session paired A/B of two declared queries.

Motivation (VERDICT r09 watch item 1): a single cross-round ratio from
best-of-N freezes can exceed 2x on this host from interference alone
(memory: vm-host-noise-bench-protocol — per-query jitter up to 2.4x).
Best-of-N keeps the run with the lowest TOTAL, which does not minimize
every individual query — one interference spike on one query survives
selection. The only trustworthy per-query signal is a PAIRED design:
interleave target and control reps inside one session so both see the
identical host state, then compare medians.

    python scripts/ab_pair.py q_agg_groupby q_agg_having --reps 7

Measurement matches bench.py exactly: same get_spark session, noop sink
(full column evaluation, no write-out cost), release_cuts() drained
outside the timer, warm-up rep per query before measurement.

Output: one JSON line with per-rep timings, medians, and the
target/control median ratio. Adjudication of "noise vs real" is done by
comparing that paired ratio against the frozen-round ratio that raised
the flag (the caller's job — this script only measures).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_finance_spark import registry
from etl_finance_spark.lineage import release_cuts
from etl_finance_spark.session import get_spark


def timed_run(spark, fn, sf_dir: str) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    release_cuts()  # drain outside the timer, like bench.py
    return dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("target")
    ap.add_argument("control")
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()
    if args.reps < 3:
        ap.error("--reps must be >= 3 (need a median that can reject "
                 "one interference spike)")

    specs = registry.collect()
    for name in (args.target, args.control):
        if name not in specs:
            ap.error(f"unknown query {name!r}")

    spark = get_spark("ab_pair")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm both once (codegen + session memos), unmeasured — bench.py
    # likewise warms the main plan shapes before timing.
    timed_run(spark, specs[args.target].fn, args.sf_dir)
    timed_run(spark, specs[args.control].fn, args.sf_dir)

    t_reps: list[float] = []
    c_reps: list[float] = []
    for _ in range(args.reps):
        # strict interleave: each pair of reps sees near-identical host
        # state, so an interference window inflates both, not one
        t_reps.append(timed_run(spark, specs[args.target].fn, args.sf_dir))
        c_reps.append(timed_run(spark, specs[args.control].fn, args.sf_dir))

    t_med = statistics.median(t_reps)
    c_med = statistics.median(c_reps)
    print(json.dumps({
        "target": args.target,
        "control": args.control,
        "sf_dir": args.sf_dir,
        "reps": args.reps,
        "target_times": [round(t, 3) for t in t_reps],
        "control_times": [round(t, 3) for t in c_reps],
        "target_median": round(t_med, 3),
        "control_median": round(c_med, 3),
        "paired_ratio": round(t_med / c_med, 3) if c_med > 0 else None,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
