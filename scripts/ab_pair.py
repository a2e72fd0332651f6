"""Bench-faithful same-session paired A/B of two declared queries.

Motivation (VERDICT r09 watch item 1): a single cross-round ratio from
best-of-N freezes can exceed 2x on this host from interference alone
(memory: vm-host-noise-bench-protocol — per-query jitter up to 2.4x).
Best-of-N keeps the run with the lowest TOTAL, which does not minimize
every individual query — one interference spike on one query survives
selection. The only trustworthy per-query signal is a PAIRED design:
interleave target and control reps inside one session so both see the
identical host state, then compare medians.

    python scripts/ab_pair.py q_agg_groupby q_agg_having --reps 8

Design points:

- Measurement is the shared protocol (etl_finance_spark.measure:
  noop sink, release_cuts drained outside the timer) — the same
  quantity bench.py and the scale probes measure, by construction.
- ABBA alternation: pair order flips every rep (T,C / C,T / T,C ...)
  so asymmetric residue from whichever query runs first (GC pressure,
  page-cache state) lands on both sides equally instead of
  systematically inflating the second position. Cancellation needs an
  EVEN rep count (odd reps leave a one-rep first-position imbalance),
  so --reps must be even.
- A/A null calibration is supported (target == control): timings are
  keyed by ROLE, not query name, so the two samples stay independent —
  an A/A paired_ratio far from 1.0 measures the host's residual noise
  floor for this query shape.
- A rep that crashes aborts the adjudication LOUDLY with the partial
  timings in the JSON (exit 1): a paired ratio over a half-failed
  session is not evidence, and silently NaN-ing a rep would bias the
  median.

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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_finance_spark import registry
from etl_finance_spark.measure import timed_noop_run


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("target")
    ap.add_argument("control")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()
    if args.reps < 4:
        ap.error("--reps must be >= 4 (need a median that can reject "
                 "one interference spike)")
    if args.reps % 2:
        ap.error("--reps must be EVEN: ABBA only cancels the "
                 "first-position residue when both orders run equally "
                 "often")

    specs = registry.collect()
    for name in (args.target, args.control):
        if name not in specs:
            ap.error(f"unknown query {name!r}")

    from etl_finance_spark.session import get_spark

    spark = get_spark("ab_pair")
    spark.sparkContext.setLogLevel("ERROR")

    # keyed by ROLE, not query name: target == control (an A/A null
    # run) must keep two independent samples, not one shared list
    queries = {"target": args.target, "control": args.control}
    times: dict[str, list[float]] = {"target": [], "control": []}

    def rep(role: str, record: bool) -> None:
        name = queries[role]
        try:
            dt = timed_noop_run(spark, specs[name].fn, args.sf_dir)
        except Exception as exc:  # abort loudly with the partial data
            print(json.dumps({
                "error": f"{name} ({role}) failed: {exc}",
                "target": args.target, "control": args.control,
                "target_times": [round(t, 3) for t in times["target"]],
                "control_times": [round(t, 3) for t in times["control"]],
            }))
            raise SystemExit(1)
        if record:
            times[role].append(dt)

    # Warm both once (codegen + session memos), unmeasured — bench.py
    # likewise warms the main plan shapes before timing.
    rep("target", record=False)
    rep("control", record=False)

    for i in range(args.reps):
        # ABBA: flip pair order each rep; strict interleave keeps each
        # pair under near-identical host state either way
        first, second = (("target", "control") if i % 2 == 0
                         else ("control", "target"))
        rep(first, record=True)
        rep(second, record=True)

    t_med = statistics.median(times["target"])
    c_med = statistics.median(times["control"])
    print(json.dumps({
        "target": args.target,
        "control": args.control,
        "sf_dir": args.sf_dir,
        "reps": args.reps,
        "order": "ABBA",
        "target_times": [round(t, 3) for t in times["target"]],
        "control_times": [round(t, 3) for t in times["control"]],
        "target_median": round(t_med, 3),
        "control_median": round(c_med, 3),
        "paired_ratio": round(t_med / c_med, 3) if c_med > 0 else None,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
