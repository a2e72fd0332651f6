"""Noise-aware comparison of two frozen bench snapshots.

The pinned rule (CLAUDE.md) says cross-round comparisons use per-query
ratios between protocol-matched BENCH_DETAIL files, never totals — but
raw per-query ratios still conflate code movement with host drift,
which bit round 8 twice: an apparent 0.80x "win" matched the 0.85x
median shift of 163 UNTOUCHED queries (pure host speed), and a later
freeze showed untouched queries "regressing" 1.3x (pure host slowdown).
This script applies the methodology that untangled it:

1. the MEDIAN ratio over all shared queries above a time floor is the
   HOST BASELINE (one changed query family cannot move a 200-query
   median);
2. each query's ratio is normalized by that baseline — only queries
   whose normalized ratio separates from 1.0 carry evidence of code
   movement;
3. outliers are printed both raw and normalized so a reader cannot
   mistake host drift for a regression (or an improvement).

Usage:
    python scripts/bench_compare.py r07 r08        # old new
    python scripts/bench_compare.py r07 r08 --floor 0.5 --top 8
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(tag: str) -> dict:
    path = os.path.join(REPO, f"BENCH_DETAIL_{tag}.json")
    with open(path) as f:
        return json.load(f)


def compare(old: dict, new: dict, floor: float) -> dict:
    """Pure comparison core (unit-tested): shared queries with
    old-time >= floor, their ratios, the median host baseline, and
    normalized ratios."""
    oq, nq = old["queries"], new["queries"]
    # oq[q] > 0 guards --floor 0: a 0.0 old-side timing would pass a
    # zero floor and divide by zero in the ratio (ADVICE r08)
    shared = [q for q in nq if q in oq and oq[q] >= floor and oq[q] > 0]
    if not shared:
        raise ValueError(f"no shared queries above floor={floor}")
    ratios = {q: nq[q] / oq[q] for q in shared}
    baseline = statistics.median(ratios.values())
    return {
        "n": len(shared),
        "baseline": baseline,
        "rows": sorted(
            (
                {
                    "query": q,
                    "old": oq[q],
                    "new": nq[q],
                    "ratio": ratios[q],
                    "normalized": ratios[q] / baseline,
                }
                for q in shared
            ),
            key=lambda r: r["normalized"],
            reverse=True,
        ),
    }


# Pinned re-open triggers (VERDICT r10 item 6): prose obligations from
# profiling docs, made self-executing so a future round cannot forget
# them. Each entry maps a query to (normalized-ratio threshold, the doc
# that pins why). PROFILE_IVF_r09.md accepted the IVF rungs' one-time
# k-means training floor with the re-open condition "a normalized
# bench_compare move on these queries specifically" — a move PAST the
# threshold in EITHER direction invalidates the profiled floor (slower:
# the candidate stage may have gone super-linear; faster: the floor
# analysis itself is stale and the accepted cost breakdown no longer
# describes the plan).
WATCH_TRIGGERS = {
    "q_ann_ivf_topk": (1.5, "PROFILE_IVF_r09.md"),
    "q_ivfpq_topk": (1.5, "PROFILE_IVF_r09.md"),
}


def check_triggers(result: dict) -> list[dict]:
    """Evaluate the pinned triggers against a compare() result. Returns
    one record per watched query, ALWAYS — a watched query absent from
    the shared rows (renamed, dropped from a snapshot, or fallen below
    the floor) is reported with `missing: True` and `fired: True`
    rather than skipped, because a silently-unevaluable trigger would
    defuse the very obligation it exists to keep alive (ADVICE r11;
    note an IVF query dropping below the 0.5s floor would itself be a
    >10x move that demands re-opening the profiled floor anyway).
    `fired` is True when the normalized ratio leaves the
    [1/threshold, threshold] envelope or the query is missing."""
    rows = {r["query"]: r for r in result["rows"]}
    out = []
    for q, (th, doc) in sorted(WATCH_TRIGGERS.items()):
        row = rows.get(q)
        if row is None:
            out.append({
                "query": q,
                "normalized": None,
                "threshold": th,
                "doc": doc,
                "fired": True,
                "missing": True,
            })
            continue
        norm = row["normalized"]
        out.append({
            "query": q,
            "normalized": norm,
            "threshold": th,
            "doc": doc,
            "fired": norm > th or norm < 1.0 / th,
            "missing": False,
        })
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old", help="old snapshot tag, e.g. r07")
    ap.add_argument("new", help="new snapshot tag, e.g. r08")
    ap.add_argument("--floor", type=float, default=0.5,
                    help="min old-side seconds for a query to count "
                         "(sub-floor timings are dominated by per-query "
                         "session constants)")
    ap.add_argument("--top", type=int, default=6,
                    help="outliers to print per direction")
    ap.add_argument("--watch", default="",
                    help="comma-separated queries the PRIOR round's "
                         "VERDICT flagged as watch items: each gets an "
                         "explicit closed/OPEN line against the 2x "
                         "adjudication bar, so a closure is visible in "
                         "the output instead of only in prose "
                         "(VERDICT r11 item 7)")
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)
    po, pn = old.get("protocol"), new.get("protocol")
    if not (isinstance(po, dict) and isinstance(pn, dict)):
        print("WARNING: a snapshot lacks a protocol block — per the "
              "pinned rule these files are not protocol-matched",
              file=sys.stderr)
    r = compare(old, new, args.floor)
    print(f"{args.old} -> {args.new}: {r['n']} shared queries "
          f"(old >= {args.floor}s)")
    print(f"host baseline (median ratio): {r['baseline']:.3f} — "
          f"ratios near this are host drift, not code movement")
    rows = r["rows"]
    # cap each section at half the surviving rows so the two printed
    # directions never overlap when fewer than 2*top rows survive the
    # floor (ADVICE r08)
    n_slow = min(args.top, (len(rows) + 1) // 2)
    n_fast = min(args.top, len(rows) - n_slow)
    print(f"\nslower than baseline (top {n_slow}):")
    for row in rows[:n_slow]:
        print(f"  {row['query']:26s} {row['old']:6.2f} -> {row['new']:6.2f}"
              f"  x{row['ratio']:.2f}  normalized x{row['normalized']:.2f}")
    print(f"\nfaster than baseline (top {n_fast}):")
    for row in reversed(rows[len(rows) - n_fast:]):
        print(f"  {row['query']:26s} {row['old']:6.2f} -> {row['new']:6.2f}"
              f"  x{row['ratio']:.2f}  normalized x{row['normalized']:.2f}")
    # strip per-item whitespace so `--watch q1, q2` matches q2 instead of
    # silently printing the misleading absent-row line (ADVICE r12)
    watch = [q.strip() for q in args.watch.split(",") if q.strip()]
    if watch:
        rows_by_q = {row["query"]: row for row in rows}
        print("\nprior-round watch items (2x normalized adjudication bar):")
        for q in watch:
            row = rows_by_q.get(q)
            if row is None:
                print(f"  {q:26s} not among compared rows (below floor "
                      f"or absent) — verify by hand")
                continue
            norm = row["normalized"]
            # two-sided like the pinned triggers (ADVICE r12): a dramatic
            # unexplained speedup (x0.5) can also mean a measurement or
            # behavior change and deserves the same ab_pair adjudication
            if norm >= 2.0 or norm <= 0.5:
                status = "OPEN — adjudicate with scripts/ab_pair.py"
            else:
                status = "closed (inside x0.50..x2.00)"
            print(f"  {q:26s} normalized x{norm:.2f}: {status}")
    triggers = check_triggers(r)
    if triggers:
        print("\npinned re-open triggers:")
    fired = False
    for t in triggers:
        if t.get("missing"):
            print(f"  {t['query']:26s} WARNING: not among the compared "
                  f"rows (renamed, dropped, or below --floor) — pinned "
                  f"trigger ({t['doc']}) is NOT evaluable: FIRED")
            fired = True
            continue
        status = "FIRED — re-open" if t["fired"] else "ok"
        print(f"  {t['query']:26s} normalized x{t['normalized']:.2f} "
              f"(envelope x{1 / t['threshold']:.2f}..x{t['threshold']:.2f}, "
              f"{t['doc']}): {status}")
        fired = fired or t["fired"]
    if fired:
        print("  -> a profiled-floor query left its envelope: re-open the "
              "cited profile doc's analysis before accepting this round's "
              "bench (adjudicate host noise first with scripts/ab_pair.py)")
    return 1 if fired else 0


if __name__ == "__main__":
    raise SystemExit(main())
