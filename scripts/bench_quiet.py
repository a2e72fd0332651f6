"""Quiet-host bench protocol — pinned run-selection rule.

The shared bench VM's baseline drifts: round 6 saw the identical
217-query suite swing 137.6s -> 154.3s (and totals range 152-360s
within ONE session) with zero code changes to those queries
(VERDICT r06 §perf; memory: bench-vm-variance). A single bench run is
therefore not evidence. The PINNED RULE, applied by this script:

    run bench.py N times (default 3) in fresh processes;
    KEEP the run with the LOWEST TOTAL (least host interference —
    noise only ever adds time);
    record every run's total + the kept index in the detail file,
    so the selection is auditable, not silent.

Usage (session end, per round):

    python scripts/bench_quiet.py --runs 3 --freeze r07

writes the kept run to BENCH_DETAIL.json (rolling) AND freezes an
immutable BENCH_DETAIL_r07.json, both carrying the ``protocol`` block.
Cross-round comparisons should still use per-query ratios, never
totals, and only between files whose protocol blocks match.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(REPO, "BENCH_DETAIL.json")


def one_run(idx: int) -> tuple[dict, str]:
    """Run bench.py in a fresh process; return (detail-dict, stdout line)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, cwd=REPO,
    )
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench run {idx} failed (rc={proc.returncode}):\n"
            f"{proc.stderr[-2000:]}"
        )
    with open(DETAIL) as f:
        return json.load(f), line


def check_run(detail: dict, idx: int) -> None:
    """A run with a crashed query records dt=NaN and a LOWER total, so
    best-of-N would always keep the broken run — NaN runs fail the
    whole protocol loudly (the CLAUDE.md no-NaN gate applies to the
    kept artifact, not just the average run)."""
    nans = [q for q, t in detail["queries"].items() if t != t]
    if nans:
        raise RuntimeError(
            f"run {idx} has NaN timings (crashed queries): {nans}"
        )


def select_best(details: list[dict]) -> dict:
    """Apply the pinned rule: keep the lowest-total run, with the
    selection recorded in a ``protocol`` block; NaN runs are
    ineligible (check_run)."""
    if not details:
        raise ValueError("select_best needs at least one bench run")
    for i, detail in enumerate(details):
        check_run(detail, i)
    totals = [d["value"] for d in details]
    kept = min(range(len(totals)), key=totals.__getitem__)
    out = dict(details[kept])
    out["protocol"] = {
        "rule": "best-of-N total (lowest; host noise only adds time)",
        "runs": totals,
        "kept_run": kept,
    }
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--freeze", default=None, metavar="rNN",
                    help="also write BENCH_DETAIL_<rNN>.json")
    args = ap.parse_args()
    if args.runs < 1:
        ap.error("--runs must be >= 1")

    details: list[dict] = []
    for i in range(args.runs):
        detail, line = one_run(i)
        check_run(detail, i)  # fail-fast: don't pay the remaining runs
        details.append(detail)
        print(f"run {i}: total={detail['value']}s  {line}", file=sys.stderr)
    out = select_best(details)
    with open(DETAIL, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    if args.freeze:
        frozen = os.path.join(REPO, f"BENCH_DETAIL_{args.freeze}.json")
        with open(frozen, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"froze {frozen}", file=sys.stderr)
    print(json.dumps({"kept_total": out["value"],
                      "runs": out["protocol"]["runs"],
                      "kept_run": out["protocol"]["kept_run"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
