"""Propose the next round's driver correctness window.

The driver oracle-checks ~the first 50 names `queries()` yields;
`registry._DRIVER_WINDOW` controls that order. Rotating it each round
is a delicate manual step (history: two queries slipped at positions
51-52 for two straight rounds). This script derives the rotation from
the recorded evidence instead:

    python scripts/plan_window.py          # propose from CORRECTNESS_r*.json

Priority order inside the 50:
1. the flagship (always position 1 — it is also `entry()`),
2. every query RED in the latest correctness file (fix-recheck),
3. every query never driver-checked in ANY round (oldest families
   first = registration order),
4. sentinel re-checks: one green query per module family, filling the
   remaining slots (rotating families so each gets periodic re-cover).

Prints a ready-to-paste Python tuple plus the leftover count (queries
that still will not fit — the next-next round's backlog).
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_finance_spark import registry  # noqa: E402

WINDOW = 50
FLAGSHIP = "q_pct_change_hourly"


def is_green(name: str, row: dict, specs: dict) -> bool:
    """Red = error, or no match at the query's CURRENT strictness:
    EXACT queries (oracle declared) must HASH-match — a rows-only
    match is same-count-different-values, a real red that must
    re-queue; WEAK queries (oracle=None by policy) only ever record a
    rows-only row (the driver marks them err='no_oracle')."""
    if row.get("err") == "no_oracle":
        if name in specs and specs[name].oracle is not None:
            # recorded as WEAK, but the query has since GAINED an
            # oracle — the rows-only evidence is stale; re-queue for
            # a real hash check
            return False
        # the driver's WEAK marker — rows-only by policy; green if
        # the Spark side actually ran and produced a row count
        return row.get("spark_rows") is not None
    if row.get("err"):
        return False
    if row.get("hash_match"):
        return True
    weak = name in specs and specs[name].oracle is None
    return bool(weak and row.get("rows_match"))


def main() -> int:
    specs = registry.collect()
    files = sorted(glob.glob("CORRECTNESS_r*.json"))
    if not files:
        print("no CORRECTNESS_r*.json found", file=sys.stderr)
        return 1
    # a query's standing is its MOST RECENT row across ALL rounds, not
    # just the latest file: a red that misses the very next window must
    # stay red-tracked until some later round actually re-checks it
    latest_row: dict[str, dict] = {}
    for f in files:  # sorted ascending — later rounds override
        latest_row.update(json.load(open(f)))
    checked = set(latest_row)
    reds = sorted(n for n, row in latest_row.items()
                  if not is_green(n, row, specs))
    never = [n for n in specs if n not in checked]  # registration order
    by_module: dict[str, list[str]] = {}
    for name, spec in specs.items():
        by_module.setdefault(spec.fn.__module__, []).append(name)

    # reserve a handful of slots for family sentinels (the established
    # window practice: never-checked queries lead, but each green family
    # keeps periodic re-cover and any plan-changed query gets rechecked)
    reserve = 6 if len(never) > WINDOW - 1 else 0
    window: list[str] = [FLAGSHIP]
    for n in reds:
        if n not in window and len(window) < WINDOW:
            window.append(n)
    cap = WINDOW - reserve
    dropped = [n for n in never if n not in window][max(0, cap - len(window)):]
    for n in never:
        if n not in window and len(window) < cap:
            window.append(n)
    # sentinels: one green, previously-checked query per family
    for mod, names in sorted(by_module.items()):
        if len(window) >= WINDOW:
            break
        for n in names:
            if n in checked and n not in window:
                window.append(n)
                break
    # spare slots left after sentinels go back to the backlog
    for n in list(dropped):
        if len(window) >= WINDOW:
            break
        window.append(n)
        dropped.remove(n)
    print(f"# proposed window ({len(window)} names; "
          f"{len(reds)} red recheck, {len(never) - len(dropped)} "
          f"never-checked, {len(dropped)} left for next round)")
    print("_DRIVER_WINDOW = (")
    for n in window:
        print(f'    "{n}",')
    print(")")
    if dropped:
        print("# backlog (did not fit):", " ".join(dropped))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
