"""Propose the next round's driver correctness window.

The driver oracle-checks ~the first 50 names `queries()` yields;
`registry._DRIVER_WINDOW` controls that order. Rotating it each round
is a delicate manual step (history: two queries slipped at positions
51-52 for two straight rounds). This script derives the rotation from
the recorded evidence instead:

    python scripts/plan_window.py                 # propose from CORRECTNESS_r*.json
    python scripts/plan_window.py --recheck a,b   # pin changed-file re-checks

Priority order inside the 50:
1. the flagship (always position 1 — it is also `entry()`),
2. every query RED at its most recent check (fix-recheck),
3. --recheck names: queries whose plan changed this round (the
   changed-file rule) — they re-earn evidence the same round,
4. every query never driver-checked in ANY round (registration order),
5. staleness fill: all remaining queries ordered by the round they
   were last checked, OLDEST FIRST (ties in registration order) —
   driver evidence ages as PySpark/DuckDB configs drift, so free
   slots always go to the longest-unchecked greens. This subsumes the
   old one-per-family sentinel rotation: families re-cover naturally
   because their members age together.

Any window candidate whose query is EXACT (oracle declared) is guarded
against collection-typed result columns by probing the ORACLE's arrow
schema at sf0.001 (cheap LIMIT-0): engine and oracle schemas must
match, so a list/map/struct column in the oracle means the Spark side
would hand the driver's pandas hasher an unhashable cell — the r05
`q_array_agg_distinct` red. testing.compare enforces the same rule at
check time; enforcing it at PLANNING time stops a WEAK→EXACT promotion
from burning a driver slot on a guaranteed red.

Prints a ready-to-paste Python tuple.
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
GUARD_SF_DIR = "/root/testdata/sf0.001"


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


def load_evidence(files: list[str]) -> tuple[dict[str, dict], dict[str, int]]:
    """One pass over the correctness files: (name -> most recent row,
    name -> most recent round with ANY driver row). A query's standing
    is its MOST RECENT row across ALL rounds, not just the latest file:
    a red that misses the very next window must stay red-tracked until
    some later round actually re-checks it."""
    latest_row: dict[str, dict] = {}
    last_round: dict[str, int] = {}
    for f in files:  # sorted ascending — later rounds override
        r = int(f.split("_r")[1].split(".")[0])
        with open(f) as fh:
            rows = json.load(fh)
        for n, row in rows.items():
            latest_row[n] = row
            last_round[n] = r
    return latest_row, last_round


def collection_guard(specs: dict, window: list[str],
                     sf_dir: str = GUARD_SF_DIR) -> list[str]:
    """Return the window names whose ORACLE result schema contains a
    collection-typed column (would crash the driver's pandas hasher).
    Empty list = window is safe. Mirrors testing.compare's rejection,
    applied before a slot is spent."""
    import pyarrow as pa

    from etl_finance_spark.testing import duck_connect, oracle_arrow_schema

    exact = [n for n in window
             if n in specs and specs[n].oracle is not None]
    if not exact:
        return []
    con = duck_connect(sf_dir)
    bad: list[str] = []
    for n in exact:
        schema = oracle_arrow_schema(con, specs[n].oracle)
        if any(
            pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_map(t) or pa.types.is_struct(t)
            for t in schema.types
        ):
            bad.append(n)
    return bad


def propose(specs: dict, latest_row: dict[str, dict],
            last_round: dict[str, int],
            rechecks: list[str] = ()) -> list[str]:
    reds = sorted(n for n, row in latest_row.items()
                  if not is_green(n, row, specs))
    never = [n for n in specs if n not in latest_row]
    order = {n: i for i, n in enumerate(specs)}  # registration order
    stale = sorted(
        (n for n in specs if n in last_round),
        key=lambda n: (last_round[n], order[n]),
    )
    window: list[str] = [FLAGSHIP]
    for tier in (reds, rechecks, never, stale):
        for n in tier:
            if n not in window and n in specs and len(window) < WINDOW:
                window.append(n)
    return window


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--recheck", default="", metavar="a,b",
                    help="comma-separated changed-file re-check names, "
                         "pinned right after the flagship and any reds")
    args = ap.parse_args()
    rechecks = [n for n in args.recheck.split(",") if n]
    specs = registry.collect()
    files = sorted(glob.glob("CORRECTNESS_r*.json"))
    if not files:
        print("no CORRECTNESS_r*.json found", file=sys.stderr)
        return 1
    latest_row, last_round = load_evidence(files)
    unknown = [n for n in rechecks if n not in specs]
    if unknown:
        print(f"--recheck names not registered: {unknown}", file=sys.stderr)
        return 2
    window = propose(specs, latest_row, last_round, rechecks)
    bad = collection_guard(specs, window)
    if bad:
        print(f"REFUSING window: oracle returns collection-typed "
              f"columns for {bad} — array_join/to_json to scalars or "
              f"declare WEAK first", file=sys.stderr)
        return 2
    reds = [n for n in window
            if n in latest_row and not is_green(n, latest_row[n], specs)]
    n_never = len([n for n in window if n not in last_round])
    oldest = min((last_round[n] for n in window if n in last_round),
                 default=None)
    fill = f"staleness fill from r{oldest:02d}" if oldest is not None \
        else "no staleness fill (no prior evidence in window)"
    print(f"# proposed window ({len(window)} names; {len(reds)} red "
          f"recheck, {len(rechecks)} changed-file, {n_never} "
          f"never-checked, {fill})")
    print("_DRIVER_WINDOW = (")
    for n in window:
        print(f'    "{n}",')
    print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
