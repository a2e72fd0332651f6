"""Dev loop: run every registered query against its DuckDB oracle.

Usage: python scripts/diffcheck.py [sf_dir] [query ...]
Prints PASS/FAIL per query; exits nonzero on any failure.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from etl_finance_spark import registry
from etl_finance_spark.lineage import release_cuts
from etl_finance_spark.session import get_spark
from etl_finance_spark.testing import compare, duck_connect


TRI_SCALE = ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
             "/root/testdata/sf0.1")


def _run(spark, specs, sf_dir: str, only: set[str]) -> int:
    con = duck_connect(sf_dir)
    failures = 0
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                release_cuts()  # post-consumption drain (lineage.py)
                print(f"WEAK {name}: rows={n} ({time.time()-t0:.1f}s)")
                continue
            ok, msg = compare(df, con, spec.oracle)
            release_cuts()  # post-consumption drain (lineage.py)
        except Exception as e:  # noqa: BLE001 - dev tool, report and move on
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        status = "PASS" if ok else "FAIL"
        if not ok:
            failures += 1
        print(f"{status} {name} ({time.time()-t0:.1f}s)" + ("" if ok else f"\n  {msg}"))
    return failures


def main() -> int:
    arg = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    specs = registry.collect()
    spark = get_spark("diffcheck", cpus=8, shuffle_partitions=8)
    failures = 0
    for sf_dir in (TRI_SCALE if arg == "all" else (arg,)):
        if arg == "all":
            print(f"== {sf_dir} ==")
        failures += _run(spark, specs, sf_dir, only)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
