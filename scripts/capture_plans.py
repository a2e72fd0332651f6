"""Capture .explain('formatted') for named declared queries.

Usage:
    python scripts/capture_plans.py r14 before q_cosine_topk,q_pagerank
    python scripts/capture_plans.py r14 after  q_cosine_topk

Writes plans/<round>/<query>_<tag>.txt for each query. Plans are
captured on the repo's configured session (session.get_spark) so the
shapes match what bench.py executes. Building a query can itself run
jobs (iterative operators execute their convergence probes at
construction) — this script is for evidence capture, not timing.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    rnd, tag, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_finance_spark import registry
    from etl_finance_spark.lineage import release_cuts
    from etl_finance_spark.session import get_spark

    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.collect()
    outdir = os.path.join(REPO, "plans", rnd)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        name = name.strip()
        if not name:
            continue
        df = specs[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        release_cuts()
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
