"""Vanilla-session driver simulation — the t1 + t2 gate, one command.

Mirrors what the round driver does: build a VANILLA SparkSession (none
of our session.py configs — catches conf-dependence bugs like the
nanos-parquet events table), run entry(), then every queries() entry
against its oracle_sql() DuckDB twin at sf0.01 (WEAK queries get the
rows-only count). Exit 0 only when t1 returns rows and no oracle
comparison fails.

    python scripts/driver_sim.py [sf_dir]      # default /root/testdata/sf0.01
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from etl_finance_spark.catalog import TABLES
    from etl_finance_spark.testing import compare

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]").appName("driver-sim")
        .config("spark.ui.showConsoleProgress", "false").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    t1 = len(e.entry(spark).collect())
    print(f"t1 rows: {t1}", flush=True)
    if t1 <= 0:
        # fail-fast: the t1 gate is already lost — don't pay the
        # 15-20 min query sweep to report a verdict known at minute 0
        print("FAILURES: t1 gate (entry() returned no rows)")
        return 1
    q, o = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    bad = []
    # Deliberately NO lineage.release_cuts() between queries: the real
    # round driver knows nothing about our lineage registry and runs the
    # full sweep with persists accumulating — this sim reproduces that
    # storage profile on purpose (the accumulation IS part of what the
    # gate validates: the sweep must fit executor storage without the
    # drain bench.py/diffcheck.py perform). See lineage.py's contract.
    for n in sorted(o):
        ok, detail = compare(q[n](spark, sf), con, o[n])
        if not ok:
            bad.append((n, detail))
            print(f"FAIL {n}: {detail}", flush=True)
    for n in sorted(set(q) - set(o)):
        q[n](spark, sf).count()  # WEAK: rows-only
    print("FAILURES:", bad or "none")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
