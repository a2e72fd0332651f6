"""DuckDB differential harness — local mirror of the driver's t2 gate.

Runs a registered Spark query and its oracle SQL over the same parquet
files, then compares row count, column names, and an order-insensitive
value multiset (columns sorted by name, rows sorted), the same contract
as __spark_entry__.py's docstring. Used by tests/ and by scripts.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from etl_finance_spark.catalog import TABLES


def duck_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _keyed(cols: list[str], rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def compare(spark_df, con, oracle: str) -> tuple[bool, str]:
    """Return (ok, message). Mirrors count/columns/value-multiset."""
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    cur = con.execute(oracle)
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duck={len(d_rows)}"
    sk, dk = _keyed(s_cols, [tuple(r) for r in s_rows]), _keyed(d_cols, d_rows)
    if sk != dk:
        diffs = [(a, b) for a, b in zip(sk, dk) if a != b][:5]
        return False, f"values differ, first diffs (spark, duck): {diffs}"
    return True, "ok"
