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
import pyarrow as pa

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
    if isinstance(v, dict):
        # map cells: key order is engine-dependent (Spark insertion vs
        # DuckDB storage order) — canonicalize to sorted item tuples so
        # the row sort and equality see one representation
        return tuple(sorted((str(k), _norm(x)) for k, x in v.items()))
    return v


def _keyed(cols: list[str], rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def _canon_spark_type(dt) -> str:
    """Spark DataType -> width-preserving canonical token.

    Types are compared strictly (not just Python values) because the
    driver's value-hash distinguishes e.g. DuckDB HUGEINT from Spark
    long even when the numbers are identical (round-1 `q_bool_aggs`
    lesson); Python int equality erases that, so the local harness
    must compare widths explicitly to fail first.
    """
    from pyspark.sql import types as T

    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.ByteType):
        return "int8"
    if isinstance(dt, T.ShortType):
        return "int16"
    if isinstance(dt, T.IntegerType):
        return "int32"
    if isinstance(dt, T.LongType):
        return "int64"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.DoubleType):
        return "float64"
    if isinstance(dt, T.DecimalType):
        # HUGEINT round-trips as decimal(38,0); identify the two.
        if dt.scale == 0 and dt.precision > 18:
            return "int128"
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.ArrayType):
        return f"list<{_canon_spark_type(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{_canon_spark_type(dt.keyType)},{_canon_spark_type(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(_canon_spark_type(f.dataType) for f in dt.fields)
        return f"struct<{inner}>"
    if isinstance(dt, T.NullType):
        return "null"
    return dt.simpleString()


def _canon_arrow_type(t: "pa.DataType") -> str:
    """Arrow type (DuckDB result) -> the same canonical tokens."""
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return f"int{t.bit_width}"
    if pa.types.is_decimal(t):
        if t.scale == 0 and t.precision > 18:
            return "int128"
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_floating(t):
        return f"float{t.bit_width}"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_canon_arrow_type(t.value_type)}>"
    if pa.types.is_map(t):
        return f"map<{_canon_arrow_type(t.key_type)},{_canon_arrow_type(t.item_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(_canon_arrow_type(f.type) for f in t)
        return f"struct<{inner}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def oracle_arrow_schema(con, oracle: str) -> "pa.Schema":
    """Arrow schema of the oracle's result, via a LIMIT-0 wrap (cheap)."""
    sql = oracle.strip().rstrip(";")
    return con.execute(
        f"SELECT * FROM (\n{sql}\n) AS __schema_probe LIMIT 0"
    ).fetch_arrow_table().schema


def compare(spark_df, con, oracle: str) -> tuple[bool, str]:
    """Return (ok, message). Mirrors count/columns/value-multiset, plus a
    type-width check (int64 vs HUGEINT, bool vs int) the driver's value
    hash is sensitive to but Python `==` is not.

    Collection-typed result columns (array/map/struct) are rejected
    outright for oracle-checked queries: the driver canonicalizes via
    pandas ``sort_values``, whose hashtable factorize dies on list/dict
    cells (``TypeError: unhashable type``) — the r05 ``q_array_agg_
    distinct`` red that the old tuple-multiset comparison let through.
    EXACT queries must join collections to scalars at the boundary
    (the q_agg_collect_sorted house rule); only WEAK (oracle=None)
    queries, which never reach the driver hasher, may expose them.
    """
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    if bad:
        return False, (
            f"collection-typed result columns {bad} would crash the "
            "driver's pandas canonicalizer — array_join/to_json them to "
            "scalars (q_agg_collect_sorted rule) or declare WEAK"
        )
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    cur = con.execute(oracle)
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"

    d_schema = oracle_arrow_schema(con, oracle)
    s_types = {f.name: _canon_spark_type(f.dataType) for f in spark_df.schema.fields}
    d_types = {f.name: _canon_arrow_type(f.type) for f in d_schema}
    width_diffs = {
        c: (s_types[c], d_types[c]) for c in s_types if s_types[c] != d_types.get(c)
    }
    if width_diffs:
        return False, f"type widths differ (spark, duck): {width_diffs}"

    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duck={len(d_rows)}"
    sk, dk = _keyed(s_cols, [tuple(r) for r in s_rows]), _keyed(d_cols, d_rows)
    if sk != dk:
        diffs = [(a, b) for a, b in zip(sk, dk) if a != b][:5]
        return False, f"values differ, first diffs (spark, duck): {diffs}"
    return True, "ok"
