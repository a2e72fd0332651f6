"""UDF / UDAF / UDTF surface (SURVEY.md §2.2).

Policy: every *declared* UDF is deterministic and SQL-re-expressible
(the oracle recomputes it in pure SQL). The row-at-a-time Python UDF
exists to prove the API works — the pandas UDF is the sanctioned
vectorized path (Arrow batches, ~10-100× less serialization overhead);
both are the slow path vs built-ins and stay out of other queries.

UDAF (applyInPandas) and UDTF (Spark 4 ``udtf``) are WEAK — exercised
by unit tests (tests/test_udfs.py), not declared.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructType

from etl_finance_spark.catalog import table
from etl_finance_spark.registry import register

_VOWELS = set("aeiou")


def _vowel_count(s: str | None) -> int | None:
    if s is None:
        return None
    return sum(1 for ch in s.lower() if ch in _VOWELS)


@F.udf(returnType=IntegerType())
def vowel_count_udf(s):  # pragma: no cover - executed on executors
    return _vowel_count(s)


@F.pandas_udf(IntegerType())
def vowel_count_pandas(s: pd.Series) -> pd.Series:  # pragma: no cover
    return s.str.lower().str.count(r"[aeiou]").astype("int32")


_VOWEL_ORACLE = """
    SELECT {key} AS key_id,
           CAST(length(lower({col}))
                - length(regexp_replace(lower({col}), '[aeiou]', '', 'g'))
                AS INTEGER) AS n_vowels
    FROM {tbl}
"""


@register("q_udf_py", oracle=_VOWEL_ORACLE.format(key="c_custkey", col="c_name",
                                                  tbl="customer"))
def q_udf_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic scalar Python UDF; oracle re-expresses it in SQL."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("key_id"),
        vowel_count_udf(F.col("c_name")).alias("n_vowels"),
    )


@register("q_udf_pandas", oracle=_VOWEL_ORACLE.format(key="p_partkey",
                                                      col="p_name", tbl="part"))
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same function as an Arrow-vectorized pandas UDF — the only
    Python compute shape allowed in hot paths."""
    p = table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("key_id"),
        vowel_count_pandas(F.col("p_name")).alias("n_vowels"),
    )


# ---------------------------------------------------------------------------
# UDAF via applyInPandas (WEAK — unit-tested, not declared)
# ---------------------------------------------------------------------------


class TokenizeUDTF:
    """UDTF (Spark 4): one text row → (idx, token) rows. WEAK —
    unit-tested; the declared explode-based q_term_freq covers the
    same semantics through the fast built-in path."""

    def eval(self, text: str):  # pragma: no cover - runs on executors
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            yield (i, tok)


def tokenize_udtf():
    """Build the registered UDTF lazily (keeps import cheap)."""
    from pyspark.sql.functions import udtf

    return udtf(TokenizeUDTF, returnType="idx: int, token: string")


def grouped_weighted_avg(df: DataFrame, key: str, value: str, weight: str,
                         out: str = "weighted_avg") -> DataFrame:
    """Per-group weighted average as an applyInPandas UDAF, decomposed
    into algebraic partials (the pattern that makes ANY custom aggregate
    scale): built-in sum() reduces (value*weight, weight) per input
    partition BEFORE the shuffle — whole-stage-codegen, map-side combine
    — so the pandas combiner only ever sees ≤ n_partitions partial rows
    per group, never the group's raw rows. The round-2 version handed
    each whole group to one Arrow batch (a third of the table per batch
    at 3 distinct keys — the VERDICT.md round-2 weak-for-scale finding);
    this shape is invariant to group size. The Python seam stays real:
    the final combine (ratio of summed partials, NaN on zero weight) is
    arbitrary user code over the partials.
    """
    from pyspark.sql.types import DoubleType, StructField

    out_schema = StructType([df.schema[key], StructField(out, DoubleType())])

    partials = df.groupBy(
        key, F.spark_partition_id().alias("_pid")
    ).agg(
        F.sum(F.col(value) * F.col(weight)).alias("_vw"),
        F.sum(F.col(weight)).alias("_w"),
    )

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        w = pdf["_w"].sum()
        v = pdf["_vw"].sum() / w if w else float("nan")
        return pd.DataFrame({key: [pdf[key].iloc[0]], out: [v]})

    return partials.groupBy(key).applyInPandas(combine, schema=out_schema)


@register(
    "q_udaf_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6)
               AS weighted_avg
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applyInPandas UDAF as a DECLARED query: quantity-weighted
    mean price per return flag, oracle re-expressed in pure SQL. Drives
    the custom-aggregate API end-to-end through the partial-then-combine
    decomposition (see grouped_weighted_avg) — map-side built-in sums,
    Arrow batches bounded by partition count, not group size."""
    li = table(spark, sf_dir, "lineitem")
    out = grouped_weighted_avg(
        li, key="l_returnflag", value="l_extendedprice", weight="l_quantity"
    )
    return out.select(
        "l_returnflag", F.round("weighted_avg", 6).alias("weighted_avg")
    )
