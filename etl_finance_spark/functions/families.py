"""Scalar-function family queries (SURVEY.md §2.2).

One combined query per family, exercised over the fixture tables. All
expressions are JVM-side built-ins inside whole-stage codegen — no
Python in any of these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_finance_spark.catalog import table
from etl_finance_spark.registry import register


@register(
    "q_select_exprs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 6) AS net_price,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged,
           l_quantity * 2 AS double_qty
    FROM lineitem
    """,
)
def q_select_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic + aliases (per-row IEEE ops are bit-identical across
    engines when the expression tree matches, so 6dp is safe here)."""
    li = table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(net, 6).alias("net_price"),
        F.round(net * (1 + F.col("l_tax")), 6).alias("charged"),
        (F.col("l_quantity") * 2).alias("double_qty"),
    )


@register(
    "q_nullif_coalesce",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_flag
    FROM lineitem
    """,
)
def q_nullif_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(-1.0)).alias(
            "disc_or_flag"
        ),
    )


@register(
    "q_str_funcs",
    oracle="""
    SELECT c_custkey,
           concat(c_name, '|', c_mktsegment) AS tagged,
           substring(c_name, 1, 8) AS prefix,
           length(c_name) AS name_len,
           trim(upper(c_mktsegment)) AS seg_up,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits
    FROM customer
    """,
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat/substring/length/trim/upper/regexp_extract — regex kept
    POSIX-basic so both engines agree (SURVEY.md §2.2)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit("|"), F.col("c_mktsegment")).alias("tagged"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.trim(F.upper(F.col("c_mktsegment"))).alias("seg_up"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
    )


@register(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
           CAST(o_orderdate AS DATE) + 30 AS due_date
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).cast("long").alias("y"),
        F.month(od).cast("long").alias("m"),
        F.dayofmonth(od).cast("long").alias("d"),
        F.date_trunc("month", od).cast("date").alias("month_start"),
        F.datediff(od.cast("date"), F.lit("1995-01-01").cast("date")).cast("long").alias(
            "days_since"
        ),
        F.date_add(od.cast("date"), 30).alias("due_date"),
    )


@register(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_extendedprice), 6) AS sqrt_price,
           round(abs(l_discount - 0.05), 6) AS abs_disc,
           CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ceil_q,
           CAST(floor(l_quantity / 7.0) AS BIGINT) AS floor_q,
           round(ln(l_extendedprice), 6) AS ln_price,
           round(pow(l_discount, 2), 6) AS disc_sq
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_disc"),
        F.ceil(F.col("l_quantity") / 7.0).alias("ceil_q"),
        F.floor(F.col("l_quantity") / 7.0).alias("floor_q"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
    )


@register(
    "q_array_funcs",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           list_contains(string_split(text, ' '), 'hash') AS has_hash,
           string_split(text, ' ')[1] AS first_token,
           array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',')
               AS sorted_vocab
    FROM documents
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode↔UNNEST family: size/contains/element_at/sort/distinct."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_contains(toks, "hash").alias("has_hash"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_join(F.sort_array(F.array_distinct(toks)), ",").alias(
            "sorted_vocab"
        ),
    )


@register(
    "q_try_cast",
    oracle="""
    SELECT doc_id,
           TRY_CAST(substring(text, 1, 3) AS INTEGER) AS bad_int,
           TRY_CAST(CAST(n_chars AS VARCHAR) AS BIGINT) AS good_long,
           TRY_CAST(lang AS DOUBLE) AS bad_double
    FROM documents
    """,
)
def q_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_cast: malformed input → typed null instead of an ANSI error —
    the ingestion-hardening cast (the reference's exception-driven parse
    fallbacks, etl.py:33-49, done declaratively)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.try_to_number(F.substring("text", 1, 3), F.lit("999"))
        .cast("int")
        .alias("bad_int"),
        F.col("n_chars").cast("string").try_cast("long").alias("good_long"),
        F.col("lang").try_cast("double").alias("bad_double"),
    )


@register(
    "q_array_funcs2",
    oracle="""
    SELECT doc_id,
           CAST(list_position(string_split(text, ' '), 'hash') AS BIGINT) AS hash_pos,
           array_to_string(list_filter(string_split(text, ' '),
                                       t -> t <> 'the'), ' ') AS no_the,
           list_max(string_split(text, ' ')) AS max_tok,
           list_min(string_split(text, ' ')) AS min_tok,
           len(flatten([string_split(text, ' '),
                        string_split(text, ' ')])) AS doubled_len
    FROM documents
    """,
)
def q_array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second array family: position/remove/extrema/flatten."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.array_position(toks, "hash").cast("long").alias("hash_pos"),
        F.array_join(F.array_remove(toks, "the"), " ").alias("no_the"),
        F.array_max(toks).alias("max_tok"),
        F.array_min(toks).alias("min_tok"),
        F.size(F.flatten(F.array(toks, toks))).cast("long").alias("doubled_len"),
    )


@register(
    "q_bitwise",
    oracle="""
    SELECT l_orderkey,
           l_orderkey & 255 AS low_byte,
           l_orderkey | 4096 AS with_flag,
           xor(l_orderkey, 21845) AS xored,
           l_orderkey << 2 AS shifted
    FROM lineitem WHERE l_linenumber = 1
    """,
)
def q_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family (mask/flag/hash-mix primitives)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k, 2).alias("shifted"),
    )


@register(
    "q_greatest_least",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           greatest(l_quantity, l_discount * 100, l_tax * 100) AS hi,
           least(l_quantity, l_discount * 100, l_tax * 100) AS lo
    FROM lineitem
    """,
)
def q_greatest_least(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    args = (F.col("l_quantity"), F.col("l_discount") * 100,
            F.col("l_tax") * 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.greatest(*args).alias("hi"),
        F.least(*args).alias("lo"),
    )


@register(
    "q_str_pad",
    oracle="""
    SELECT c_custkey,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_id,
           rpad(c_mktsegment, 12, '.') AS padded_seg,
           reverse(c_name) AS rev_name,
           repeat('-', CAST(c_nationkey AS INTEGER)) AS dashes
    FROM customer
    """,
)
def q_str_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width formatting family (lpad/rpad/reverse/repeat) — the
    egress-formatting shape of the reference's sink strings."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded_id"),
        F.rpad(F.col("c_mktsegment"), 12, ".").alias("padded_seg"),
        F.reverse(F.col("c_name")).alias("rev_name"),
        F.repeat(F.lit("-"), F.col("c_nationkey")).alias("dashes"),
    )


@register(
    "q_map_funcs",
    oracle="""
    SELECT doc_id,
           map(['lang', 'source'], [lang, source])['lang'][1] AS lang_v,
           map(['lang', 'source'], [lang, source])['source'][1] AS src_v,
           array_to_string(list_sort(map_keys(
               map(['lang', 'source'], [lang, source]))), ',') AS keys_sorted
    FROM documents
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No map column in fixtures → construct-then-inspect (SURVEY.md
    §2.2): map build, value lookup, sorted key listing on both engines.
    (DuckDB map[k] yields a list — [1] extracts the scalar.)"""
    d = table(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return d.select(
        "doc_id",
        m.getItem("lang").alias("lang_v"),
        m.getItem("source").alias("src_v"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_sorted"),
    )


@register(
    "q_array_hof3",
    oracle="""
    SELECT doc_id,
           list_contains(string_split(text, ' '), 'table') AS has_table,
           len(list_filter(string_split(text, ' '),
                           x -> length(x) >= 10)) = 0 AS all_short,
           CAST(len(list_filter(string_split(text, ' '),
                                x -> length(x) >= 5)) AS BIGINT) AS n_long,
           CAST(list_sum(list_transform(string_split(text, ' '),
                                        x -> length(x))) AS BIGINT)
               AS total_chars
    FROM documents
    """,
)
def q_array_hof3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate/fold higher-order functions (exists, forall, filter,
    aggregate) — the remaining HOF quartet after transform/zip_with.
    All whole-stage-codegen'd lambdas, no UDF."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.exists(toks, lambda x: x == "table").alias("has_table"),
        F.forall(toks, lambda x: F.length(x) < 10).alias("all_short"),
        F.size(F.filter(toks, lambda x: F.length(x) >= 5)).cast("long")
        .alias("n_long"),
        F.aggregate(
            toks, F.lit(0), lambda acc, x: acc + F.length(x)
        ).cast("long").alias("total_chars"),
    )


@register(
    "q_map_funcs2",
    oracle="""
    SELECT doc_id,
           upper(lang) || ',' || upper(source) AS vals_upper,
           CAST((CASE WHEN lang >= 'es' THEN 1 ELSE 0 END)
                + (CASE WHEN source >= 'es' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_ge_es,
           'lang=' || lang || ';source=' || source AS flattened
    FROM documents
    """,
)
def q_map_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions (transform_values, map_filter,
    map entry fold) — DuckDB has no map lambdas, so the oracle derives
    each expected value directly from the underlying columns; what is
    being verified is Spark's map-HOF semantics against first
    principles."""
    d = table(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    upper_m = F.transform_values(m, lambda k, v: F.upper(v))
    kept = F.map_filter(m, lambda k, v: v >= F.lit("es"))
    entries = F.transform(
        F.map_entries(m),
        lambda e: F.concat(e.getField("key"), F.lit("="), e.getField("value")),
    )
    return d.select(
        "doc_id",
        F.array_join(F.map_values(upper_m), ",").alias("vals_upper"),
        F.size(kept).cast("long").alias("n_ge_es"),
        F.array_join(entries, ";").alias("flattened"),
    )
