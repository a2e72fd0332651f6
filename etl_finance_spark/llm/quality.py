"""Document quality scoring, second tier (SURVEY.md §2 LLM ops).

q_text_quality (llm/textstats.py) covers the length/ratio gates; this
module adds the corpus-statistics filters real pretraining pipelines
(C4/Gopher-style) run next: intra-document REPETITION (dup n-gram
ratio — the single strongest junk signal for generated/boilerplate
text) and LEXICAL DIVERSITY (type-token ratio). Both are pure
higher-order-function expressions over the token array — per-doc
map-side work, no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_finance_spark.catalog import table
from etl_finance_spark.hofbarrier import barrier
from etl_finance_spark.registry import register


@register(
    "q_repetition_score",
    oracle="""
    WITH g AS (
        SELECT doc_id,
               CASE WHEN len(string_split(text, ' ')) >= 2
                    THEN list_transform(
                        generate_series(1, len(string_split(text, ' ')) - 1),
                        i -> string_split(text, ' ')[i] || ' '
                             || string_split(text, ' ')[i + 1])
                    ELSE [] END AS grams
        FROM documents
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_bigrams,
           CASE WHEN len(grams) = 0 THEN 0.0
                ELSE round(1.0 - len(list_distinct(grams)) * 1.0
                                 / len(grams), 6) END AS rep_ratio
    FROM g
    """,
)
def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-bigram ratio per document (0 = no repeated phrasing,
    →1 = boilerplate). The Gopher-style repetition gate; everything
    stays inside whole-stage codegen via transform/array_distinct.

    The scan is rebalanced to defaultParallelism first: shingle
    construction is CPU-dense per row, and a corpus stored in fewer
    file splits than cores would otherwise run the whole pass on a
    handful of tasks (4x wall-clock on the bench fixture, which is one
    row group). When input splits already exceed core count the
    exchange is a cheap rebalance of a few MB of text per task."""
    d = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    toks = F.split("text", " ")
    # tokenize once per row behind a barrier: the per-position bigram
    # lambda is loop-invariant in the token array — inlined, the split
    # re-executes once per bigram (hofbarrier module doc, r14)
    t = barrier(d.select("doc_id", toks.alias("toks")))
    grams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("toks"), i),
                F.element_at(F.col("toks"), i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # second barrier: n_bigrams/rep_ratio consume the gram set three
    # ways — inlined, the shingling re-runs per consumer expression
    g = barrier(t.select("doc_id", grams.alias("grams")))
    return g.select(
        "doc_id",
        F.size("grams").cast("long").alias("n_bigrams"),
        F.when(F.size("grams") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                1.0 - F.size(F.array_distinct("grams"))
                / F.size("grams").cast("double"),
                6,
            )
        )
        .alias("rep_ratio"),
    )


@register(
    "q_lexical_diversity",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
           round(len(list_distinct(toks)) * 1.0 / len(toks), 6) AS ttr,
           round(list_sum(list_transform(toks, x -> length(x))) * 1.0
                 / len(toks), 6) AS mean_word_len,
           CAST(list_max(list_transform(toks, x -> length(x)))
                AS BIGINT) AS max_word_len
    FROM t
    """,
)
def q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio + word-length stats — the lexical-diversity
    quality gate (low TTR = templated text). One pass of HOF folds per
    doc; fixtures guarantee ≥1 token so the divisions are total."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    lens = F.transform(toks, lambda x: F.length(x))
    # no barrier here, deliberately (r14): the consumers are flat
    # expressions over toks/lens, and codegen subexpression elimination
    # already shares them — measured 0.31s inline vs 0.45s behind a
    # barrier at sf0.1. The barrier only pays where a LAMBDA re-runs a
    # loop-invariant subtree per element (hofbarrier module doc).
    t = d.select(
        "doc_id", toks.alias("toks"), lens.alias("lens")
    )
    return t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_types"),
        F.round(
            F.size(F.array_distinct("toks"))
            / F.size("toks").cast("double"),
            6,
        ).alias("ttr"),
        F.round(
            F.aggregate("lens", F.lit(0), lambda a, x: a + x).cast("double")
            / F.size("toks"),
            6,
        ).alias("mean_word_len"),
        F.array_max("lens").cast("long").alias("max_word_len"),
    )
