"""Corpus-assembly operators a training-data pipeline runs after dedup
(SURVEY.md §2 LLM mandate): context packing, domain-mix weighting,
eval-set decontamination, per-source caps. Each is pure DataFrame ops —
integer/window arithmetic, no UDFs — so every rung is EXACT-oracled.

The reference has no analog (it ships rows to MySQL, etl.py:137-158);
these are the operations its users would need the day they point the
pipeline at pretraining data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_finance_spark.catalog import table
from etl_finance_spark.registry import register

CTX_LEN = 2048  # tokens per packed context window
N_SHARDS = 64   # packing shards; at scale = files/partitions being packed
EVAL_CAP = 20   # doc_id < EVAL_CAP is the held-out eval set
NGRAM_N = 5     # decontamination n-gram size
PER_SOURCE_CAP = 3


@register(
    "q_pack_contexts",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, doc_id % {N_SHARDS} AS shard,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ), c AS (
        SELECT doc_id, shard, n_tokens,
               CAST(sum(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS off
        FROM t
    )
    SELECT doc_id, shard, n_tokens, off,
           CAST(off // {CTX_LEN} AS BIGINT) AS chunk_id,
           CAST(off % {CTX_LEN} AS BIGINT) AS chunk_pos
    FROM c
    """,
)
def q_pack_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk context packing — the layout step that turns a
    deduped corpus into fixed-length training windows: docs concatenate
    in doc_id order within a shard and the token stream chunks every
    CTX_LEN tokens (docs may straddle a boundary, exactly like the
    standard pack-and-chunk dataloader). The cumulative offset is a
    running sum per shard — partitioned window, so the sort is per-shard
    and the whole layout computes in one shuffle at any scale (shard =
    the file/partition being packed; 64 here, thousands at 100 TB).
    Pure integer arithmetic end-to-end: EXACT oracle."""
    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("off", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return c.select(
        "doc_id", "shard", "n_tokens", "off",
        F.expr(f"off DIV {CTX_LEN}").alias("chunk_id"),
        (F.col("off") % CTX_LEN).alias("chunk_pos"),
    )


@register(
    "q_domain_mix",
    oracle="""
    WITH counts AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ), tot AS (
        SELECT sum(pow(CAST(n_tokens AS DOUBLE), 0.7)) AS z FROM counts
    )
    SELECT source, n_docs, n_tokens,
           round(pow(CAST(n_tokens AS DOUBLE), 0.7) / z, 6) AS weight
    FROM counts, tot
    """,
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain sampling weights (the standard
    count^alpha / sum(count^alpha) mix, alpha=0.7 — upweights small
    domains the way multilingual/pretraining mixes do). One grouped
    pass over the corpus; the normalizer is a 1-row aggregate of the
    ~|sources| counts, broadcast back — no global window, nothing
    driver-side."""
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    pw = F.pow(F.col("n_tokens").cast("double"), F.lit(0.7))
    tot = counts.agg(F.sum(pw).alias("z"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", "n_tokens",
        F.round(pw / F.col("z"), 6).alias("weight"),
    )


@register(
    "q_decontaminate",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w
        FROM documents
    ), grams AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(w) - {NGRAM_N - 1}),
                   i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]
                        || ' ' || w[i + 3] || ' ' || w[i + 4]))) AS tok
        FROM toks WHERE len(w) >= {NGRAM_N}
    ), eval_g AS (
        SELECT DISTINCT tok FROM grams WHERE doc_id < {EVAL_CAP}
    )
    SELECT g.doc_id, count(*) AS shared_grams
    FROM grams g JOIN eval_g e ON g.tok = e.tok
    WHERE g.doc_id >= {EVAL_CAP}
    GROUP BY g.doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: training docs sharing any word 5-gram
    with a held-out eval set, with the shared-gram count as evidence
    (the n-gram-overlap check run before every serious pretraining
    corpus ships). The eval side's distinct grams are bounded (eval sets
    are small by construction) and BROADCAST; the corpus side streams
    its grams through the broadcast hash join and the per-doc count
    partial-aggregates map-side — the corpus never shuffles on gram
    text. Grams are distinct per doc on both sides, so count(*) is the
    count of distinct shared grams: EXACT."""
    from etl_finance_spark.llm.dedup import word_ngrams

    docs = table(spark, sf_dir, "documents")
    grams = word_ngrams(docs, n=NGRAM_N)
    eval_g = (
        grams.filter(F.col("doc_id") < EVAL_CAP).select("tok").distinct()
    )
    return (
        grams.filter(F.col("doc_id") >= EVAL_CAP)
        .join(F.broadcast(eval_g), "tok")
        .groupBy("doc_id")
        .agg(F.count("*").alias("shared_grams"))
    )


@register(
    "q_source_cap",
    oracle=f"""
    SELECT source, doc_id, n_chars, rn
    FROM (
        SELECT source, doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id
               ) AS rn
        FROM documents
    ) t WHERE rn <= {PER_SOURCE_CAP}
    """,
)
def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (the host-level quota every web corpus
    applies so one domain can't dominate): keep the top-N docs per
    source by length with doc_id tiebreak. Partitioned row_number —
    shuffles once on source; a skew-heavy source at 100 TB takes the
    two-phase per-partition-top-N + merge variant (same shape as
    q_win_topk_per_group's scale note)."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    return (
        docs.select("source", "doc_id", "n_chars")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= PER_SOURCE_CAP)
    )
