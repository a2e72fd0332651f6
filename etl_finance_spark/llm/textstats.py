"""Text analysis operators (SURVEY.md §2.2 X-LLM-5..7 + the text-analysis
north-star mandate: language-ID, quality scoring, token counting,
fingerprinting).

Everything is built-in expressions over `documents` — split/explode/
regexp/md5 — inside whole-stage codegen. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_finance_spark.catalog import table
from etl_finance_spark.registry import register

# Marker token sets for the language-ID heuristic. The fixture corpus is
# synthetic (one shared vocabulary across langs — verified empirically),
# so no heuristic can recover the `lang` column; the operator is the
# deliverable: deterministic marker-set scoring with argmax, the same
# shape a real stopword-profile lang-ID takes.
_MARKERS = {
    "sql": ("table", "row", "column", "join", "query"),
    "exec": ("scan", "filter", "hash", "merge", "batch"),
    "perf": ("fast", "slow", "big", "small", "vector"),
}


@register(
    "q_text_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct,
           round(length(replace(text, ' ', '')) * 1.0
                 / len(string_split(text, ' ')), 6) AS avg_token_len,
           n_chars = length(text) AS chars_ok
    FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-LLM-5: token count, vocab size, avg token length, plus a
    consistency check of the precomputed n_chars column."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            / F.size(toks),
            6,
        ).alias("avg_token_len"),
        (F.col("n_chars") == F.length("text")).alias("chars_ok"),
    )


@register(
    "q_docs_by_lang",
    oracle="""
    SELECT lang, source, count(*) AS n_docs,
           round(avg(n_chars), 6) AS avg_chars,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def q_docs_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-LLM-6: per-(lang, source) corpus profile."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "q_term_freq",
    oracle="""
    SELECT tok AS term, count(*) AS tf
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    """,
)
def q_term_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-LLM-7: corpus term-frequency table (explode → count; the
    shuffle key is the term, partial counts combine map-side)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _marker_hits(toks, markers: tuple[str, ...]):
    return F.size(
        F.array_intersect(F.array_distinct(toks),
                          F.array(*[F.lit(m) for m in markers]))
    )


@register(
    "q_lang_id",
    oracle="""
    WITH scored AS (
        SELECT doc_id,
               len(list_intersect(list_distinct(string_split(text, ' ')),
                   ['table', 'row', 'column', 'join', 'query'])) AS s_sql,
               len(list_intersect(list_distinct(string_split(text, ' ')),
                   ['scan', 'filter', 'hash', 'merge', 'batch'])) AS s_exec,
               len(list_intersect(list_distinct(string_split(text, ' ')),
                   ['fast', 'slow', 'big', 'small', 'vector'])) AS s_perf
        FROM documents
    )
    SELECT doc_id, s_sql, s_exec, s_perf,
           CASE WHEN s_sql >= s_exec AND s_sql >= s_perf THEN 'sql'
                WHEN s_exec >= s_perf THEN 'exec'
                ELSE 'perf' END AS profile
    FROM scored
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID mechanism: marker-set hit scoring + deterministic
    argmax (ties break by fixed profile precedence)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = d.select(
        "doc_id",
        _marker_hits(toks, _MARKERS["sql"]).cast("long").alias("s_sql"),
        _marker_hits(toks, _MARKERS["exec"]).cast("long").alias("s_exec"),
        _marker_hits(toks, _MARKERS["perf"]).cast("long").alias("s_perf"),
    )
    return scored.withColumn(
        "profile",
        F.when(
            (F.col("s_sql") >= F.col("s_exec"))
            & (F.col("s_sql") >= F.col("s_perf")),
            "sql",
        )
        .when(F.col("s_exec") >= F.col("s_perf"), "exec")
        .otherwise("perf"),
    )


@register(
    "q_text_quality",
    oracle="""
    SELECT doc_id,
           round(len(list_distinct(string_split(text, ' '))) * 1.0
                 / len(string_split(text, ' ')), 6) AS ttr,
           len(string_split(text, ' ')) BETWEEN 20 AND 80 AS len_ok,
           round(length(replace(text, ' ', '')) * 1.0
                 / length(text), 6) AS density,
           (len(list_distinct(string_split(text, ' '))) * 1.0
                 / len(string_split(text, ' ')) >= 0.3)
               AND len(string_split(text, ' ')) BETWEEN 20 AND 80
               AS keep
    FROM documents
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: type-token ratio, length gate, character
    density, and the resulting keep/drop decision — the filter shape of
    a pretraining quality pipeline."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    ttr = F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6)
    len_ok = F.size(toks).between(20, 80)
    return d.select(
        "doc_id",
        ttr.alias("ttr"),
        len_ok.alias("len_ok"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            / F.length("text"),
            6,
        ).alias("density"),
        ((F.size(F.array_distinct(toks)) / F.size(toks) >= 0.3) & len_ok).alias(
            "keep"
        ),
    )


@register(
    "q_token_count",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_ish,
           len(string_split(text, ' ')) AS ws_tokens
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace and a BPE-ish regex
    (letter-runs / digit-runs / single punctuation) — the cheap
    pre-tokenizer estimate a data pipeline uses for budget accounting."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0
            )
        ).cast("long").alias("bpe_ish"),
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
    )


@register(
    "q_edit_distance",
    oracle="""
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           levenshtein(substring(a.text, 1, 30), substring(b.text, 1, 30))
               AS dist
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    WHERE a.doc_id < 50
    """,
)
def q_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein distance between adjacent docs' prefixes — the fuzzy
    rung of the dedup ladder (string-level, vs token-set Jaccard and
    bit-level SimHash). Prefix-bounded: edit distance is O(len²) per
    pair, so production use caps the comparison window exactly like
    this."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 51)
    a = d.select(F.col("doc_id").alias("d1"),
                 F.substring("text", 1, 30).alias("t1"))
    b = d.select(F.col("doc_id").alias("d2"),
                 F.substring("text", 1, 30).alias("t2"))
    return (
        a.filter(F.col("d1") < 50)
        .join(b, b.d2 == a.d1 + 1)
        .select("d1", "d2", F.levenshtein("t1", "t2").cast("long").alias("dist"))
    )


@register(
    "q_tfidf",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ), df AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1
    ), n AS (
        SELECT count(*) AS n FROM documents
    ), scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * ln(n.n * 1.0 / df.df), 6) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf FROM (
        SELECT doc_id, term, tfidf,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term
               ) AS rn
        FROM scored
    ) WHERE rn <= 3 AND doc_id < 100
    """,
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document: term frequency × ln(N/df), the
    canonical keyword extraction. The df frame is VOCABULARY-sized —
    Heaps-law unbounded, not a fixed dim — so its join carries no forced
    broadcast hint (round-4 rule: AQE decides from measured sizes; the
    tf⋈df equi-join on term is the correct shuffle shape at corpus
    scale). Corpus size N rides in as a 1-row aggregate cross join —
    no driver-side count() action inside the plan. Ranking uses the
    rounded score + term tiebreak so the row set is engine-stable."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n1 = d.agg(F.count("*").cast("double").alias("n_docs"))
    from pyspark.sql.window import Window

    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n1))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 3) & (F.col("doc_id") < 100))
        .select("doc_id", "term", "tfidf")
    )


@register(
    "q_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(text) AS content_md5,
           md5(array_to_string(string_split(text, ' ')[1:8], ' '))
               AS prefix_shingle_md5
    FROM documents
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-content hash + first-8-token
    shingle hash (md5 agrees bit-for-bit across engines, unlike
    xxhash64 — the SimHash fingerprint in llm.dedup covers the
    locality-sensitive variant)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("content_md5"),
        F.md5(
            F.array_join(F.slice(F.split("text", " "), 1, 8), " ").cast("binary")
        ).alias("prefix_shingle_md5"),
    )


@register(
    "q_split_deterministic",
    oracle="""
    SELECT doc_id,
           CASE WHEN strpos('0123456789abcdef',
                            substring(md5(text), 1, 1)) <= 12 THEN 'train'
                WHEN strpos('0123456789abcdef',
                            substring(md5(text), 1, 1)) <= 14 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def q_split_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split — the training-pipeline
    primitive rand() cannot provide: assignment is a pure function of
    CONTENT (md5 of the text), so it is identical across engines, runs,
    repartitions, and incremental re-ingestion of the same document.
    First hex nibble buckets 16 ways → 12/2/2 = 75%/12.5%/12.5%.
    Map-side projection only; no shuffle at any scale."""
    d = table(spark, sf_dir, "documents")
    nib = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("text").cast("binary")), 1, 1),
    )
    return d.select(
        "doc_id",
        F.when(nib <= 12, "train")
        .when(nib <= 14, "val")
        .otherwise("test")
        .alias("split"),
    )
