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
from etl_finance_spark.hofbarrier import barrier
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
    return pack_contexts(table(spark, sf_dir, "documents"))


def pack_contexts(docs: DataFrame, n_shards: int = N_SHARDS,
                  ctx_len: int = CTX_LEN) -> DataFrame:
    """Concat-then-chunk context packing — the layout step that turns a
    deduped corpus into fixed-length training windows: docs concatenate
    in doc_id order within a shard and the token stream chunks every
    ctx_len tokens (docs may straddle a boundary, exactly like the
    standard pack-and-chunk dataloader). The cumulative offset is a
    running sum per shard — partitioned window, so the sort is per-shard
    and the whole layout computes in one shuffle at any scale (shard =
    the file/partition being packed; 64 here, thousands at 100 TB).
    Pure integer arithmetic end-to-end: EXACT oracle.

    Library form (r13): shared by q_pack_contexts and the 50k-doc
    alignment-seam scaleprobe (tests/test_scale_smoke.py)."""
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % n_shards).alias("shard"),
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
        F.expr(f"off DIV {ctx_len}").alias("chunk_id"),
        (F.col("off") % ctx_len).alias("chunk_pos"),
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
    """Eval-set decontamination over the fixture corpus: eval set =
    doc_id < EVAL_CAP, training side = the rest. See
    :func:`decontaminate` for the operator itself."""
    docs = table(spark, sf_dir, "documents")
    return decontaminate(
        docs.filter(F.col("doc_id") >= EVAL_CAP),
        docs.filter(F.col("doc_id") < EVAL_CAP),
    )


def decontaminate(train_docs: DataFrame, eval_docs: DataFrame,
                  n: int = NGRAM_N) -> DataFrame:
    """Training docs sharing any word n-gram with a held-out eval set,
    with the shared-gram count as evidence — the n-gram-overlap check
    run before every serious pretraining corpus ships. The eval side's
    distinct grams are bounded (eval sets are small by construction)
    and BROADCAST; the corpus side streams its grams through the
    broadcast hash join and the per-doc count partial-aggregates
    map-side — the corpus never shuffles on gram text. Grams are
    distinct per doc on both sides, so count(*) is the count of
    distinct shared grams: EXACT. Planted-contamination recovery at
    50k docs is pinned in tests/test_scale_smoke.py."""
    from etl_finance_spark.llm.dedup import word_ngrams

    eval_g = word_ngrams(eval_docs, n=n).select("tok").distinct()
    return (
        word_ngrams(train_docs, n=n)
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


SEG_K = 8       # words per aligned segment for span-level dedup
SEG_MIN_DOCS = 2  # a segment in >= this many distinct docs is boilerplate
CHUNK_LEN = 32  # tokens per training chunk
CHUNK_STRIDE = 24  # chunk start stride (CHUNK_LEN - overlap)


@register(
    "q_span_dedup",
    oracle=f"""
    WITH segs AS (
        SELECT doc_id, i AS idx,
               array_to_string(
                   w[i*{SEG_K}+1:i*{SEG_K}+{SEG_K}], ' ') AS seg
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             unnest(generate_series(
                 0, CAST(floor((len(w)-1)/{SEG_K}) AS INT))) AS t(i)
    ), common AS (
        SELECT seg FROM segs
        GROUP BY seg HAVING count(DISTINCT doc_id) >= {SEG_MIN_DOCS}
    ), kept AS (
        SELECT s.doc_id, s.idx, s.seg
        FROM segs s ANTI JOIN common c ON s.seg = c.seg
    ), totals AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs FROM segs
        GROUP BY doc_id
    )
    SELECT k.doc_id,
           string_agg(k.seg, ' ' ORDER BY k.idx) AS clean_text,
           CAST(any_value(t.n_segs) - count(*) AS BIGINT) AS n_removed
    FROM kept k JOIN totals t ON k.doc_id = t.doc_id
    GROUP BY k.doc_id
    """,
)
def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return span_dedup(table(spark, sf_dir, "documents"))


def span_dedup(docs: DataFrame, seg_k: int = SEG_K,
               min_docs: int = SEG_MIN_DOCS) -> DataFrame:
    """Boilerplate-span removal — the RefinedWeb/CCNet line-level dedup
    re-cut onto aligned seg_k-word segments (fixture docs carry no
    newlines): any exact segment appearing in >= min_docs distinct
    docs corpus-wide (headers, footers, license banners at web scale)
    is stripped from every doc, and the survivors re-join in order.
    Three shuffles, all on bounded keys: segment -> distinct-doc count
    (map-side partial), an ids-only broadcast-able common-set anti
    join, and the per-doc re-assembly groupBy. The re-assembly sorts
    each doc's surviving segments INSIDE the aggregate (array_sort of
    (idx, seg) structs), not via a window — no per-doc sort pass.
    Docs that are 100% boilerplate drop out (inner semantics, both
    engines). At 100 TB the common-set is tiny by definition (segments
    repeated across docs) and broadcasts.

    Library form (r13): shared by q_span_dedup and the 50k-doc
    alignment-seam scaleprobe (tests/test_scale_smoke.py), which pins
    the aligned-vs-straddling boilerplate semantics at scale."""
    w = F.split("text", " ")
    # barrier: the per-segment slice lambda is loop-invariant in the
    # token array — inlined, the split re-executes once per segment
    # (the word_ngrams hazard; hofbarrier module doc has the numbers)
    wd = barrier(docs.select("doc_id", w.alias("w")))
    segs = wd.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0), F.floor((F.size("w") - 1) / seg_k).cast("int")
                ),
                lambda i: F.array_join(
                    F.slice(F.col("w"), i * seg_k + 1, seg_k), " "
                ),
            )
        ).alias("idx", "seg"),
    )
    common = (
        segs.groupBy("seg")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("seg")
    )
    totals = segs.groupBy("doc_id").agg(F.count("*").alias("n_segs"))
    # `common` is corpus-derived (grows with data) — no forced broadcast
    # hint; AQE broadcasts the anti side only while it measures small
    kept = segs.join(common, "seg", "left_anti")
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "seg"))),
                    lambda s: s.getField("seg"),
                ),
                " ",
            ).alias("clean_text"),
            F.count("*").alias("n_kept"),
        )
        .join(totals, "doc_id")
        .select(
            "doc_id",
            "clean_text",
            (F.col("n_segs") - F.col("n_kept")).alias("n_removed"),
        )
    )


# Blocklist term active in the fixtures; the email/phone patterns are the
# production point but match nothing in synthetic text (asserted in
# tests/test_llm.py so a fixture change can't silently blind them).
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?\d[\d -]{7,}\d", "<PHONE>"),
    (r"\bcustomer\b", "<TERM>"),
)


@register(
    "q_pii_redact",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
               regexp_replace(
                   regexp_replace(
                       text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                   '\+?\d[\d -]{7,}\d', '<PHONE>', 'g'),
               '\bcustomer\b', '<TERM>', 'g') AS redacted,
           CAST(len(regexp_extract_all(
               text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             + len(regexp_extract_all(text, '\+?\d[\d -]{7,}\d'))
             + len(regexp_extract_all(text, '\bcustomer\b'))
             AS BIGINT) AS n_redactions
    FROM documents
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII / blocklist scrubbing — chained regexp_replace passes
    (emails, phone numbers, blocklisted terms) plus a per-doc match
    count for audit sampling. Pure map-side JVM regex over the scan:
    no shuffle, no UDF; at 100 TB this runs at parquet-read bandwidth
    and composes with any downstream op. Patterns stay in shared
    RE2/Java syntax (no lookbehind) so the oracle runs them verbatim."""
    docs = table(spark, sf_dir, "documents")
    red = F.col("text")
    n = F.lit(0).cast("long")
    for pat, tag in PII_PATTERNS:
        red = F.regexp_replace(red, pat, tag)
        n = n + F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0)))
    return docs.select(
        "doc_id", red.alias("redacted"), n.cast("long").alias("n_redactions")
    )


@register(
    "q_chunk_windows",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, w, len(w) AS n,
               1 + CAST(ceil(greatest(0, len(w) - {CHUNK_LEN})
                             / {CHUNK_STRIDE}.0) AS INT) AS n_chunks
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    )
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
           array_to_string(
               w[i*{CHUNK_STRIDE}+1:i*{CHUNK_STRIDE}+{CHUNK_LEN}],
               ' ') AS chunk_text,
           CAST(least({CHUNK_LEN}, n - i*{CHUNK_STRIDE}) AS BIGINT)
               AS n_tokens
    FROM t, unnest(generate_series(0, n_chunks - 1)) AS s(i)
    """,
)
def q_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking — each doc becomes overlapping
    CHUNK_LEN-token training chunks on a CHUNK_STRIDE grid (the
    tokenize-and-window step before packing; overlap preserves
    cross-boundary context). Chunk count is 1 + ceil((n - LEN)/STRIDE)
    so every token lands in >= 1 chunk and no chunk is a strict suffix
    of its predecessor. Pure map-side explode: the fan-out multiplies
    rows ~n/STRIDE but never shuffles; at 100 TB the chunker pipelines
    straight into the packing shuffle's map phase."""
    docs = table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n = F.size(w)
    n_chunks = (
        F.lit(1)
        + F.ceil(
            F.greatest(F.lit(0), n - CHUNK_LEN) / float(CHUNK_STRIDE)
        ).cast("int")
    )
    return docs.select(
        "doc_id", w.alias("w"), n.alias("n"),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("_p", "i"),
    ).select(
        "doc_id",
        F.col("i").cast("long").alias("chunk_idx"),
        F.array_join(
            F.slice("w", F.col("i") * CHUNK_STRIDE + 1, CHUNK_LEN), " "
        ).alias("chunk_text"),
        F.least(F.lit(CHUNK_LEN), F.col("n") - F.col("i") * CHUNK_STRIDE)
        .cast("long").alias("n_tokens"),
    )


@register(
    "q_array_agg_distinct",
    oracle="""
    SELECT source,
           array_to_string(list_sort(list(DISTINCT lang)), ',') AS langs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents GROUP BY source
    """,
)
def q_array_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set aggregation into a SORTED array: collect_set's
    order is partition-dependent (a nondeterminism bug class for any
    downstream hash/join on the array), so the declared form always
    wraps it in array_sort — the discipline that makes set-valued
    columns safe to compare, hash, and re-shuffle. Per-group distinct
    langs stay tiny; partials collapse map-side. Joined to a string at
    the boundary (the q_agg_collect_sorted house rule) so the driver's
    pandas hasher sees a scalar — the raw array form was the r05 red:
    pandas factorize dies on list cells."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.array_join(F.array_sort(F.collect_set("lang")), ",").alias("langs"),
        F.count_distinct("lang").alias("n_langs"),
    )


@register(
    "q_corpus_stats",
    oracle="""
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens,
           round(avg(n_chars), 2) AS avg_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM documents
    GROUP BY source, lang
    """,
)
def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass corpus data-card: per (source, lang) cell — document
    count, whitespace-token total, mean/max length, first doc id. The
    training-data report every corpus release ships, as ONE scan with
    every measure a mergeable aggregate (no second pass, no driver
    loop; the same profile-in-one-scan posture as q_profile_events).
    At 100 TB this is the query whose partial aggregation matters
    most: the cell count is tiny (|sources|×|langs|) while the input
    is the whole corpus, so map-side collapse does all the work."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("tokens"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.max("n_chars").alias("max_chars"),
        F.min("doc_id").alias("first_doc"),
    )
