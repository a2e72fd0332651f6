"""Scale-invariant smoke tests on a 10x-fixture synthetic corpus.

The fixture embeddings (2000 vectors at sf0.1, 200 at sf0.001) never
exceed the quantizer's TRAIN_CAP, so the fixture suite exercises the
sample-bounded training path only via an artificially small cap. This
module synthesizes a 20k-vector corpus — above TRAIN_CAP — and asserts
the properties that make the ANN/dedup ladder a 100 TB design, as
STRUCTURAL invariants (candidate-set fractions, recall floors,
above-cap determinism), never wall-clock assertions:

- LSH banding prunes: candidate pairs are a small fraction of the
  all-pairs space, at 10x the fixture corpus (the claim that the pair
  space "never materializes" must survive growth, not just sf0.1).
- IVF above the cap: the quantizer trains on the bounded sample, stays
  deterministic, spreads the corpus across many cells (no degenerate
  one-cell model), and nprobe routing still beats random recall.
- Semantic dedup pair scan stays bounded per cell: the number of
  scanned pairs is sum(|cell| choose 2) — far below all-pairs.

Vectors are deterministic (hash-seeded, mildly clustered so ANN has
structure to find), generated on executors via the id range — no
driver-side data movement.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import etl_finance_spark.llm.similarity as S

N = 20_000
DIM = 64
N_QUERIES = 30


@pytest.fixture(scope="module")
def big_corpus(spark):
    """20k deterministic 64-dim vectors with planted cluster structure:
    32 hash-seeded anchor directions, each vector = anchor + small
    hash noise. Generated from spark.range — rows are born on
    executors."""
    df = spark.range(N).select(F.col("id").cast("long").alias("vec_id"))
    anchor = F.pmod(F.xxhash64("vec_id"), F.lit(32))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda i: (
            F.pmod(F.xxhash64(anchor * F.lit(1000) + i), F.lit(997))
            / F.lit(997.0)
            - 0.5
            + (
                F.pmod(F.xxhash64(F.col("vec_id") * F.lit(10007) + i),
                       F.lit(991))
                / F.lit(991.0)
                - 0.5
            )
            * F.lit(0.3)
        ),
    )
    out = S.with_unit_vec(
        df.withColumn("embedding", vec), col="embedding"
    ).select("vec_id", "vec", "nrm").persist()
    out.count()
    yield out
    out.unpersist()


def test_lsh_band_width_is_the_pruning_knob(spark, big_corpus):
    """Random signatures collide per band with probability 2^-r, so the
    candidate fraction floors at 1-(1-2^-r)^n_bands regardless of
    corpus size: the default r=4 config (recall-tuned for the small
    unclustered fixtures) measured 25.6% candidates here — a corpus-
    size-independent floor, NOT scale pruning. Widening to r=8 (32
    planes, 4 bands) is the documented scale move: measured 4.1%
    candidates with 0.83 brute-force top-k containment on this
    clustered corpus. Pin that operating point loosely."""
    queries = big_corpus.filter(F.col("vec_id") < N_QUERIES)
    bands = S.lsh_band_keys(big_corpus, 32, 4)  # r = 8 bits per band
    vb = bands.select(F.col("vec_id").alias("cid"), "band_idx", "band_bits")
    qb = bands.join(
        F.broadcast(queries.select("vec_id")), "vec_id", "left_semi"
    ).select(F.col("vec_id").alias("qid"), "band_idx", "band_bits")
    cand = (
        qb.join(vb, ["band_idx", "band_bits"])
        .filter(F.col("cid") != F.col("qid"))
        .select("qid", "cid")
        .distinct()
    )
    n_cand = cand.count()
    assert 0 < n_cand < 0.08 * N_QUERIES * N, n_cand
    brute = S.cosine_topk(big_corpus, queries, S.TOP_K).collect()
    bset = {(r.qid, r.cid) for r in brute}
    cset = {(r.qid, r.cid) for r in cand.collect()}
    containment = len(bset & cset) / len(bset)
    assert containment >= 0.7, f"containment {containment:.3f}"


def test_ivf_above_train_cap(spark, big_corpus):
    """Corpus > TRAIN_CAP: training runs on the bounded sample. The
    model must stay deterministic, produce a non-degenerate cell
    layout (every cell used, largest cell far below the whole corpus),
    and route queries with recall far above the nprobe/ncells random
    floor."""
    assert N > S.TRAIN_CAP  # the premise: this corpus exceeds the cap
    c1 = sorted(map(tuple, S.ivf_centroids(big_corpus).collect()))
    c2 = sorted(map(tuple, S.ivf_centroids(big_corpus).collect()))
    assert c1 == c2
    cent = S.ivf_centroids(big_corpus)
    cells = S.ivf_assign(big_corpus, cent, 1)
    sizes = {r["cell"]: r["n"] for r in
             cells.groupBy("cell").agg(F.count("*").alias("n")).collect()}
    assert len(sizes) == S.N_CELLS  # no empty cells on clustered data
    assert max(sizes.values()) < 0.5 * N  # no degenerate mega-cell

    queries = big_corpus.filter(F.col("vec_id") < N_QUERIES)
    brute = S.cosine_topk(big_corpus, queries, S.TOP_K).collect()
    ivf = S.ann_ivf_topk(big_corpus, queries, S.TOP_K, cent=cent).collect()
    bset = {(r.qid, r.cid) for r in brute}
    iset = {(r.qid, r.cid) for r in ivf}
    recall = len(iset & bset) / len(bset)
    random_floor = S.N_PROBE / S.N_CELLS
    assert recall >= 2 * random_floor, f"recall {recall:.3f}"


def test_semdedup_pair_scan_bounded_per_cell(spark, big_corpus):
    """The semantic-dedup quadratic term must be sum-of-cells-squared,
    not corpus-squared: with the planted 32-cluster structure the
    scanned pair count stays well under 25% of all-pairs."""
    cent = S.ivf_centroids(big_corpus)
    cells = S.ivf_assign(big_corpus, cent, 1)
    sizes = [r["n"] for r in
             cells.groupBy("cell").agg(F.count("*").alias("n")).collect()]
    scanned = sum(n * (n - 1) // 2 for n in sizes)
    all_pairs = N * (N - 1) // 2
    assert scanned < 0.25 * all_pairs, f"{scanned}/{all_pairs}"
    # and the verdict frame itself runs end-to-end at this size
    verdict = S.semantic_dedup(big_corpus, S.SEMDEDUP_TAU, cent=cent)
    assert verdict.count() == N


N_DOCS = 50_000
PLANTED = 500
DOC_HALF = N_DOCS // 2


@pytest.fixture(scope="module")
def doc_corpus(spark):
    """50k synthetic docs, 30 hash-random tokens each from a 50k
    vocabulary; docs DOC_HALF..DOC_HALF+PLANTED-1 are near-duplicate
    variants of docs 0..PLANTED-1 (positions 0-2 replaced, 27/30 tokens
    shared — a 27-token contiguous run, so 23 shared word 5-grams)."""
    df = spark.range(N_DOCS).select(F.col("id").cast("long").alias("doc_id"))
    is_var = (F.col("doc_id") >= DOC_HALF) & (
        F.col("doc_id") < DOC_HALF + PLANTED)
    base = F.when(is_var, F.col("doc_id") - DOC_HALF).otherwise(
        F.col("doc_id"))
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda i: F.when(
            is_var & (i < 3),
            F.concat(F.lit("v"), F.pmod(
                F.xxhash64(base * F.lit(100) + i + F.lit(7777)),
                F.lit(50_000))),
        ).otherwise(
            F.concat(F.lit("t"), F.pmod(
                F.xxhash64(base * F.lit(100) + i), F.lit(50_000)))
        ),
    )
    docs = df.select(
        "doc_id", F.concat_ws(" ", toks).alias("text")
    ).persist()
    docs.count()
    yield docs
    docs.unpersist()


def test_minhash_ladder_recovers_planted_dups_at_scale(spark, doc_corpus):
    """Text-dedup ladder on a 50k-doc synthetic corpus (16x the sf0.1
    documents table) with 500 planted near-duplicate pairs (27/30
    tokens shared -> Jaccard 27/33 ~ 0.818 >= tau 0.8). Unrelated docs
    draw 30 tokens from a 50k vocabulary, so ~22M pairs share exactly
    one token (baseline J ~ 1/59) — the profile that exposes the
    band_rows=2 false-candidate floor (measured 98 813 candidates: a
    pair collides per band with P ~ j^band_rows, quadratic in corpus
    size for any nonzero baseline similarity). At the documented scale
    setting band_rows=4 the candidate set must collapse to essentially
    the planted pairs (measured 504) while recovering >= 98% of them:
    candidate generation linear in true duplicates, NOT
    corpus-quadratic."""
    from etl_finance_spark.llm.dedup import (
        BAND_ROWS_WIDEN_DOCS, JACCARD_TAU, derive_band_rows,
        lsh_candidate_pairs, minhash_lsh_pairs, minhash_signatures,
    )

    docs = doc_corpus
    # the knob is now corpus-size-derived (VERDICT r12 item 6): 2 below
    # the widen threshold, 4 at/above — this corpus lands on 4, so the
    # default-argument path below exercises the derived scale setting
    assert derive_band_rows(BAND_ROWS_WIDEN_DOCS - 1) == 2
    assert derive_band_rows(BAND_ROWS_WIDEN_DOCS) == 4
    assert derive_band_rows(N_DOCS) == 4
    n_cand = lsh_candidate_pairs(
        minhash_signatures(docs), band_rows=derive_band_rows(N_DOCS)
    ).count()
    assert PLANTED * 0.95 <= n_cand <= PLANTED * 1.05 + 25, n_cand
    verified = minhash_lsh_pairs(docs, JACCARD_TAU)
    got = {(r.d1, r.d2) for r in verified.collect()}
    planted = {(i, i + DOC_HALF) for i in range(PLANTED)}
    recall = len(got & planted) / PLANTED
    assert recall >= 0.98, f"planted-dup recall {recall:.3f}"
    # and nothing spurious: every verified pair is a planted one
    assert got <= planted, got - planted


def test_decontaminate_recovers_planted_contamination(spark, doc_corpus):
    """Decontamination at 50k docs: eval set = the PLANTED base docs;
    the flagged training docs must be EXACTLY their variants (each
    shares a 27-token contiguous run -> 23 distinct word 5-grams),
    and nothing else — random docs can only share a gram via a 5-token
    sequence match, which the hash-random construction precludes. Pins
    both precision (no false flags at 16x fixture scale: the broadcast
    gram join generates no spurious overlap) and evidence counts."""
    from etl_finance_spark.llm.corpus import decontaminate

    eval_docs = doc_corpus.filter(F.col("doc_id") < PLANTED)
    train = doc_corpus.filter(F.col("doc_id") >= PLANTED)
    flagged = {r.doc_id: r.shared_grams
               for r in decontaminate(train, eval_docs).collect()}
    expect = set(range(DOC_HALF, DOC_HALF + PLANTED))
    assert set(flagged) == expect, (
        set(flagged) ^ expect or "exact match"
    )
    # evidence: 23 distinct shared 5-grams per variant (a rare in-doc
    # token collision can only reduce the distinct count slightly)
    assert all(20 <= v <= 23 for v in flagged.values()), (
        sorted(set(flagged.values()))
    )


def test_connected_components_log_depth_on_deep_chain(spark):
    """A 4096-node path graph is the adversarial DEPTH case for label
    propagation: naive min-label needs ~4096 passes (one hop each), so
    converging inside the default max_iter=20 proves the pointer-jump
    step compounds propagation distance super-linearly (log-depth) —
    the property that lets dedup-cluster chains of any practical length
    converge at 100 TB. Labels must also be exactly right: every node
    reaches the chain's minimum id."""
    from etl_finance_spark.llm.clusters import connected_components

    L = 4096
    pairs = spark.range(L - 1).select(
        F.col("id").alias("d1"), (F.col("id") + 1).alias("d2"))
    out = connected_components(pairs)  # raises if max_iter exhausted
    assert out.filter(F.col("component") != 0).count() == 0
    assert out.count() == L


def test_asof_backward_closed_form_at_scale(spark):
    """1M probes + 200k quotes over 1000 keys, quotes on a regular
    10-tick grid — every probe's expected payload is closed-form: the
    quote at floor(ts/10)*10 (a quote at the exact probe ts counts;
    side orders quote-before-probe). Verifies the union+window as-of at
    ~17x the fixture event count with NO brute-force oracle (the
    mismatch count is computed distributed; nothing collects), and pins
    the structural claim behind the 100 TB posture: the plan is a
    Window over a Union — no join operator anywhere, so there is no
    |quotes_k| x |probes_k| fan-out to blow up on a hot key."""
    from conftest import explain_simple

    from etl_finance_spark.operators.joins import asof_backward

    n_keys = 1_000
    quotes = spark.range(200_000).select(
        (F.col("id") % n_keys).alias("k"),
        ((F.col("id") / n_keys).cast("long") * 10).alias("ts"),
        F.col("id").alias("rid"),
        ((F.col("id") % n_keys) * 100_000
         + (F.col("id") / n_keys).cast("long") * 10)
        .cast("double").alias("qv"),
    )
    probes = spark.range(1_000_000).select(
        (F.col("id") % n_keys).alias("k"),
        F.pmod(F.xxhash64("id"), F.lit(2000)).alias("ts"),
        (F.col("id") + 10_000_000).alias("rid"),
    )
    out = asof_backward(probes, quotes, ["k"], "ts", "rid", ["qv"])
    plan = explain_simple(spark, out)
    assert "Window" in plan
    assert "Join" not in plan
    # every key has a quote at ts=0, so no probe is left unmatched
    expected = (F.col("k") * 100_000
                + F.floor(F.col("ts") / 10) * 10).cast("double")
    assert out.count() == 1_000_000
    assert out.filter(
        F.col("qv").isNull() | (F.col("qv") != expected)
    ).count() == 0


def test_fill_forward_closed_form_at_scale(spark):
    """LOCF on a 1M-row series over 1000 entities with an observation
    planted every 5th tick (value = tick), so the filled value is
    closed-form floor(tick/5)*5 at every row. Pins exactness at ~30x
    the fixture event count and the one-shuffle shape: a single
    entity-keyed Exchange feeds the running window — no self-join, no
    global sort."""
    from conftest import explain_simple

    from etl_finance_spark.operators.windows import fill_forward

    base = spark.range(1_000_000).select(
        (F.col("id") % 1_000).alias("entity"),
        (F.col("id") / 1_000).cast("long").alias("seq"),
    )
    obs = base.withColumn("v", F.when(F.col("seq") % 5 == 0, F.col("seq")))
    filled = obs.select(
        "entity", "seq",
        fill_forward(F.col("v"), "entity", ["seq"]).alias("locf"),
    )
    plan = explain_simple(spark, filled)
    assert "hashpartitioning(entity" in plan
    assert plan.count("Exchange") == 1
    expected = F.floor(F.col("seq") / 5) * 5
    assert filled.filter(
        F.col("locf").isNull() | (F.col("locf") != expected)
    ).count() == 0


def test_sessionize_gaps_closed_form_at_scale(spark):
    """Gaps-and-islands sessionization on 1M planted events over 1000
    entities: ticks land 60s apart, plus an extra 3600s jump at every
    100th tick — so each entity has EXACTLY 10 sessions of EXACTLY 100
    events (gap 3660s > the 1800s threshold only at the planted
    boundaries). Asserts the full closed-form session structure
    distributed (no collect of the 1M rows) and the one-exchange claim:
    both windows share a single hashpartitioning(entity) shuffle."""
    from conftest import explain_simple

    from etl_finance_spark.operators.windows import sessionize_gaps

    base = spark.range(1_000_000).select(
        (F.col("id") % 1_000).alias("entity"),
        (F.col("id") / 1_000).cast("long").alias("seq"),
        F.col("id").alias("rid"),
    )
    ev = base.withColumn(
        "sec",
        F.col("seq") * 60 + (F.col("seq") / 100).cast("long") * 3600,
    )
    numbered = sessionize_gaps(ev, "entity", "sec", "rid", 1800)
    plan = explain_simple(spark, numbered)
    assert plan.count("hashpartitioning(entity") == 1
    assert plan.count("Exchange") == 1
    sessions = numbered.groupBy("entity", "session_id").agg(
        F.count("*").alias("n"))
    bad = sessions.filter(F.col("n") != 100).count()
    assert bad == 0, bad
    assert sessions.count() == 10_000  # 1000 entities x 10 sessions
    assert numbered.agg(F.max("session_id")).collect()[0][0] == 10


def test_range_join_bucket_cover_closed_form_at_scale(spark):
    """Bucketed interval join on 1M planted events (1000 users x 1000
    ticks, 600s apart): every event's follower count within 3600s is
    closed-form min(6, 999 - tick) — the +3600s tick is INCLUDED,
    pinning the <= boundary of the bucket cover. The (key, bucket)
    equi-join must carry the plan (SortMergeJoin on both keys), which
    is the whole point: candidates per user-hour, not per user-history
    squared."""
    from conftest import explain_simple

    from etl_finance_spark.operators.joins import range_join_following

    ev = spark.range(1_000_000).select(
        F.col("id").alias("rid"),
        (F.col("id") % 1_000).alias("uid"),
        F.timestamp_seconds(
            (F.col("id") % 1_000) * 7919
            + (F.col("id") / 1_000).cast("long") * 600
        ).alias("ts"),
    )
    out = range_join_following(ev, "uid", "ts", "rid", 3600)
    plan = explain_simple(spark, out)
    # the bucket must be an equi-key of the join (the strategy —
    # broadcast vs sort-merge — is AQE's size-based choice, not ours)
    import re

    assert re.search(r"Join \[uid#\d+L?, __bucket#\d+L?\]", plan), plan
    # rid encodes the tick: tick = floor(rid / 1000)
    expected = F.least(F.lit(6), F.lit(999) - F.floor(F.col("rid") / 1000))
    assert out.count() == 999_000  # the last tick per user has no follower
    assert out.filter(F.col("n_following") != expected).count() == 0


def test_range_join_validates_bound_and_survives_column_named_b(spark):
    """ADVICE r4: bound_s=0 used to surface as a runtime DIVIDE_BY_ZERO
    deep in the bucket math under ANSI mode — it must be a clear
    ValueError at call time instead. And the internal bucket column is
    now collision-proof (__bucket, mirroring __zkey/__salt): a caller
    whose frame already carries a column named `b` must not hit an
    ambiguous-reference failure."""
    import pytest

    from etl_finance_spark.operators.joins import range_join_following

    ev = spark.createDataFrame(
        [(1, 10, "2024-01-01 00:00:00", "x"),
         (2, 10, "2024-01-01 00:30:00", "y")],
        "rid long, b long, ts_s string, extra string",
    ).select("rid", "b", F.col("ts_s").cast("timestamp_ntz").alias("ts"))

    with pytest.raises(ValueError, match="bound_s"):
        range_join_following(ev, "b", "ts", "rid", 0)
    with pytest.raises(ValueError, match="bound_s"):
        range_join_following(ev, "b", "ts", "rid", -5)

    # key column literally named `b` + 30-minute gap within a 1h bound
    got = range_join_following(ev, "b", "ts", "rid", 3600).collect()
    assert [(r["rid"], r["n_following"]) for r in got] == [(1, 1)]


def test_pagerank_uniform_fixed_point_on_regular_graph(spark):
    """A 100k-node cycle (2-regular after symmetrization) has the
    closed-form PageRank fixed point 1/n at EVERY node: teleport
    (1-d)/n plus d times two half-contributions (1/n)/2 is 1/n again.
    Running the production power iteration and asserting every rounded
    rank equals round(1/n, 9) exercises the full iterative discipline
    (edge-weight degree fold, teleport base, per-pass lineage cuts) on
    a graph ~40x the fixture co-purchase graph, with an analytic
    oracle instead of a driver-side reference."""
    from etl_finance_spark.operators.graphs import pagerank

    n = 100_000
    fwd = spark.range(n).select(
        F.col("id").alias("src"),
        F.pmod(F.col("id") + 1, F.lit(n)).alias("dst"),
    )
    sym = fwd.union(fwd.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
    pr = pagerank(sym, 0.85, 5).select(F.round("pr", 9).alias("r"))
    assert pr.count() == n
    vals = [row.r for row in pr.distinct().collect()]
    assert vals == [round(1.0 / n, 9)], vals


def test_salted_join_spreads_pathological_key(spark):
    """1M-row big side where ONE key holds 50% of all rows — the
    profile where an unsalted join floods a single reducer. The
    content-hash salt must spread the hot key's rows near-uniformly
    over the salt sub-keys (no sub-bucket more than 30% above the
    uniform share), and the salted join's result must match the plain
    join exactly at this scale."""
    from etl_finance_spark.operators.scale import salted_join

    n, hot_share, n_keys, n_salt = 1_000_000, 0.5, 10_000, 16
    hot_rows = int(n * hot_share)
    big = spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") < hot_rows, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)) + 1)
        .alias("k"),
    )
    small = spark.range(n_keys + 1).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))

    # load spreading: reconstruct the salt the operator derives and
    # check the hot key's sub-bucket sizes
    salted = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64("row_id", "k"), F.lit(n_salt)).cast("int"))
    sizes = [r["c"] for r in salted.filter(F.col("k") == 0)
             .groupBy("__salt").agg(F.count("*").alias("c")).collect()]
    assert len(sizes) == n_salt
    assert max(sizes) < (hot_rows / n_salt) * 1.3, max(sizes)

    # result parity at scale (counts + value checksum, not row collect)
    plain = big.join(small, "k")
    salt = salted_join(big, small, "k", salt=n_salt)
    agg = lambda df: df.agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"),
        F.sum("row_id").alias("sr")).collect()[0]
    assert agg(plain) == agg(salt)


def test_frequent_items_closed_form_at_1m_rows(spark):
    """Heavy hitters on 1M planted rows: 100k-distinct uniform
    background (each value ~10x) + 3 hitters at 50k/30k/20k copies,
    interleaved so every partition sees every hitter. Closed form:
    each hitter's true count dwarfs Σ slack, so all three MUST be
    candidates with the bound sandwich holding; and the shuffle stays
    (k+1)·partitions rows by construction (pinned on the partials
    frame, the thing that makes this survive a 100 TB vocabulary)."""
    from etl_finance_spark.operators.heavyhitters import (
        frequent_items, topk_partials,
    )

    hitters = {"h0": 50_000, "h1": 30_000, "h2": 20_000}
    n_bg = 1_000_000 - sum(hitters.values())
    bg = spark.range(n_bg).select(
        F.concat(F.lit("bg-"), (F.col("id") % 100_000)).alias("v")
    )
    planted = spark.range(sum(hitters.values())).select(
        F.when(F.col("id") % 10 < 5, "h0")
        .when(F.col("id") % 10 < 8, "h1")
        .otherwise("h2").alias("v")
    )
    df = bg.unionAll(planted).repartition(32)
    k = 40
    parts = topk_partials(df, "v", k)
    n_parts = df.rdd.getNumPartitions()
    assert parts.count() <= (k + 1) * n_parts  # bounded exchange
    got = {r.item: (r.lower, r.upper)
           for r in frequent_items(df, "v", k).collect()}
    slack_total = sum(
        r.slack for r in parts.filter(F.col("item").isNull()).collect()
    )
    for h, f in hitters.items():
        assert h in got, (h, slack_total)
        lo, hi = got[h]
        assert lo <= f <= hi and hi - lo <= slack_total, (h, lo, f, hi)
        assert f > slack_total  # the premise that guarantees candidacy


# ---------------------------------------------------------------------------
# Corpus-assembly alignment-seam probe (VERDICT r12 item 7): span_dedup
# and pack_contexts at 50k docs. The sf0.1 bench exercises both on 3k
# fixture docs where a seam bug (an off-by-one in the aligned segment
# cut, a prefix-sum drift across shuffle partitions) can hide inside
# hash-match noise of a single layout; this corpus PLANTS the seams —
# boilerplate at aligned vs straddling offsets, variable doc lengths
# straddling chunk boundaries — and pins the closed-form answer.
# scaleprobe tier: heavy (50k docs), run via `pytest -m scaleprobe`.
# ---------------------------------------------------------------------------

SEAM_N = 50_000


@pytest.fixture(scope="module")
def seam_corpus(spark):
    """50k docs, each = a corpus-wide 2*SEG_K-token boilerplate banner
    plus a per-doc-unique tail of 10..32 tokens. Even doc_ids carry the
    banner at offset 0 (segment-ALIGNED: it fills aligned segments 0
    and 1 exactly); odd doc_ids prepend 2 unique tokens first
    (STRADDLING: the banner crosses segment boundaries, so only its
    interior aligned 8-token run b6..b13 is corpus-common — the
    straddled halves mix with unique tokens and must survive). The
    closed-form expectation (expected_clean, n_removed = 2 aligned / 1
    straddling) is built alongside the text, token by token."""
    from etl_finance_spark.llm.corpus import SEG_K

    df = spark.range(SEAM_N).select(F.col("id").alias("doc_id"))
    d = F.col("doc_id").cast("string")
    boiler = F.transform(
        F.sequence(F.lit(0), F.lit(2 * SEG_K - 1)),
        lambda i: F.concat(F.lit("b"), i.cast("string")),
    )
    tail_len = (F.col("doc_id") % 23 + 10).cast("int")
    tail = F.transform(
        F.sequence(F.lit(0), tail_len - 1),
        lambda i: F.concat(F.lit("t"), d, F.lit("x"), i.cast("string")),
    )
    prefix = F.transform(
        F.sequence(F.lit(0), F.lit(1)),
        lambda i: F.concat(F.lit("u"), d, F.lit("x"), i.cast("string")),
    )
    aligned = F.col("doc_id") % 2 == 0
    toks = F.when(aligned, F.concat(boiler, tail)).otherwise(
        F.concat(prefix, boiler, tail)
    )
    # aligned docs lose the two pure-boiler segments; straddling docs
    # lose only the interior run b[SEG_K-2 .. 2*SEG_K-3] (b6..b13): the
    # front 6 and back 2 banner tokens ride in unique-mixed segments
    clean = F.when(aligned, tail).otherwise(
        F.concat(
            prefix,
            F.slice(boiler, 1, SEG_K - 2),
            F.slice(boiler, 2 * SEG_K - 1, 2),
            tail,
        )
    )
    corpus = df.select(
        "doc_id",
        F.array_join(toks, " ").alias("text"),
        F.array_join(clean, " ").alias("expected_clean"),
    ).persist()
    corpus.count()
    yield corpus
    corpus.unpersist()


@pytest.mark.scaleprobe
def test_span_dedup_alignment_seams_at_scale(spark, seam_corpus):
    """span_dedup at 50k docs with planted seams: every aligned banner
    loses exactly its 2 pure segments, every straddling banner exactly
    its 1 interior aligned run, and reassembly restores the surviving
    tokens in original order — the closed form, violated by zero docs."""
    from etl_finance_spark.llm.corpus import span_dedup

    out = span_dedup(seam_corpus)
    joined = out.join(
        seam_corpus.select("doc_id", "expected_clean"), "doc_id"
    )
    expect_removed = F.when(F.col("doc_id") % 2 == 0, 2).otherwise(1)
    n_bad = joined.filter(
        (F.col("clean_text") != F.col("expected_clean"))
        | (F.col("n_removed") != expect_removed)
    ).count()
    assert n_bad == 0, f"{n_bad} docs violate the seam closed form"
    # inner semantics: no doc is 100% boilerplate here, so none drop
    assert out.count() == SEAM_N


@pytest.mark.scaleprobe
def test_pack_contexts_offsets_consistent_at_scale(spark, seam_corpus):
    """pack_contexts at 50k variable-length docs: the per-shard prefix
    sum must be seamless across every adjacent doc pair (off[d] =
    off[prev] + n_tokens[prev], first off = 0 — the property a
    partition-boundary drift in the running sum would break), the
    chunk decomposition must reconstruct the offset exactly
    (chunk_id*CTX_LEN + chunk_pos == off, 0 <= chunk_pos < CTX_LEN),
    and each shard's final extent must equal its token total (no gaps,
    no overlaps). The corpus is sized so docs genuinely straddle chunk
    boundaries — the probe asserts straddlers exist rather than
    assuming them."""
    from pyspark.sql.window import Window

    from etl_finance_spark.llm.corpus import (
        CTX_LEN, N_SHARDS, pack_contexts,
    )

    packed = pack_contexts(seam_corpus).persist()
    try:
        w = Window.partitionBy("shard").orderBy("doc_id")
        seam = packed.select(
            "off", "n_tokens",
            F.lag("off").over(w).alias("p_off"),
            F.lag("n_tokens").over(w).alias("p_n"),
        )
        bad_prefix = seam.filter(
            F.when(F.col("p_off").isNull(), F.col("off") != 0).otherwise(
                F.col("off") != F.col("p_off") + F.col("p_n")
            )
        ).count()
        assert bad_prefix == 0, f"{bad_prefix} prefix-sum seam violations"
        bad_chunk = packed.filter(
            (F.col("chunk_id") * CTX_LEN + F.col("chunk_pos")
             != F.col("off"))
            | (F.col("chunk_pos") < 0)
            | (F.col("chunk_pos") >= CTX_LEN)
        ).count()
        assert bad_chunk == 0, f"{bad_chunk} chunk decomposition violations"
        shards = packed.groupBy("shard").agg(
            F.max(F.col("off") + F.col("n_tokens")).alias("end"),
            F.sum("n_tokens").alias("tot"),
        )
        assert shards.count() == N_SHARDS
        assert shards.filter(F.col("end") != F.col("tot")).count() == 0
        n_straddle = packed.filter(
            F.col("chunk_pos") + F.col("n_tokens") > CTX_LEN
        ).count()
        assert n_straddle > 0, "corpus produced no chunk-boundary straddlers"
    finally:
        packed.unpersist()
