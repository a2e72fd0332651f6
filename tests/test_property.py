"""Hypothesis property tests (SURVEY.md §5 layer 3): algebraic pairs
that must agree — LSH vs exact Jaccard, session windows vs a Python
gaps-and-islands reference (including the gap == threshold boundary),
upsert idempotency. Few examples, large strategy per example (each
example costs Spark jobs)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampNTZType,
)

from etl_finance_spark.llm.dedup import exact_jaccard_pairs, minhash_lsh_pairs
from etl_finance_spark.operators.core import upsert_new_rows
from etl_finance_spark.streaming.windows import session_counts

_SPARK = None


def _get_spark():
    global _SPARK
    if _SPARK is None:
        from etl_finance_spark.session import get_spark

        _SPARK = get_spark("property", cpus=8, shuffle_partitions=8)
        _SPARK.sparkContext.setLogLevel("ERROR")
    return _SPARK


VOCAB = [f"w{i}" for i in range(12)]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=10),
    min_size=2,
    max_size=12,
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs_strategy)
def test_lsh_pairs_subset_of_exact(token_lists):
    spark = _get_spark()
    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
        StructType([StructField("doc_id", LongType()),
                    StructField("text", StringType())]),
    )
    tau = 0.6
    exact = {(r.d1, r.d2) for r in exact_jaccard_pairs(docs, tau).collect()}
    lsh = {(r.d1, r.d2) for r in minhash_lsh_pairs(docs, tau).collect()}
    # verification step guarantees no false positives, any corpus
    assert lsh <= exact


# timestamps on a 1-minute grid around the 30-minute session gap so the
# gap == threshold boundary is exercised often
ts_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),          # user_id
        st.integers(min_value=0, max_value=240),        # minutes offset
    ),
    min_size=1,
    max_size=30,
)


def _sessions_reference(rows, gap_minutes=30):
    """Python gaps-and-islands: new session when diff > gap (Spark
    merges an event at exactly last+gap — found by hypothesis)."""
    out = {}
    by_user = {}
    for uid, m in rows:
        by_user.setdefault(uid, []).append(m)
    for uid, ms in by_user.items():
        ms.sort()
        start = ms[0]
        count = 0
        prev = None
        for m in ms:
            if prev is not None and m - prev > gap_minutes:
                out[(uid, start)] = count
                start, count = m, 0
            count += 1
            prev = m
        out[(uid, start)] = count
    return out


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ts_strategy)
def test_session_window_matches_gaps_and_islands(rows):
    spark = _get_spark()
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(uid, base + dt.timedelta(minutes=m)) for uid, m in rows],
        StructType([StructField("user_id", LongType()),
                    StructField("ts", TimestampNTZType())]),
    )
    got = {
        (r.user_id, r.session_start): r.n
        for r in session_counts(df).collect()
    }
    base_epoch = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    want = {
        (uid, base_epoch + start_min * 60): n
        for (uid, start_min), n in _sessions_reference(rows).items()
    }
    assert got == want


keyed_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=8), st.text(max_size=4)),
    min_size=0,
    max_size=20,
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(keyed_rows, keyed_rows)
def test_upsert_idempotent_and_key_unique(incoming_rows, target_rows):
    spark = _get_spark()
    schema = StructType([StructField("k", LongType()),
                         StructField("v", StringType())])
    incoming = spark.createDataFrame(incoming_rows, schema)
    target = spark.createDataFrame(target_rows, schema)
    fresh = upsert_new_rows(incoming, target, ["k"])
    fresh_keys = [r.k for r in fresh.select("k").collect()]
    target_keys = {k for k, _ in target_rows}
    # no duplicates within the fresh batch, no overlap with the target
    assert len(fresh_keys) == len(set(fresh_keys))
    assert not (set(fresh_keys) & target_keys)
    # union covers exactly the incoming-minus-target key set
    assert set(fresh_keys) == {k for k, _ in incoming_rows} - target_keys


ids_strategy = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),
              st.integers(min_value=0, max_value=200)),
    min_size=1, max_size=60,
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ids_strategy)
def test_bitmap_distinct_equals_exact(pairs):
    """Bitmap bucket/position/construct/count must equal the exact
    distinct count for ARBITRARY grouped key sets — including ids that
    straddle bucket boundaries and groups with one element."""
    spark = _get_spark()
    df = spark.createDataFrame(
        pairs, StructType([StructField("g", StringType()),
                           StructField("k", LongType())]))
    got = {
        r.g: r.nd
        for r in (
            df.groupBy("g", F.bitmap_bucket_number("k").alias("bkt"))
            .agg(F.bitmap_construct_agg(
                F.bitmap_bit_position("k")).alias("bm"))
            .groupBy("g")
            .agg(F.sum(F.bitmap_count("bm")).alias("nd"))
            .collect()
        )
    }
    want = {}
    for g, k in pairs:
        want.setdefault(g, set()).add(k)
    assert got == {g: len(s) for g, s in want.items()}


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ids_strategy)
def test_mode_deterministic_under_repartition(pairs):
    """The max-of-struct mode (q_mode_by_group's shape) must return
    the identical winner whatever the physical partitioning — the
    property the built-in mode() does NOT guarantee on ties."""
    spark = _get_spark()
    df = spark.createDataFrame(
        pairs, StructType([StructField("g", StringType()),
                           StructField("k", LongType())]))

    def run(frame):
        counts = frame.groupBy("g", "k").agg(F.count("*").alias("n"))
        return {
            r.g: (r.top.n, r.top.k)
            for r in counts.groupBy("g")
            .agg(F.max(F.struct("n", "k")).alias("top")).collect()
        }

    assert run(df) == run(df.repartition(7))


# --- asof_backward (operators/joins.py) vs brute force ---------------------

asof_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),   # entity
        st.integers(min_value=0, max_value=20),  # ts (int order key)
        st.booleans(),                           # True = probe, False = quote
    ),
    min_size=1, max_size=25,
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(asof_strategy)
def test_asof_backward_matches_bruteforce(rows):
    """The union-trick as-of join must agree with the obvious O(n^2)
    reference, including its tie rules: a quote at the probe's exact ts
    counts, and among same-ts quotes the highest id wins. Payload
    columns may be NULL — the probe must still get the WHOLE payload of
    the single most recent quote (a NULL field stays NULL, never
    stitched from an older quote's value: no torn rows)."""
    from etl_finance_spark.operators.joins import asof_backward

    from pyspark.sql.types import DoubleType

    spark = _get_spark()
    quotes = [(e, ts, i, None if i % 3 == 0 else float(i), float(2 * i))
              for i, (e, ts, p) in enumerate(rows) if not p]
    probes = [(e, ts, i) for i, (e, ts, p) in enumerate(rows) if p]
    schema_q = StructType([
        StructField("ent", LongType()), StructField("ts", LongType()),
        StructField("event_id", LongType()),
        StructField("qv", DoubleType()), StructField("qw", DoubleType()),
    ])
    schema_p = StructType([
        StructField("ent", LongType()), StructField("ts", LongType()),
        StructField("event_id", LongType()),
    ])
    qdf = spark.createDataFrame(quotes, schema_q)
    pdf = spark.createDataFrame(probes, schema_p)
    got = {
        r.event_id: (r.qv, r.qw)
        for r in asof_backward(pdf, qdf, ["ent"], "ts", "event_id",
                               ["qv", "qw"]).collect()
    }
    want = {}
    for e, ts, i in probes:
        elig = [(qts, qi, qv, qw) for qe, qts, qi, qv, qw in quotes
                if qe == e and qts <= ts]
        if elig:
            _, _, qv, qw = max(elig, key=lambda t: t[:2])
            want[i] = (qv, qw)
        else:
            want[i] = (None, None)
    assert got == want


# --- range_join_following (operators/joins.py) vs brute force --------------

range_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),   # key
        st.integers(min_value=0, max_value=20),  # ts seconds
    ),
    min_size=1, max_size=25,
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(range_strategy)
def test_range_join_following_matches_bruteforce(rows):
    """The bucketed interval join must agree with the obvious all-pairs
    reference at every edge the bucket cover touches: same-timestamp
    rows (strictly-after excludes them), gaps of exactly bound_s
    (included — the <= boundary), and pairs whose hour-bucket distance
    is 0 vs 1 (the two replicas). Rows with no follower emit nothing
    (inner-join semantics)."""
    from etl_finance_spark.operators.joins import range_join_following

    spark = _get_spark()
    data = [(k, ts, i) for i, (k, ts) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, sec long, rid long").select(
        "k", "rid", F.timestamp_seconds("sec").alias("ts")
    )
    got = {r.rid: r.n_following
           for r in range_join_following(df, "k", "ts", "rid", 5).collect()}
    want = {}
    for k, ts, i in data:
        n = sum(1 for k2, ts2, j in data
                if k2 == k and j != i and ts < ts2 <= ts + 5)
        if n:
            want[i] = n
    assert got == want


# --- fill_forward (operators/windows.py) vs Python LOCF --------------------

locf_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),            # entity
        st.one_of(st.none(), st.integers(0, 9)),          # value or null
    ),
    min_size=1, max_size=30,
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(locf_strategy)
def test_fill_forward_matches_locf_reference(rows):
    from etl_finance_spark.operators.windows import fill_forward

    spark = _get_spark()
    data = [(e, i, None if v is None else float(v))
            for i, (e, v) in enumerate(rows)]
    from pyspark.sql.types import DoubleType

    df = spark.createDataFrame(data, StructType([
        StructField("ent", LongType()), StructField("seq", LongType()),
        StructField("v", DoubleType()),
    ]))
    got = {
        r.seq: r.f
        for r in df.select(
            "seq", fill_forward(F.col("v"), "ent", ["seq"]).alias("f")
        ).collect()
    }
    last = {}
    want = {}
    for e, i, v in data:
        if v is not None:
            last[e] = v
        want[i] = last.get(e)
    assert got == want


# --- interpolate_daily (operators/windows.py) vs Python reference ----------

interp_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2),    # entity
        st.integers(min_value=0, max_value=12),   # day offset
        st.integers(min_value=-5, max_value=5),   # value
    ),
    min_size=1, max_size=15,
    unique_by=lambda t: (t[0], t[1]),
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(interp_strategy)
def test_interpolate_daily_matches_reference(rows):
    """Gap days fill linearly between bracketing observations; boundary
    gaps (none exist by construction: the spine spans observed min..max,
    whose endpoints are observed) and observed days pass through."""
    from etl_finance_spark.operators.windows import interpolate_daily

    spark = _get_spark()
    base = dt.date(2024, 1, 1)
    from pyspark.sql.types import DateType, DoubleType

    daily = spark.createDataFrame(
        [(e, base + dt.timedelta(days=d), float(v)) for e, d, v in rows],
        StructType([StructField("ent", LongType()),
                    StructField("day", DateType()),
                    StructField("v", DoubleType())]),
    )
    got = {
        (r.ent, r.day): r.v_interp
        for r in interpolate_daily(daily, "ent", "day", "v").collect()
    }
    by_ent = {}
    for e, d, v in rows:
        by_ent.setdefault(e, {})[d] = float(v)
    want = {}
    for e, obs in by_ent.items():
        lo, hi = min(obs), max(obs)
        for d in range(lo, hi + 1):
            if d in obs:
                want[(e, base + dt.timedelta(days=d))] = obs[d]
            else:
                p = max(k for k in obs if k < d)
                n = min(k for k in obs if k > d)
                want[(e, base + dt.timedelta(days=d))] = (
                    obs[p] + (obs[n] - obs[p]) * (d - p) / (n - p)
                )
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) <= 1e-6, (k, got[k], want[k])


# --- snapshot_diff / snapshot_apply (operators/cdc.py) round trip ----------

_snap_val = st.one_of(st.none(), st.integers(0, 5))
snap_strategy = st.tuples(
    st.dictionaries(st.integers(0, 15), _snap_val, max_size=12),
    st.dictionaries(st.integers(0, 15), _snap_val, max_size=12),
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(snap_strategy)
def test_snapshot_diff_apply_round_trip(snaps):
    """apply(old, diff(old, new)) == new for arbitrary keyed snapshots
    (values may be NULL — a change to or from NULL is a real change;
    the operator's comparison must be null-safe), and the diff contains
    exactly the keys that differ."""
    from pyspark.sql.types import DoubleType

    from etl_finance_spark.operators.cdc import snapshot_apply, snapshot_diff

    spark = _get_spark()
    old_d, new_d = snaps
    as_f = lambda v: None if v is None else float(v)  # noqa: E731
    schema = StructType([StructField("k", LongType()),
                         StructField("v", DoubleType())])
    old = spark.createDataFrame(
        [(k, as_f(v)) for k, v in old_d.items()], schema)
    new = spark.createDataFrame(
        [(k, as_f(v)) for k, v in new_d.items()], schema)
    diff = snapshot_diff(old, new, "k", "v").persist()
    # Python's != is already null-safe in the SQL sense here: None
    # stands for NULL, None != None is False (unchanged), None != 3
    # is True (changed) — exactly IS DISTINCT FROM.
    want_diff = {
        k: ("added" if k not in old_d else
            "removed" if k not in new_d else "changed")
        for k in set(old_d) | set(new_d)
        if k not in old_d or k not in new_d or old_d[k] != new_d[k]
    }
    assert {r.k: r.change_type for r in diff.collect()} == want_diff
    rebuilt = {r.k: r.v for r in snapshot_apply(old, diff, "k", "v").collect()}
    assert rebuilt == {k: as_f(v) for k, v in new_d.items()}


# --- pagerank (operators/graphs.py) vs Python power iteration --------------

graph_strategy = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)).filter(
        lambda t: t[0] != t[1]),
    min_size=1, max_size=12,
    unique_by=lambda t: (min(t), max(t)),
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(graph_strategy)
def test_pagerank_matches_power_iteration(pairs):
    """The distributed PageRank (degree folded into edge weights,
    checkpointed passes) must match a sequential power iteration on
    the same symmetrized graph, iteration for iteration."""
    from etl_finance_spark.operators.graphs import pagerank

    spark = _get_spark()
    damp, iters = 0.85, 3
    sym_pairs = sorted({(min(a, b), max(a, b)) for a, b in pairs})
    sym = [(a, b) for a, b in sym_pairs] + [(b, a) for a, b in sym_pairs]
    df = spark.createDataFrame(sym, StructType([
        StructField("src", LongType()), StructField("dst", LongType())]))
    got = {r.node: r.pr for r in pagerank(df, damp, iters).collect()}
    out = {}
    for a, b in sym:
        out.setdefault(a, []).append(b)
    nodes = sorted(out)
    n = len(nodes)
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for src, dsts in out.items():
            w = pr[src] / len(dsts)
            for d in dsts:
                contrib[d] += w
        pr = {v: (1 - damp) / n + damp * contrib[v] for v in nodes}
    assert set(got) == set(pr)
    for v in pr:
        assert abs(got[v] - pr[v]) <= 1e-9, (v, got[v], pr[v])


edges_strategy = st.sets(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=0,
    max_size=40,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(edges_strategy)
def test_triangle_count_matches_bruteforce(raw_edges):
    """Degree-ordered compact-forward triangle_count equals an
    adjacency-set brute force on arbitrary graphs — including the
    star/hub shapes the degree orientation exists for (a hub's edges
    all point in, so it fans out nothing)."""
    from etl_finance_spark.operators.graphs import triangle_count

    spark = _get_spark()
    canon = sorted({(min(a, b), max(a, b)) for a, b in raw_edges})
    adj: dict[int, set[int]] = {}
    for a, b in canon:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = sum(
        1
        for a, b in canon
        for c in adj[a] & adj[b]
        if b < c  # count each triangle once via its a<b<c labels
    )
    df = spark.createDataFrame(
        canon or [(0, 1)], "p1 long, p2 long"
    )
    if not canon:
        df = df.limit(0)
    got = triangle_count(df).collect()[0]["n_triangles"]
    assert got == want


def test_triangle_count_hub_graph_exact():
    """Deterministic hub case: a 50-spoke star plus a 10-clique hanging
    off two spokes. Star alone has zero triangles; every triangle must
    come from the clique and the two spoke-hub wedges."""
    from etl_finance_spark.operators.graphs import triangle_count

    spark = _get_spark()
    hub = 1000
    edges = [(s, hub) for s in range(50)]                 # star: 0 tris
    clique = list(range(10))
    edges += [(a, b) for i, a in enumerate(clique)
              for b in clique[i + 1:]]                    # C(10,3) tris
    edges += [(0, hub), (1, hub)]                         # dup-safe: set
    canon = sorted({(min(a, b), max(a, b)) for a, b in edges})
    df = spark.createDataFrame(canon, "p1 long, p2 long")
    got = triangle_count(df).collect()[0]["n_triangles"]
    # clique triangles + hub triangles: hub connects to spokes 0..49,
    # clique edges among spokes 0..9 each close a triangle with the hub
    want = 10 * 9 * 8 // 6 + 10 * 9 // 2
    assert got == want


items_strategy = st.lists(
    st.tuples(st.integers(1, 8), st.integers(0, 12)),  # (order, part)
    min_size=0, max_size=60,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(items_strategy, st.integers(1, 3), st.integers(2, 6))
def test_copurchase_edges_match_bruteforce(raw, min_orders, max_basket):
    """plans/graph.edges_from_items equals a Python pair-count brute
    force under arbitrary (order, part) multisets and arbitrary
    threshold/cap settings — including baskets straddling the cap and
    duplicate (order, part) rows collapsing via distinct."""
    from collections import Counter

    from etl_finance_spark.plans.graph import edges_from_items

    spark = _get_spark()
    items = sorted(set(raw))  # the operator contract: already distinct
    baskets: dict[int, set[int]] = {}
    for o, p in items:
        baskets.setdefault(o, set()).add(p)
    want = Counter()
    for o, parts in baskets.items():
        if len(parts) > max_basket:
            continue
        ps = sorted(parts)
        for i, p1 in enumerate(ps):
            for p2 in ps[i + 1:]:
                want[(p1, p2)] += 1
    expected = sorted(
        (p1, p2, n) for (p1, p2), n in want.items() if n >= min_orders
    )
    df = spark.createDataFrame(
        items or [(1, 1)], "l_orderkey long, l_partkey long"
    )
    if not items:
        df = df.limit(0)
    got = sorted(map(tuple, edges_from_items(
        df, min_orders=min_orders, max_basket=max_basket).collect()))
    assert got == expected


# --- incremental rollup maintenance: merge algebra on arbitrary splits ---

rollup_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),          # group key
        st.integers(min_value=-1000, max_value=1000),  # value
        st.booleans(),                              # split side
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rollup_rows)
def test_merge_rollup_equals_direct_on_any_split(rows):
    """merge(state(A), state(B)) == state(A ∪ B) for every split the
    strategy draws — including splits where a key lives entirely on
    one side and all-NULL-free integer measures, so equality is exact
    (operators/incremental.py's contract, fixture-free)."""
    from etl_finance_spark.operators.incremental import (
        merge_states, rollup_state,
    )

    spark = _get_spark()
    df = spark.createDataFrame(
        [(k, v, s) for k, v, s in rows], "k string, v long, s boolean"
    )
    specs = {"tot": ("sum", "v"), "n": ("count", None),
             "lo": ("min", "v"), "hi": ("max", "v")}
    a = rollup_state(df.filter(F.col("s")), ["k"], specs)
    b = rollup_state(df.filter(~F.col("s")), ["k"], specs)
    merged = {
        r.k: (r.tot, r.n, r.lo, r.hi)
        for r in merge_states([a, b], ["k"], specs).collect()
    }
    direct = {
        r.k: (r.tot, r.n, r.lo, r.hi)
        for r in rollup_state(df, ["k"], specs).collect()
    }
    assert merged == direct
