"""Third point on the wall-time scale curve (VERDICT r07 item 5).

test_scale_probe.py compares sf0.01 -> sf0.1; this module adds a
synthetic ~sf0.3 (3x the sf0.1 fixture rows, generated once into /tmp)
so the linear envelope has a third point and the candidate-fraction
constants tuned on small fixtures (e.g. the LSH band width, IVF
probe/cell ratios) are measured where they start to matter.

Generation is id-disjoint replication: each copy offsets its key
column far past the original id range, so

- embeddings: 3x corpus, the SAME query set (vec_id < N_QUERY lives in
  copy 0 only) -> candidate work should scale ~linearly with corpus;
- lineitem: l_orderkey offsets keep baskets intact and disjoint across
  copies (no basket merging -> copurchase fan-out stays per-basket
  quadratic but corpus-linear, exactly the property the tripwire pins),
  AND l_partkey offsets keep the co-purchase GRAPH disjoint per copy:
  with merged partkeys every base pair would recur once per copy, so
  the MIN_ORDERS=2 edge threshold would pass for ALL ~1.2M distinct
  pairs instead of ~3.6k real edges (measured at sf0.1) — the triangle
  3-way self-join would then run on a 300x-denser graph at the probe
  point only, the span-dedup threshold flip all over again in the
  opposite direction. Disjoint copies give edges and triangles an
  exact REP x scaling, pinned by test_replica_fidelity below;
- documents: doc_id offsets (q_dedup_clusters self-caps at doc_id<500,
  so it stays flat here by design — trivially inside the envelope),
  PLUS a per-copy text salt (vowel-rotation translate on copies > 0):
  verbatim-copied text would put every SEG_K-word segment in >= REP
  distinct docs, flipping q_span_dedup's boilerplate threshold
  (SEG_MIN_DOCS=2) corpus-wide — the anti join would empty the "kept"
  stage and the per-doc reassembly shuffle would aggregate zero rows
  at the probe point while doing full work at sf0.1, hiding exactly
  the super-linear regressions the third point exists to catch. The
  rotation is a fixed-point-free bijection per copy, so essentially
  every segment stays copy-distinct and the kept/reassembly stages
  carry ~REP x rows; copy 0 is untouched (q_dedup_clusters's
  doc_id<500 world is byte-identical to the fixture);
- events: event_id AND user_id offsets (the finance indicators and the
  sessionize/cohort family key their series on user_id, so disjoint
  users keep per-series work constant and corpus-linear). The events
  replica is read through catalog.table — NOT a raw parquet read — so
  the nanos-vs-micros fixture special case is normalized away at
  generation time: the replica lands as parquet TIMESTAMP(MICROS),
  which catalog.table's dtype branch handles identically to the
  current fixture layout (VERDICT r08 item 5).

The non-events replicas are written through plain Spark reads (same
parquet physical types as a Spark re-write of the fixture).

Envelope: t(probe) <= SLACK * 3 * max(t(sf0.1), FLOOR) — same SLACK
rationale as test_scale_probe.py (honest linear scaling passes on a
2.4x-swing host; a quadratic blowup at 3x = ~9x growth fails).
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from etl_finance_spark import registry

# shared with the two-point probe so the query set and envelope
# constants cannot drift apart between the scale points
from test_scale_probe import FLOOR, HEAVY, SLACK, _timed_run

SF_BASE = "/root/testdata/sf0.1"
PROBE_DIR = "/tmp/spark_graft_probe_sf03"
REP = 3          # replication factor (probe ~ sf0.3)
GEN_VERSION = 5  # bump when the replica TRANSFORM (or its generation-
                 # time guards) changes, not just the base fixture: the
                 # fingerprint hashes only the base table, so replicas
                 # written/validated by an older generator must be
                 # forced to regenerate (v5: cross-copy segment
                 # disjointness guard, ADVICE r11)

# per-copy text-salted columns (see module docstring: span-dedup's
# cross-doc threshold must not see verbatim copies)
TEXT_SALT = {"documents": "text"}

# key columns to offset per replicated table; the offset stride is far
# beyond any fixture id so replicas never collide, merge baskets, or
# merge per-user series
TABLES = {
    "embeddings": (("vec_id", 10_000_000),),
    "documents": (("doc_id", 10_000_000),),
    "lineitem": (("l_orderkey", 100_000_000), ("l_partkey", 10_000_000)),
    "events": (("event_id", 100_000_000), ("user_id", 10_000_000)),
}


def _base_fingerprint(name: str) -> str:
    """Cheap identity of the base fixture table: total bytes + newest
    mtime of its parquet files. The /tmp replicas outlive fixture
    regenerations (the layout has changed once already: events
    ns -> us), and _SUCCESS alone would silently pin a replica of the
    OLD fixture — the envelope would then compare mismatched
    datasets."""
    root = f"{SF_BASE}/{name}.parquet"
    size, mtime = 0, 0
    if os.path.isfile(root):
        # events ships as a single parquet FILE (not a Spark-style
        # directory) — os.walk on a file yields nothing, which would
        # degenerate the fingerprint to a constant "0:0" and silently
        # pin a replica of a regenerated fixture
        st = os.stat(root)
        return f"g{GEN_VERSION}:{st.st_size}:{st.st_mtime_ns}"
    for d, _, files in os.walk(root):
        for f in files:
            st = os.stat(os.path.join(d, f))
            size += st.st_size
            mtime = max(mtime, st.st_mtime_ns)
    return f"g{GEN_VERSION}:{size}:{mtime}"


def _assert_salt_perturbs_every_segment(base, salt_col: str) -> None:
    """The vowel rotation only perturbs vowels: a vowel-free aligned
    SEG_K-word segment would stay verbatim across all copies and flip
    q_span_dedup's boilerplate threshold at the probe point only — the
    exact blind spot the salt exists to close (ADVICE r10 residual).
    Guard at the granularity that matters (segments, cut with the same
    expression as the query) and refuse loudly; runs once per replica
    generation, fingerprint-cached like the replica itself."""
    from etl_finance_spark.llm.corpus import SEG_K

    w = F.split(salt_col, " ")
    segs = base.select(
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0), F.floor((F.size(w) - 1) / SEG_K).cast("int")
                ),
                lambda i: F.array_join(F.slice(w, i * SEG_K + 1, SEG_K), " "),
            )
        ).alias("seg")
    )
    n_blind = segs.filter(~F.col("seg").rlike("[aeiouAEIOU]")).count()
    assert n_blind == 0, (
        f"{n_blind} vowel-free aligned {SEG_K}-word segment(s) in the "
        f"base fixture: the vowel-rotation salt cannot make their "
        f"copies distinct — pick a different per-copy text transform "
        f"(e.g. a per-copy suffix token) before generating the probe"
    )
    # Cross-copy collisions (ADVICE r11): test_replica_fidelity's exact
    # sd_probe == REP * sd_base also needs that no rotated segment from
    # copy i equals a DIFFERENT segment in copy j — such a pair would
    # raise that value's cross-doc count and could flip SEG_MIN_DOCS at
    # the probe point only. Rotations compose (rot_i(s) == rot_j(t)
    # iff s == rot_{(j-i) mod 5}(t)), so every cross-copy pair reduces
    # to a base-vs-rot_d(base) collision for some d in 1..4; an empty
    # intersection for each d makes the per-copy segment value sets
    # pairwise disjoint for ANY REP <= 5, not just the current 3.
    seg_set = segs.distinct()
    for d in range(1, 5):
        rot = ("aeiou"[d:] + "aeiou"[:d] + "AEIOU"[d:] + "AEIOU"[:d])
        rotated = seg_set.select(
            F.translate("seg", "aeiouAEIOU", rot).alias("seg")
        )
        n_coll = seg_set.join(rotated, "seg", "left_semi").count()
        assert n_coll == 0, (
            f"{n_coll} base segment(s) collide with a vowel-rotation-"
            f"{d} image of another base segment: copies {d} apart "
            f"would share verbatim segment values, breaking the exact "
            f"REP x span-dedup scaling test_replica_fidelity pins — "
            f"pick a different per-copy text transform"
        )


def _generate(spark) -> None:
    from etl_finance_spark import catalog

    os.makedirs(PROBE_DIR, exist_ok=True)
    for name, keys in TABLES.items():
        out = f"{PROBE_DIR}/{name}.parquet"
        fp_file = f"{PROBE_DIR}/{name}.fingerprint"
        if os.path.exists(f"{out}/_SUCCESS"):
            try:
                with open(fp_file) as fh:
                    if fh.read() == _base_fingerprint(name):
                        continue  # replica matches the current fixture
            except OSError:
                pass  # no/unreadable fingerprint -> regenerate
        # Re-fingerprint AFTER each write: if the base fixture changed
        # mid-generation the replica is a mix of old and new rows.
        # Bounded retry (ADVICE r09): a torn replica must never be
        # MEASURED this run, not just left unpinned for the next one.
        for _attempt in range(3):
            fp = _base_fingerprint(name)
            if name == "events":
                # through the normalization layer: ts arrives
                # TIMESTAMP_NTZ µs whatever the fixture's physical
                # layout, and the replica is written back as parquet
                # TIMESTAMP(MICROS)
                base = catalog.table(spark, SF_BASE, name)
            else:
                base = spark.read.parquet(f"{SF_BASE}/{name}.parquet")
            if TEXT_SALT.get(name):
                _assert_salt_perturbs_every_segment(base, TEXT_SALT[name])
            parts = []
            for i in range(REP):
                p = base
                for key, stride in keys:
                    p = p.withColumn(key, F.col(key) + F.lit(i * stride))
                salt_col = TEXT_SALT.get(name)
                if salt_col is not None and i > 0:
                    # fixed-point-free vowel rotation, distinct per copy
                    # (rotation i of each case half maps no vowel to
                    # itself for 1 <= i <= 4); copy 0 stays
                    # byte-identical. Both case halves rotate by the
                    # same i (ADVICE r10: lowercase-only left uppercase
                    # vowels verbatim across copies). Only 4 distinct
                    # non-identity rotations exist, so REP > 5 would
                    # reintroduce verbatim text copies (i=5 slices to
                    # the identity; modular reuse collides copies) —
                    # refuse loudly rather than go blind
                    assert 1 <= i <= 4, (
                        f"REP={REP} exceeds the vowel-rotation salt's "
                        f"capacity (max 5 copies); pick a different "
                        f"per-copy text transform before raising REP"
                    )
                    rot = ("aeiou"[i:] + "aeiou"[:i]
                           + "AEIOU"[i:] + "AEIOU"[:i])
                    p = p.withColumn(
                        salt_col, F.translate(salt_col, "aeiouAEIOU", rot)
                    )
                parts.append(p)
            rep = parts[0]
            for p in parts[1:]:
                rep = rep.unionAll(p)
            rep.write.mode("overwrite").parquet(out)
            if _base_fingerprint(name) == fp:
                with open(fp_file, "w") as fh:
                    fh.write(fp)
                break
        else:
            if os.path.exists(fp_file):
                os.remove(fp_file)
            pytest.fail(
                f"{name}: base fixture at {SF_BASE} kept changing during "
                f"replica generation (3 attempts) — refusing to measure "
                f"a torn replica"
            )


@pytest.fixture(scope="module")
def probe_dir(spark):
    _generate(spark)
    return PROBE_DIR


@pytest.mark.scaleprobe
def test_replica_fidelity(spark, probe_dir):
    """The probe must measure the SAME work regime at REP x volume —
    pin the two structures the replication transform exists to
    preserve (each was, or would have been, silently broken once):

    - co-purchase graph: disjoint per copy (l_partkey offsets), so
      thresholded edges and triangles scale exactly REP x. Without the
      offsets every base pair recurs once per copy, the MIN_ORDERS
      threshold passes corpus-wide, and the probe graph is ~300x
      denser than real data;
    - span dedup: per-copy salted text keeps each copy's kept-segment
      set isomorphic to the base (bijective per-copy transform), so
      output rows scale exactly REP x. Verbatim copies would flip
      SEG_MIN_DOCS corpus-wide and empty the kept stage (r10 lesson).
      The exact equality below additionally needs the per-copy segment
      value sets pairwise DISJOINT (a rotated segment colliding with a
      different base segment would raise that value's cross-doc count
      at the probe point only); _assert_salt_perturbs_every_segment
      now verifies this at generation time via the base-vs-rot_d(base)
      reduction (ADVICE r11), so a base-fixture change that introduces
      such a collision fails loudly at generation, not spuriously here.
    """
    from etl_finance_spark.operators.graphs import triangle_count
    from etl_finance_spark.plans.graph import copurchase_edges

    e_base = copurchase_edges(spark, SF_BASE)
    e_probe = copurchase_edges(spark, PROBE_DIR)
    assert e_probe.count() == REP * e_base.count()
    t_base = triangle_count(e_base.select("p1", "p2")).collect()[0][0]
    t_probe = triangle_count(e_probe.select("p1", "p2")).collect()[0][0]
    assert t_probe == REP * t_base

    specs = registry.collect()
    sd_base = specs["q_span_dedup"].fn(spark, SF_BASE).count()
    sd_probe = specs["q_span_dedup"].fn(spark, PROBE_DIR).count()
    assert sd_probe == REP * sd_base


@pytest.mark.scaleprobe
@pytest.mark.parametrize("name", HEAVY)
def test_heavy_query_linear_at_third_point(spark, probe_dir, name):
    specs = registry.collect()
    fn = specs[name].fn
    # warm both scales (session-memoized models + codegen are one-time
    # session costs, not marginal dataflow cost — same rationale as
    # test_scale_probe.py)
    _timed_run(spark, fn, SF_BASE)
    _timed_run(spark, fn, probe_dir)
    t_base = _timed_run(spark, fn, SF_BASE)
    t_probe = _timed_run(spark, fn, probe_dir)
    budget = SLACK * REP * max(t_base, FLOOR)
    assert t_probe <= budget, (
        f"{name}: t(~sf0.3)={t_probe:.2f}s vs t(sf0.1)={t_base:.2f}s — "
        f"exceeds the {REP}x linear envelope {budget:.2f}s; a constant "
        f"tuned on small fixtures (band width, probe fraction) has "
        f"likely gone super-linear"
    )
