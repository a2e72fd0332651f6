"""Stage profile of the IVF-PQ / IVF-ANN pair (VERDICT r08 item 2).

The r07/r08 verdicts carry one open perf item: `q_ivfpq_topk` +
`q_ann_ivf_topk` measure ~12s combined in the frozen detail vs a ≤9s
target, and no evidence exists for WHICH stage owns the cost —
codebook/quantizer training, corpus encode, the salted candidate join,
ADC scoring, or the exact refine. This script produces that breakdown
in ONE bench-faithful session (get_spark config, warmup queries, noop
sink, release_cuts between stages — the exact bench.py harness), so
stage times are comparable to the frozen per-query numbers.

Method: time plan PREFIXES of q_ivfpq_topk to the noop sink with the
session memos warm (models trained once, timed separately), then report
marginal stage cost as consecutive-prefix deltas. Prefixes recompute
their shared upstream (no cross-prefix persists beyond what the real
queries themselves persist), which is exactly how the real query pays
for it. Every prefix runs --reps times; the MEDIAN is reported (this
host swings 2x — memory: bench-vm-variance).

Usage:
    python scripts/profile_ivf.py [--reps 3] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def noop(df) -> None:
    from etl_finance_spark.measure import run_noop

    run_noop(df)  # the shared sink protocol (measure.py)


def timed(fn, reps: int) -> list[float]:
    from etl_finance_spark.lineage import release_cuts

    out = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        out.append(round(time.time() - t0, 3))
        release_cuts()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from etl_finance_spark import registry
    from etl_finance_spark.lineage import release_cuts
    from etl_finance_spark.llm import pq, similarity
    from etl_finance_spark.session import get_spark

    spark = get_spark("profile-ivf")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.collect()

    # bench.py's warmup block: JVM/codegen lanes, not family-specific
    for warm in ("q_scan_parquet", "q_agg_groupby", "q_win_rownum"):
        noop(specs[warm].fn(spark, args.sf))
    release_cuts()

    sf = args.sf
    report: dict[str, object] = {"sf": sf, "reps": args.reps}

    # --- model builds (session-memoized in real runs: paid once) -----
    # construct vs action split: "construct" is the session_memo build
    # call (plan building + Catalyst analysis + the lazy cut's compile
    # round-trip — all driver-side), "action" is the first job.
    t0 = time.time()
    corpus = similarity._corpus_unit_vecs(spark, sf)
    noop(corpus)
    report["corpus_materialize"] = round(time.time() - t0, 3)

    t0 = time.time()
    cent = similarity._corpus_ivf_model(spark, sf)
    t1 = time.time()
    cent.count()
    report["ivf_train"] = {"construct": round(t1 - t0, 3),
                           "action": round(time.time() - t1, 3)}

    t0 = time.time()
    books = pq._corpus_pq_books(spark, sf)
    t1 = time.time()
    books.count()
    report["pq_train"] = {"construct": round(t1 - t0, 3),
                          "action": round(time.time() - t1, 3)}

    # --- q_ivfpq_topk prefixes (models warm) -------------------------
    def norm_corpus():
        emb = pq.with_normalized(similarity._corpus_unit_vecs(spark, sf))
        par = spark.sparkContext.defaultParallelism
        if emb.rdd.getNumPartitions() < par:
            emb = emb.repartition(par, "vec_id")
        return emb

    def p_encode():
        emb = norm_corpus()
        noop(pq.ivfpq_index(emb, cent, books))

    def p_candidates():
        # the exact helpers ivfpq_topk calls (similarity.ivf_candidates
        # / ivf_query_cells) — a refactor of the production candidate
        # stage is automatically profiled, never silently diverged from
        # (ADVICE r09: the old hand-inlined copy drifted once already)
        emb = norm_corpus()
        corpus_idx = pq.ivfpq_index(emb, cent, books)
        queries = emb.filter(F.col("vec_id") < similarity.N_QUERY)
        noop(similarity.ivf_candidates(
            corpus_idx, similarity.ivf_query_cells(queries, cent),
            carry=("codes",)))

    def p_adc_shortlist():
        emb = norm_corpus()
        queries = emb.filter(F.col("vec_id") < similarity.N_QUERY)
        noop(pq.ivfpq_topk(emb, queries, similarity.TOP_K,
                           cent=cent, books=books, refine=1))

    def p_full_ivfpq():
        noop(specs["q_ivfpq_topk"].fn(spark, sf))

    def p_full_ann_ivf():
        noop(specs["q_ann_ivf_topk"].fn(spark, sf))

    def p_ann_candidates():
        emb = similarity._corpus_unit_vecs(spark, sf)
        queries = emb.filter(F.col("vec_id") < similarity.N_QUERY)
        noop(similarity.ivf_candidates(
            similarity.ivf_corpus_cells(emb, cent),
            similarity.ivf_query_cells(queries, cent)))

    stages = {
        "ivfpq.encode_index": p_encode,
        "ivfpq.candidates": p_candidates,
        "ivfpq.adc_shortlist(refine=1)": p_adc_shortlist,
        "ivfpq.full": p_full_ivfpq,
        "ann_ivf.candidates": p_ann_candidates,
        "ann_ivf.full": p_full_ann_ivf,
    }
    for name, fn in stages.items():
        runs = timed(fn, args.reps)
        report[name] = {"median": statistics.median(runs), "runs": runs}

    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
