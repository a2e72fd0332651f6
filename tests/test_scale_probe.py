"""Wall-time scale probe for the heaviest declared queries.

The 2x bench envelope is only ever *measured* at one scale factor per
round; a super-linear blowup (candidate fan-out, Lloyd divergence,
basket-squared join fan-out) in a heavy query would be invisible until
the driver scales the data (VERDICT r06 item 5). This module times the
five historically-heaviest queries at sf0.01 and sf0.1 (10x the input
rows) and asserts the growth stays within a generous LINEAR envelope:

    t(sf0.1) <= SLACK * 10 * max(t(sf0.01), FLOOR)

With SLACK=4 and the fixed-overhead FLOOR, honest linear scaling
passes even on a noisy shared host (totals swing +-15%; memory:
bench-vm-variance), while a quadratic regression (~100x growth) fails
by an order of magnitude. This is a REGRESSION TRIPWIRE for
accidentally-quadratic plans, not a performance benchmark — bench.py
and the quiet-host protocol (scripts/bench_quiet.py) own measurement.

Structural scale invariants (candidate fractions, recall floors) live
in test_scale_smoke.py; this file owns the wall-clock dimension.
"""

from __future__ import annotations

import pytest

from etl_finance_spark import registry
from etl_finance_spark.measure import timed_noop_run

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"
SF_RATIO = 10.0  # fixture row-count ratio between the two dirs
SLACK = 4.0      # host noise + sub-linear fixed costs; quadratic = ~100x
FLOOR = 1.0      # sec; fixed overhead floor so tiny-t denominators
                 # (session startup, plan construction) don't dominate

HEAVY = (
    "q_ivfpq_topk",
    "q_ann_ivf_topk",
    "q_dedup_clusters",
    "q_copurchase_pairs",
    "q_percentiles",
    # heaviest events-backed query (r08 detail: 1.73s) — gives the
    # events table a presence on the scale curve now that the sf0.3
    # probe replicates it (VERDICT r08 item 5)
    "q_atr",
    # the two remaining bench heavies (VERDICT r09 item 4): the only
    # top-5 query that was absent from this tier, and the heaviest
    # documents-backed query — gives documents a presence on the curve
    "q_ann_lsh_topk",
    "q_span_dedup",
    # the graph family's tripwire (r11): a threshold or orientation
    # regression in the shared edge build shows up as an edge-set
    # explosion that the triangle 3-way self-join amplifies — the
    # probe's l_partkey offsets keep its graph an honest REP x of the
    # base (see test_scale_probe3.test_replica_fidelity)
    "q_triangle_count",
)


def _timed_run(spark, fn, sf_dir: str) -> float:
    # the shared protocol (noop sink, cuts drained outside the timer)
    # lives in measure.py — one home, no per-harness drift
    return timed_noop_run(spark, fn, sf_dir)


@pytest.mark.scaleprobe
@pytest.mark.parametrize("name", HEAVY)
def test_heavy_query_scales_linearly(spark, name):
    specs = registry.collect()
    fn = specs[name].fn
    # warm both scales once: session-memoized models (IVF quantizer, PQ
    # codebooks) and whole-stage codegen are one-time costs shared by
    # every consumer in a real session, not per-query marginal cost —
    # the probe measures the MARGINAL scaling of the dataflow itself.
    _timed_run(spark, fn, SF_SMALL)
    _timed_run(spark, fn, SF_BIG)
    t_small = _timed_run(spark, fn, SF_SMALL)
    t_big = _timed_run(spark, fn, SF_BIG)
    budget = SLACK * SF_RATIO * max(t_small, FLOOR)
    assert t_big <= budget, (
        f"{name}: t(sf0.1)={t_big:.2f}s vs t(sf0.01)={t_small:.2f}s — "
        f"exceeds the linear envelope {budget:.2f}s; the plan likely "
        f"went super-linear (candidate fan-out / join explosion)"
    )
