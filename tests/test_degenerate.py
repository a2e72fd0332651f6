"""Degenerate-input robustness: every declared query on EMPTY tables.

A 100 TB warehouse routinely presents empty slices — a new tenant, a
partition-pruned day with no data, a filter that matches nothing
upstream. An engine operator must return a well-formed (usually empty)
result there, never crash: iterative ops (k-means, PageRank, connected
components) must converge on zero rows, aggregate-derived scalars
(means, percentile cut points, global min/max) arrive as NULL and must
flow through, and result SCHEMAS must not depend on the data (a
schema that changes when a slice is empty breaks every downstream
consumer and union).

This module materializes a zero-row mirror of the fixture tables with
byte-identical parquet physical types (pyarrow ``schema.empty_table``,
so e.g. events.ts keeps its physical timestamp layout and
catalog.table's dtype branch is exercised) and pins, for ALL declared
queries:

  1. analysis: the plan builds and its schema equals the schema the
     same query produces on real (sf0.001) data — no data-dependent
     schemas (pivot-style ops must pass explicit value lists);
  2. execution: the query runs to completion (count() succeeds).

Row counts are NOT asserted — generator-backed queries (month
sequences, the Python data source) legitimately emit rows with no
input.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from etl_finance_spark.catalog import TABLES
from etl_finance_spark.registry import collect

SF_SMOKE = "/root/testdata/sf0.001"

_SPECS = collect()
_NAMES = sorted(_SPECS)


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        schema = pq.read_schema(f"{SF_SMOKE}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", _NAMES)
def test_empty_input_runs_with_stable_schema(spark, empty_sf_dir, name):
    spec = _SPECS[name]
    on_empty = spec.fn(spark, empty_sf_dir)
    on_data = spec.fn(spark, SF_SMOKE)
    assert on_empty.schema == on_data.schema, (
        f"{name}: schema is data-dependent (empty input changed it)"
    )
    on_empty.count()  # must execute, whatever the row count
