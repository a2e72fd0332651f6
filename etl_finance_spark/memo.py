"""Session-scoped DataFrame memos.

Several families amortize a deterministic shared build across their
declared queries — the co-purchase edge rollup (plans/graph.py), the
IVF quantizer model and the normalized embedding corpus
(llm/similarity.py). Each is what a real warehouse/vector store
materializes ONCE and serves to every consumer; the memo is that seam.

Entries key on (applicationId, sf_dir): a new session (new fixture
state) never sees a stale frame, and entries from stopped sessions are
evicted on access (test suites start/stop many sessions; a dead
session's DataFrame is unusable and would pin driver memory for the
life of the process). Values are persist()-ed or localCheckpoint-ed
frames, so the storage held is evictable/spillable cache, never pinned
heap.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def session_memo(memo: dict[tuple[str, str], DataFrame],
                 spark: SparkSession, sf_dir: str,
                 build: Callable[[], DataFrame]) -> DataFrame:
    """Return memo[(appId, sf_dir)], building (and caching) on miss;
    drops entries belonging to other (dead) applications first."""
    app_id = spark.sparkContext.applicationId
    for k in [k for k in memo if k[0] != app_id]:
        del memo[k]
    key = (app_id, sf_dir)
    df = memo.get(key)
    if df is None:
        df = build()
        memo[key] = df
    return df
