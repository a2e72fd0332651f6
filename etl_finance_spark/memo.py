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

Access is serialized by one module lock: concurrent queries on a
shared session (the witnessed warehouse mode) otherwise race the
eviction scan against an insert ("dict changed size during
iteration") or double-delete a stale key. The lock covers the build
too — two threads missing the same key must not both run the
expensive build and double-persist; the loser would leak its cached
frame. Build latency under the lock is usually construction-only, but
the ANN model builders run their small training job eagerly since r08
(the eager final lineage cut that truncates consumer analysis) — a
concurrent thread then blocks until the one shared model exists, which
is exactly the semantics a shared index wants. It is an RLock because
builds NEST: the IVF model
build calls back into the corpus memo (llm/similarity.py), and a
plain Lock would self-deadlock the single calling thread there."""

from __future__ import annotations

import threading
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_LOCK = threading.RLock()


def session_memo(memo: dict[tuple[str, str], DataFrame],
                 spark: SparkSession, sf_dir: str,
                 build: Callable[[], DataFrame]) -> DataFrame:
    """Return memo[(appId, sf_dir)], building (and caching) on miss;
    drops entries belonging to other (dead) applications first."""
    app_id = spark.sparkContext.applicationId
    with _LOCK:
        for k in [k for k in list(memo) if k[0] != app_id]:
            memo.pop(k, None)
        key = (app_id, sf_dir)
        df = memo.get(key)
        if df is None:
            df = build()
            memo[key] = df
        return df
