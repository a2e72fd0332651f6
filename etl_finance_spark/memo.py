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

Concurrency (rewritten r08): the module lock guards only the DICT
(eviction scan vs insert races, double-delete of a stale key); builds
run OUTSIDE it, serialized per key by an in-flight event. Two threads
missing the SAME key still produce exactly one build — the loser
blocks on the winner's event and returns the winner's frame, which is
exactly the semantics a shared index wants. Builds are normally
construction-only (lazy frames; materialization happens at the
consumer's first action), but nothing guarantees a build stays cheap
— under the old build-under-lock design any slow build stalled every
UNRELATED memo family (co-purchase edges vs IVF models) behind it.
Build failures release the in-flight slot, so a waiter retries as the
new builder rather than caching a broken entry. Builds may NEST (the
IVF model build calls back into the corpus memo): no lock is held
during a build, so the nested call just takes its own turn."""

from __future__ import annotations

import threading
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_LOCK = threading.RLock()
# (id(memo), appId, sf_dir) -> (builder thread id, Event set when that
# build finishes, successfully or not); id(memo) scopes keys to their
# family dict. The thread id exists to turn same-memo same-key
# re-entrancy (a build calling back into session_memo with its OWN
# flight key) into a loud RuntimeError instead of a silent
# self-deadlock on done.wait() (ADVICE r08) — cross-memo nesting, the
# only sanctioned kind, uses a different id(memo) and is unaffected.
_INFLIGHT: dict[tuple[int, str, str],
                tuple[int, threading.Event]] = {}


def session_memo(memo: dict[tuple[str, str], DataFrame],
                 spark: SparkSession, sf_dir: str,
                 build: Callable[[], DataFrame]) -> DataFrame:
    """Return memo[(appId, sf_dir)], building (and caching) on miss;
    drops entries belonging to other (dead) applications first."""
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir)
    flight_key = (id(memo), app_id, sf_dir)
    while True:
        with _LOCK:
            for k in [k for k in list(memo) if k[0] != app_id]:
                memo.pop(k, None)
            df = memo.get(key)
            if df is not None:
                return df
            entry = _INFLIGHT.get(flight_key)
            if entry is None:
                done = threading.Event()
                _INFLIGHT[flight_key] = (
                    threading.get_ident(), done)
                building = True
            else:
                builder_tid, done = entry
                if builder_tid == threading.get_ident():
                    raise RuntimeError(
                        "session_memo re-entered for the same memo "
                        f"and key {key!r} from its own builder thread "
                        "— a same-key nested build would deadlock. "
                        "Nested builds must target a different memo "
                        "family (or a different sf_dir/session)."
                    )
                building = False
        if building:
            try:
                df = build()
                with _LOCK:
                    memo[key] = df
                return df
            finally:
                # success or failure, release the slot and wake
                # waiters; on failure they re-enter the loop and the
                # first one becomes the new builder
                with _LOCK:
                    _INFLIGHT.pop(flight_key, None)
                done.set()
        else:
            done.wait()
