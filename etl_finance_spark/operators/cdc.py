"""Snapshot CDC operators: diff two keyed table versions, apply a
change set (SURVEY.md §2.2 composite analytics; declared as
q_snapshot_diff / q_snapshot_apply in plans/analytics.py).

Algebraic contract, property-tested in tests/test_property.py and
oracle-checked on the fixtures (q_snapshot_apply's oracle IS the
directly-computed new snapshot):

    snapshot_apply(old, snapshot_diff(old, new)) == new

At scale both snapshots are bucketed by the key, making the diff's
full-outer join and the apply's anti-join shuffle-free; values should
be pre-rounded by the caller so the changed-set is float-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame, key: str,
                  val: str) -> DataFrame:
    """Change set between two (key, val) snapshots: one row per key
    that was added, removed, or changed — unchanged keys drop out.
    Output: (key, change_type, old_<val>, new_<val>)."""
    a, b = old.alias("a"), new.alias("b")
    j = a.join(b, F.col(f"a.{key}") == F.col(f"b.{key}"), "full_outer")
    return (
        j.select(
            F.coalesce(F.col(f"a.{key}"), F.col(f"b.{key}")).alias(key),
            F.when(F.col(f"a.{key}").isNull(), "added")
            .when(F.col(f"b.{key}").isNull(), "removed")
            .otherwise("changed")
            .alias("change_type"),
            F.col(f"a.{val}").alias(f"old_{val}"),
            F.col(f"b.{val}").alias(f"new_{val}"),
        )
        .filter(
            F.col("change_type").isin("added", "removed")
            # null-safe: value changes to/from NULL are real changes;
            # plain != evaluates to NULL there and would drop the row,
            # silently breaking the apply∘diff == new round trip
            | ~(F.col(f"old_{val}").eqNullSafe(F.col(f"new_{val}")))
        )
    )


def snapshot_apply(old: DataFrame, diff: DataFrame, key: str,
                   val: str) -> DataFrame:
    """Merge a snapshot_diff change set into the old snapshot:
    removed/changed keys anti-join out, added/changed rows append —
    the standard merge-apply a parquet-based CDC consumer runs per
    batch. Reconstructs the new snapshot exactly."""
    drop_keys = diff.filter(
        F.col("change_type").isin("removed", "changed")
    ).select(key)
    upserts = diff.filter(
        F.col("change_type").isin("added", "changed")
    ).select(key, F.col(f"new_{val}").alias(val))
    return old.join(drop_keys, key, "left_anti").unionByName(upserts)
