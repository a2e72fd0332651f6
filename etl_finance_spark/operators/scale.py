"""Scale-path join strategies (SURVEY.md §4 100 TB notes).

Not declared queries — these are the library operators a 100 TB
deployment composes with everything else, each with a plan-asserting
test (tests/test_scale.py):

- **Bucketed co-located join**: both fact tables written bucketBy the
  join key → the sort-merge join reads bucket-aligned files and the
  per-join shuffle disappears entirely (the dominant cost of fact-fact
  joins at scale, amortized into the write).
- **Salted skew join**: a hot key floods one reducer; salting fans the
  big side across `salt` sub-keys and replicates the small side per
  sub-key. AQE's skew-join split (enabled in session.py) handles
  moderate skew automatically; explicit salting is for the pathological
  key that exceeds a single executor.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, name: str, keys: Sequence[str],
                   n_buckets: int = 8) -> None:
    """Persist as a managed table bucketed (and sorted) by the join key.
    Readers joining two tables bucketed identically skip the shuffle
    AND the sort."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(name)
    )


_SALTABLE_HOW = frozenset({"inner", "left", "left_outer", "leftouter",
                           "left_semi", "leftsemi"})


def salted_join(big: DataFrame, small: DataFrame,
                key: str | Sequence[str],
                *, salt: int = 16, how: str = "inner",
                salt_on: Sequence[str] | None = None) -> DataFrame:
    """Equi-join with the big side salted across ``salt`` sub-keys.

    The big side's salt is a hash of real row content (``salt_on``
    columns, default: every big-side column), so it is stable across
    task retries AND re-plans — monotonically_increasing_id is only
    stable within one partition layout, which AQE is free to change
    (VERDICT.md round-1 finding #5). Fully duplicate rows share a salt;
    that is acceptable because salt only spreads load, never affects
    join results. The small side replicates once per salt value and the
    join key becomes (*keys, salt): the hot key's rows spread over
    ``salt`` reducers. ``key`` accepts one name or a sequence (e.g. the
    LSH band join salts on top of (band_idx, band_bits)).

    This is also the one home of the LOW-CARDINALITY-KEY salting the
    similarity ladder uses (cell- and band-keyed candidate joins,
    llm/similarity.py): when a join key has only k distinct values, the
    shuffle has a k-task parallelism ceiling with the largest key as
    straggler — salting by a hash of the big side's id raises it
    salt-fold while every pair still meets exactly once.

    Only ``inner``/``left``/``left_semi`` are supported: for right or
    full outer joins, small-side keys with no big-side match would
    surface once per salt replica (ADVICE round-1).
    """
    if how not in _SALTABLE_HOW:
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r}: "
            "right/full-outer would emit unmatched small-side rows once "
            "per salt replica"
        )
    keys = [key] if isinstance(key, str) else list(key)
    hash_cols = list(salt_on) if salt_on is not None else list(big.columns)
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in hash_cols]), F.lit(salt)).cast(
            "int"
        ),
    )
    salts = F.array(*[F.lit(i) for i in range(salt)])
    replicated_small = small.withColumn(
        "__salt", F.explode(salts)
    )
    out = salted_big.join(replicated_small, [*keys, "__salt"], how)
    return out.drop("__salt")
