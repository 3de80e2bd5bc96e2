"""Skew-safe relational join helpers.

AQE's skew-join splitting handles sort-merge skew at runtime, but it
cannot help when the hot side must HASH-shuffle (a storage-partitioned
plan, a required distribution from a downstream window) or when AQE is
off. ``salted_join`` is the classic manual escape hatch, packaged so
the salting is provably RESULT-IDENTICAL to the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    salt: int,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the LEFT side's hot keys split across ``salt``
    reducers: left rows get a deterministic salt in [0, salt) (a hash
    of the whole row, so one key's rows spread evenly), the right side
    replicates ``salt``-fold via one explode, and the join key becomes
    (on..., salt). Output rows are EXACTLY the plain join's — salting
    only changes the shuffle distribution, never the result (the
    oracle-checked contract).

    Use when one left key owns a task-breaking share of rows
    (skew_profile's report) and the right side is small enough that
    ``salt`` copies are acceptable but too big to broadcast outright —
    the gap where neither BroadcastHashJoin nor a plain shuffle works.
    ``how``: 'inner' or 'left' (right-side multiplicity is preserved
    either way; 'right'/'outer' would need right-row dedup bookkeeping
    and are refused).
    """
    s = int(salt)
    if s < 1:
        raise ValueError("salt must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    missing = [c for c in on if c not in left.columns or c not in right.columns]
    if missing:
        raise ValueError(f"join columns missing from a side: {missing}")
    if "_salt" in left.columns or "_salt" in right.columns:
        raise ValueError("salted_join reserves the column name '_salt'")
    lsalt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(s)
    ).alias("_salt")
    lt = left.select("*", lsalt)
    rt = right.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(s - 1)).cast("array<long>")).alias("_salt")
    )
    return lt.join(rt, [*on, "_salt"], how).drop("_salt")
