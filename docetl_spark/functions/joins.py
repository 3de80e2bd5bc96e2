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


def data_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    *,
    compare: list[str] | None = None,
) -> DataFrame:
    """Row-level reconciliation of two versions of a table — the
    dataset-versioning / CDC-audit report (which rows were added,
    removed, or changed between snapshot A and snapshot B, and WHICH
    columns changed). The reference has no such operator; at
    training-corpus scale it is the standard pre-publish gate ("this
    refresh touched 0.3% of rows, all in `text`").

    ``compare`` defaults to every shared non-key column. Output: the
    key columns + ``diff_status`` ('added' | 'removed' | 'changed' |
    'unchanged') + ``changed_cols`` (sorted array of differing column
    names; empty except for 'changed'). Comparison is NULL-safe
    (NULL == NULL; NULL vs value counts as a change).

    Plan: ONE full outer sort-merge/shuffled-hash equi-join on the
    keys — the minimum possible for a two-sided diff; per-column
    comparisons are pure JVM expressions on the joined row, no second
    pass and no collect. Scales as the join does: co-partition or
    bucket both snapshots on ``keys`` upstream and the shuffle
    disappears.
    """
    if not keys:
        raise ValueError("data_diff requires at least one key column")
    missing = [c for c in keys if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"key columns missing from a side: {missing}")
    if compare is None:
        compare = sorted(
            (set(old.columns) & set(new.columns)) - set(keys)
        )
    reserved = {"diff_status", "changed_cols", "_in_old", "_in_new"}
    clash = sorted(reserved & set(keys))
    if clash:
        raise ValueError(f"data_diff reserves column names {clash}")
    lo = old.select(
        *keys, F.lit(1).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in compare],
    )
    ln = new.select(
        *keys, F.lit(1).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in compare],
    )
    j = lo.join(ln, keys, "full_outer")
    changed = F.array_sort(F.array_compact(F.array(*[
        F.when(~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c))
        for c in compare
    ]))) if compare else F.array().cast("array<string>")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.size(changed) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *keys,
        status.alias("diff_status"),
        F.when(
            status == F.lit("changed"), changed
        ).otherwise(F.array().cast("array<string>")).alias("changed_cols"),
    )
