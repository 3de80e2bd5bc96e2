"""Data-quality gates: column profiling, declarative constraint checks,
referential-integrity violations.

A 100 TB ingest without these runs blind — every serious pipeline fronts
its training-data refresh with exactly this trio (the dbt-test /
Great-Expectations core, re-expressed as Spark aggregations):
``profile_columns`` is the one-pass "describe" that catches schema rot
(a column suddenly 40% NULL), ``check_constraints`` turns business
invariants into violation counts, and ``fk_violations`` surfaces orphan
rows before a join silently drops them. All three are pure DataFrame
aggregations/joins — no collects, no UDFs, oracle-checkable exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_columns(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Per-column profile: ``column``, ``n_rows``, ``n_null``,
    ``n_distinct`` (exact, NULL excluded) — the data-quality describe.

    Plan: ONE aggregation over one scan. Multiple exact count-distincts
    compile to Spark's Expand strategy (each row fans out once per
    column, then a single combinable aggregate) — one shuffle whose
    width is len(columns) × distinct values, the exact-distinct floor.
    For wide tables where approximate counts suffice,
    ``approx_count_distinct`` per column is the sketch escape hatch
    (one ordinary agg, no Expand).
    """
    cols = list(columns) if columns is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_columns: unknown columns {missing}")
    if not cols:
        raise ValueError("profile_columns requires at least one column")
    # column names are data, not identifiers: positional aliases +
    # escaped string literals keep arbitrary names (spaces, dashes,
    # quotes, dots) out of the SQL-identifier grammar entirely
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(cols):
        aggs.append((F.count(F.lit(1)) - F.count(df[c])).alias(f"_null_{i}"))
        aggs.append(F.countDistinct(df[c]).alias(f"_dist_{i}"))
    wide = df.agg(*aggs)
    stack = ", ".join(
        "'{lit}', _null_{i}, _dist_{i}".format(lit=c.replace("\\", "\\\\").replace("'", "\\'"), i=i)
        for i, c in enumerate(cols)
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack}) AS (column, n_null, n_distinct)",
    ).select("column", "n_rows", "n_null", "n_distinct")


def check_constraints(
    df: DataFrame, constraints: dict[str, str]
) -> DataFrame:
    """Declarative invariant gate: ``constraints`` maps a name to a SQL
    boolean expression over the table's columns; returns one row per
    constraint with ``n_checked`` and ``n_violations`` (rows where the
    expression is false OR NULL — an unevaluable invariant is a failed
    invariant, the dbt-test convention).

    Plan: every constraint folds into ONE combinable aggregation over
    one scan — adding a constraint adds an expression, not a pass.
    """
    if not constraints:
        raise ValueError("check_constraints requires at least one constraint")
    aggs = [F.count(F.lit(1)).alias("n_checked")]
    for name in constraints:
        if not name.isidentifier():
            raise ValueError(f"constraint name {name!r} must be an identifier")
    for name, expr in constraints.items():
        aggs.append(
            # coalesce the SUM too: an empty table must report 0
            # violations, not NULL — a gate that returns NULL on the
            # accidentally-empty refresh silently passes `> 0` checks
            F.coalesce(
                F.sum(
                    F.when(F.coalesce(F.expr(expr), F.lit(False)), 0).otherwise(1)
                ),
                F.lit(0),
            ).cast("long").alias(f"_v_{name}")
        )
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{n}', _v_{n}" for n in constraints)
    return wide.selectExpr(
        "n_checked",
        f"stack({len(constraints)}, {stack}) AS (constraint_name, n_violations)",
    ).select("constraint_name", "n_checked", "n_violations")


def fk_violations(
    child: DataFrame,
    parent: DataFrame,
    on: list[str] | dict[str, str],
) -> DataFrame:
    """Orphan child rows: rows of ``child`` whose foreign key has no
    match in ``parent`` — returned in full so the caller can quarantine
    or repair them. ``on`` is a column list (same names both sides) or
    a {child_col: parent_col} mapping. NULL foreign keys are orphans
    (they join nothing), matching LEFT ANTI semantics.

    Plan: one LEFT ANTI equi-join — broadcast when the parent's key
    projection is small (the usual dimension case), shuffled otherwise;
    only the parent's KEY columns are scanned (column pruning does the
    rest).
    """
    mapping = {c: c for c in on} if isinstance(on, list) else dict(on)
    if not mapping:
        raise ValueError("fk_violations requires at least one key column")
    missing_c = [c for c in mapping if c not in child.columns]
    missing_p = [p for p in mapping.values() if p not in parent.columns]
    if missing_c or missing_p:
        raise ValueError(
            f"fk_violations: unknown columns child={missing_c} parent={missing_p}"
        )
    keys = parent.select(*{p for p in mapping.values()}).distinct()
    cond = None
    for c, p in mapping.items():
        e = F.col(f"__c.{c}") == F.col(f"__p.{p}")
        cond = e if cond is None else cond & e
    return child.alias("__c").join(keys.alias("__p"), cond, "left_anti")
