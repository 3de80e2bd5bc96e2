"""Data-quality trio (functions/dq.py): column profiling, constraint
checks, FK orphan detection."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from docetl_spark.functions.dq import check_constraints, fk_violations, profile_columns


def test_profile_columns(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 5.0), (3, None, 5.0), (3, None, None)],
        "id long, s string, v double")
    out = {r["column"]: r for r in profile_columns(df).collect()}
    assert out["id"]["n_rows"] == 4 and out["id"]["n_null"] == 0
    assert out["id"]["n_distinct"] == 3
    assert out["s"]["n_null"] == 2 and out["s"]["n_distinct"] == 1
    assert out["v"]["n_null"] == 2 and out["v"]["n_distinct"] == 1
    sub = profile_columns(df, ["s"]).collect()
    assert len(sub) == 1
    with pytest.raises(ValueError, match="unknown"):
        profile_columns(df, ["nope"])


def test_check_constraints_null_is_violation(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -1.0), (3, None)], "id long, v double")
    out = {r["constraint_name"]: r for r in check_constraints(df, {
        "v_positive": "v > 0",
        "id_not_null": "id IS NOT NULL",
    }).collect()}
    # v > 0 is false for -1 and NULL for None -> both violations
    assert out["v_positive"]["n_violations"] == 2
    assert out["v_positive"]["n_checked"] == 3
    assert out["id_not_null"]["n_violations"] == 0
    with pytest.raises(ValueError, match="identifier"):
        check_constraints(df, {"bad name": "v > 0"})


def test_fk_violations(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk long")
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    out = sorted(r["id"] for r in fk_violations(
        child, parent, {"fk": "pk"}).collect())
    assert out == [3, 4]  # missing parent AND NULL fk are both orphans
    same = spark.createDataFrame([(10,), (20,)], "fk long")
    assert fk_violations(child, same, ["fk"]).count() == 2
    with pytest.raises(ValueError, match="unknown"):
        fk_violations(child, parent, {"nope": "pk"})


def test_profile_columns_hostile_names_and_empty_list(spark):
    """Review r8: column names are data — spaces, dashes, quotes, dots
    must survive the stack(); an explicit empty list must raise, not
    silently profile everything."""
    df = spark.createDataFrame(
        [(1, "x")], ["first-seen", "user name's"])
    out = {r["column"]: r for r in profile_columns(df).collect()}
    assert set(out) == {"first-seen", "user name's"}
    assert out["first-seen"]["n_distinct"] == 1
    with pytest.raises(ValueError, match="at least one"):
        profile_columns(df, [])


def test_check_constraints_empty_table_zero_not_null(spark):
    df = spark.createDataFrame([], "id long, v double")
    out = check_constraints(df, {"v_pos": "v > 0"}).collect()
    assert out[0]["n_checked"] == 0 and out[0]["n_violations"] == 0
