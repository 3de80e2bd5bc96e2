"""Property-based invariants for the round-11 scale rewrites: the
equijoin bucket fast path must reproduce the generic stratified
sampler's EXACT pair set on ANY data (the oracle-parity contract the
fixed-testdata gate pins only for one shape), and the Kendall/MK
inversion decomposition must match the pairwise definition under
arbitrary tie structure."""

from __future__ import annotations

import sys
from pathlib import Path

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SPARK_SETTINGS = dict(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    n_left=st.integers(min_value=1, max_value=24),
    n_right=st.integers(min_value=1, max_value=14),
    n_buckets=st.integers(min_value=1, max_value=5),
    limit=st.integers(min_value=1, max_value=40),
    lens=st.lists(st.integers(min_value=0, max_value=12),
                  min_size=38, max_size=38),
)
@settings(**SPARK_SETTINGS)
def test_bucketed_stratified_always_matches_generic(
    spark, n_left, n_right, n_buckets, limit, lens
):
    from docetl_spark.operators.equijoin import (
        bucketed_stratified_pairs, stratified_limit_pairs)

    left = spark.createDataFrame(
        [{"lid": i, "ltext": "x" * lens[i]} for i in range(n_left)])
    right = spark.createDataFrame(
        [{"rid": j, "rtext": "y" * lens[24 + j]} for j in range(n_right)])
    cond = f"left.lid % {n_buckets} = right.rid % {n_buckets}"
    generic_pairs = (
        left.alias("left").join(right.alias("right"), F.expr(cond))
        .select(F.col("left.lid").alias("_lk_lid"),
                F.col("right.rid").alias("_rk_rid"))
    )
    want = sorted(tuple(r) for r in stratified_limit_pairs(
        generic_pairs, left, right, ["lid"], ["rid"], limit
    ).select("_lk_lid", "_rk_rid").collect())
    got = sorted(tuple(r) for r in bucketed_stratified_pairs(
        left, right, ["lid"], ["rid"],
        [f"left.lid % {n_buckets}"], [f"right.rid % {n_buckets}"], limit
    ).select("_lk_lid", "_rk_rid").collect())
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=6),
                  st.integers(min_value=0, max_value=4)),
        min_size=2, max_size=40,
    )
)
@settings(**SPARK_SETTINGS)
def test_mann_kendall_decomposition_any_ties(spark, rows):
    from docetl_spark.functions.mlstats import mann_kendall_by

    df = spark.createDataFrame(
        [(1, t, float(v)) for t, v in rows], "g int, t int, v double")
    got = mann_kendall_by(df, "t", "v", by=["g"]).collect()[0]
    up = down = tie = np_ = 0
    for i in range(len(rows)):
        for j in range(len(rows)):
            if rows[i][0] < rows[j][0]:
                np_ += 1
                if rows[j][1] > rows[i][1]:
                    up += 1
                elif rows[j][1] < rows[i][1]:
                    down += 1
                else:
                    tie += 1
    assert (got["n_pairs"], got["n_up"], got["n_down"], got["n_tie"]) == (
        np_, up, down, tie)
