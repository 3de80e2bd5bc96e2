"""Property-based invariants for the round-9 operators: the oracle gate
pins cross-engine equality on the fixed testdata; these sweep randomized
inputs for the structural invariants that must hold on ANY data
(monotonicity, conservation, antichain-ness, non-negativity)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SPARK_SETTINGS = dict(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

POS_VALS = st.lists(
    st.floats(min_value=0.0, max_value=1e4, allow_nan=False, allow_infinity=False),
    min_size=2, max_size=25,
)


@given(vals=POS_VALS)
@settings(**SPARK_SETTINGS)
def test_weighted_quantiles_monotone_in_q(spark, vals):
    from docetl_spark.functions.stats import weighted_quantiles

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    qs = [1000, 5000, 9000, 10000]
    got = {r["q_bp"]: r["value"] for r in
           weighted_quantiles(df.withColumn("w", F.lit(1.0)), "v", "w",
                              qs_bp=qs).collect()}
    # quantile values are non-decreasing in q, and bounded by the data
    seq = [got[q] for q in qs if q in got]
    assert all(a <= b for a, b in zip(seq, seq[1:]))
    assert got[10000] == max(vals)


@given(vals=POS_VALS)
@settings(**SPARK_SETTINGS)
def test_gini_bounded_and_zero_iff_equal(spark, vals):
    from docetl_spark.functions.stats import gini_bp

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = gini_bp(df, "v").collect()[0]
    if r["gini_bp"] is not None:
        assert 0 <= r["gini_bp"] < 10000
    import math
    cents = [int(math.floor(v * 100 + 0.5)) for v in vals]
    if len(set(cents)) == 1 and cents[0] > 0:
        assert r["gini_bp"] == 0


@given(
    iv=st.lists(st.tuples(st.integers(0, 300), st.integers(0, 80)),
                min_size=1, max_size=25)
)
@settings(**SPARK_SETTINGS)
def test_interval_union_covered_bounded_by_span_and_sum(spark, iv):
    from docetl_spark.functions.timeseries import interval_union

    rows = [("k", s, s + d) for s, d in iv]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    r = interval_union(df, keys=["k"], start_col="s", end_col="e").collect()[0]
    assert 0 <= r["covered_ns"] <= r["span_ns"]
    assert r["covered_ns"] <= sum(d for _, d in iv)  # union <= sum of lengths
    assert 1 <= r["n_merged"] <= r["n_intervals"] == len(iv)


@given(
    pts=st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)),
                 min_size=1, max_size=30)
)
@settings(**SPARK_SETTINGS)
def test_skyline_is_antichain_and_covers(spark, pts):
    from docetl_spark.functions.stats import skyline_2d

    rows = [{"x": x, "y": y, "id": i} for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows)
    sky = [(r["x"], r["y"]) for r in skyline_2d(df, "x", "y", tiebreak=["id"]).collect()]
    # antichain: no skyline point dominates another
    for i, (x1, y1) in enumerate(sky):
        for j, (x2, y2) in enumerate(sky):
            if i != j:
                assert not (x1 <= x2 and y1 >= y2 and (x1 < x2 or y1 > y2))
    # coverage: every input point is dominated-or-equaled by some skyline point
    for x, y in pts:
        assert any(sx <= x and sy >= y for sx, sy in sky)


@given(vals=st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False),
                     min_size=2, max_size=30))
@settings(**SPARK_SETTINGS)
def test_cusum_nonnegative_and_alarm_consistent(spark, vals):
    from docetl_spark.functions.timeseries import changepoint_cusum

    rows = [("k", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    out = changepoint_cusum(df, "v", keys=["k"], ts_col="ts", threshold=20.0).collect()
    for r in out:
        assert r["cusum_milli"] >= 0
    # alarm rows have strictly larger statistic than every non-alarm row's
    # minimum... weaker sound invariant: any alarm implies some milli > 0
    if any(r["alarm"] for r in out):
        assert max(r["cusum_milli"] for r in out if r["alarm"]) > 0


@given(
    baskets=st.lists(st.tuples(st.integers(0, 6), st.sampled_from("abcd")),
                     min_size=1, max_size=40)
)
@settings(**SPARK_SETTINGS)
def test_basket_pairs_support_bounds(spark, baskets):
    from docetl_spark.functions.stats import basket_pairs

    df = spark.createDataFrame([(b, i) for b, i in baskets], "bk int, it string")
    for r in basket_pairs(df, "bk", "it").collect():
        # pair count can't exceed either item's basket count
        assert r["pair_n"] <= min(r["n_a"], r["n_b"])
        assert 0 < r["support_bp"] <= 10000
        assert 0 < r["conf_ab_bp"] <= 10000 and 0 < r["conf_ba_bp"] <= 10000
