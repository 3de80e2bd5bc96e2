"""Round-8 scale escape hatches: approx_quantiles (mergeable sketch for
the exact order-statistic paths) and ewma_bucketed (affine bucket
chaining for unbounded per-key histories). These are approximation/
regrouping twins of exact operators, so their correctness pins are
bound tests against the exact implementations, not hash oracles."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from docetl_spark.functions.stats import approx_quantiles, exact_quantiles
from docetl_spark.functions.timeseries import ewma, ewma_bucketed


def test_approx_quantiles_rank_error_bound(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("value").cast("double").alias("value"), "event_type")
    n = df.count()
    ex = exact_quantiles(df, "value", [0.5, 0.9]).collect()[0]
    ap = approx_quantiles(df, "value", [0.5, 0.9], accuracy=10_000).collect()[0]
    assert ap["n"] == ex["n"]
    # rank-error bound: the approx value's true rank is within
    # n/accuracy of the target rank
    vals = sorted(r["value"] for r in df.filter(F.col("value").isNotNull()).collect())
    for tag, p in (("p50", 0.5), ("p90", 0.9)):
        import bisect
        rank = bisect.bisect_left(vals, ap[tag])
        assert abs(rank - p * (len(vals) - 1)) <= max(2.0, len(vals) / 10_000 + 1)
    # grouped shape mirrors exact_quantiles
    g_ex = {r["event_type"]: r for r in exact_quantiles(
        df, "value", [0.5], by=["event_type"]).collect()}
    g_ap = {r["event_type"]: r for r in approx_quantiles(
        df, "value", [0.5], by=["event_type"]).collect()}
    assert set(g_ex) == set(g_ap)
    for k in g_ex:
        assert g_ap[k]["n"] == g_ex[k]["n"]


def test_approx_quantiles_validates(spark):
    df = spark.range(5).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="fractions"):
        approx_quantiles(df, "v", [1.5])
    with pytest.raises(ValueError, match="accuracy"):
        approx_quantiles(df, "v", [0.5], accuracy=0)


def test_ewma_bucketed_matches_sequential(spark, sf_dir):
    from docetl_spark.sources.readers import normalize_epoch_nanos, set_nanos_conf_if_needed

    set_nanos_conf_if_needed(spark, f"{sf_dir}/events.parquet")
    ev = normalize_epoch_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    seq = {r["user_id"]: r for r in ewma(
        ev, "ts", "value", keys=["user_id"], alpha=0.3, tiebreak="event_id").collect()}
    # hour buckets: every key spans many buckets at sf0.001+
    bkt = {r["user_id"]: r for r in ewma_bucketed(
        ev, "ts", "value", keys=["user_id"], alpha=0.3,
        bucket_width=3_600_000_000_000, tiebreak="event_id").collect()}
    assert set(seq) == set(bkt)
    for k, s in seq.items():
        b = bkt[k]
        assert b["n"] == s["n"]
        if s["ewma"] is None:
            assert b["ewma"] is None
        else:
            assert b["ewma"] == pytest.approx(s["ewma"], rel=1e-9)


def test_ewma_bucketed_edges(spark):
    rows = [
        (1, 10, 1.0), (1, 20, None), (1, 5000, 3.0),   # NULL dropped, 2 buckets
        (2, 15, None), (2, 25, None),                    # all-NULL key
        (3, 7, 42.0),                                    # single value
    ]
    df = spark.createDataFrame(rows, "k long, ts long, v double")
    out = {r["k"]: r for r in ewma_bucketed(
        df, "ts", "v", keys=["k"], alpha=0.5, bucket_width=1000).collect()}
    seq = {r["k"]: r for r in ewma(
        df, "ts", "v", keys=["k"], alpha=0.5).collect()}
    assert out[1]["n"] == 2 and out[1]["ewma"] == pytest.approx(seq[1]["ewma"], rel=1e-12)
    assert out[2]["n"] == 0 and out[2]["ewma"] is None
    assert out[3]["ewma"] == 42.0
    with pytest.raises(ValueError, match="bucket_width"):
        ewma_bucketed(df, "ts", "v", keys=["k"], alpha=0.5, bucket_width=0)


def test_sketch_verbs_and_yaml_specs(spark):
    from docetl_spark import SemanticFrame
    from docetl_spark.plans.compiler import apply_op
    from docetl_spark.plans.ir import OpSpec

    rows = [(1, 100, 1.0), (1, 5000, 2.0), (2, 100, 7.0)]
    sf = SemanticFrame.from_df(spark.createDataFrame(rows, "k long, ts long, v double"))
    assert sf.approx_quantiles("v", [0.5], by=["k"]).df.columns == ["k", "n", "p50"]
    assert sf.ewma_bucketed("ts", "v", keys=["k"], alpha=0.5,
                            bucket_width=1000).df.columns == ["k", "n", "ewma"]
    a = apply_op(sf, OpSpec("approx_quantiles", {"value_col": "v", "ps": [0.5]}), {})
    assert a.df.columns == ["n", "p50"]
    e = apply_op(sf, OpSpec("ewma_bucketed", {
        "ts_col": "ts", "value_col": "v", "keys": ["k"],
        "alpha": 0.5, "bucket_width": 1000}), {})
    assert e.df.count() == 2


def test_active_users_approx_error_bound(spark, sf_dir):
    from docetl_spark.sources.readers import normalize_epoch_nanos, set_nanos_conf_if_needed
    from docetl_spark.functions.timeseries import active_users, active_users_approx

    set_nanos_conf_if_needed(spark, f"{sf_dir}/events.parquet")
    ev = normalize_epoch_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    exact = {r["day"]: r for r in active_users(
        ev, "ts", user_col="user_id", windows=(1, 7)).collect()}
    approx = {r["day"]: r for r in active_users_approx(
        ev, "ts", user_col="user_id", windows=(1, 7), lgk=12).collect()}
    assert set(exact) == set(approx)
    for day, e in exact.items():
        a = approx[day]
        for col in ("au_1d", "au_7d"):
            # HLL rel error ~1.6% at lgk=12; tiny counts are near-exact
            assert abs(a[col] - e[col]) <= max(2, 0.05 * e[col])


def test_active_users_approx_validates(spark):
    from docetl_spark.functions.timeseries import active_users_approx

    df = spark.createDataFrame([(1, 5)], "u long, ts long")
    with pytest.raises(ValueError, match="windows"):
        active_users_approx(df, "ts", user_col="u", windows=(0,))
