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


# ------------------------------------------------- theil_sen sampled

def test_theil_sen_sampled_error_bound_pinned(spark):
    """The sampled-pairs scale path (ORACLE_EXEMPT precedent): on a
    200-row noisy-linear series, the sampled median slope's RANK among
    all exact pairwise slopes must sit within n_pairs/2 ± 0.05*n_pairs
    for the fixed seed — the pinned bound; and the clean-line case
    recovers the exact slope."""
    import random

    from docetl_spark.functions.mlstats import theil_sen_by

    # clean line: every pairwise slope identical -> sample median exact
    clean = spark.createDataFrame(
        [(1, t, 3.0 * t + 5.0) for t in range(50)], "g int, t int, v double")
    # slope_milli = dcents*1000 per dt: 3.0/t = 300 cents/t -> 300000
    rs = theil_sen_by(clean, "t", "v", by=["g"], method="sampled").collect()[0]
    assert rs["slope_milli"] == 300000
    assert rs["n_pairs"] == 50 * 16  # n * pairs_per_row, no equal-t drops

    # noisy line: sampled median's rank among exact slopes within the bound
    rng = random.Random(11)
    rows = [(1, t, 2.0 * t + rng.uniform(-8, 8)) for t in range(200)]
    df = spark.createDataFrame(rows, "g int, t int, v double")
    got = theil_sen_by(df, "t", "v", by=["g"], method="sampled").collect()[0]
    import math

    cents = [(t, int(math.floor(v * 100 + 0.5))) for _, t, v in rows]

    def tdiv(num, den):  # Spark decimal DIV truncates toward zero
        q = abs(num) // abs(den)
        return q if (num >= 0) == (den > 0) else -q

    slopes = sorted(
        tdiv((cb - ca) * 1000, tb - ta)
        for i, (ta, ca) in enumerate(cents)
        for tb, cb in cents[i + 1:]
        if tb != ta
    )
    n_pairs = len(slopes)
    import bisect

    lo = bisect.bisect_left(slopes, got["slope_milli"])
    hi = bisect.bisect_right(slopes, got["slope_milli"])
    mid = (n_pairs + 1) // 2
    tol = int(0.05 * n_pairs)
    assert lo - tol <= mid <= hi + tol, (lo, hi, mid, n_pairs)


def test_theil_sen_sampled_deterministic_and_seeded(spark):
    from docetl_spark.functions.mlstats import theil_sen_by

    df = spark.createDataFrame(
        [(g, t, float((t * (g + 3)) % 17)) for g in range(3) for t in range(40)],
        "g int, t int, v double")
    a = sorted(tuple(r) for r in theil_sen_by(
        df, "t", "v", by=["g"], method="sampled").collect())
    b = sorted(tuple(r) for r in theil_sen_by(
        df, "t", "v", by=["g"], method="sampled").collect())
    assert a == b
    c = sorted(tuple(r) for r in theil_sen_by(
        df, "t", "v", by=["g"], method="sampled", seed=7).collect())
    assert {x[0] for x in c} == {x[0] for x in a}  # same groups, any slopes
    # single-row group: no partners, NULL slope, zero sampled pairs
    one = spark.createDataFrame([(9, 0, 1.0)], "g int, t int, v double")
    r1 = theil_sen_by(one, "t", "v", by=["g"], method="sampled").collect()[0]
    assert (r1["n"], r1["n_pairs"], r1["slope_milli"]) == (1, 0, None)
