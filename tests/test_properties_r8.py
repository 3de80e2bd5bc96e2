"""Property-based invariants for the round-8 report/dq operators: the
oracle gate pins cross-engine equality on the fixed testdata; these
sweep randomized inputs for the structural invariants that must hold on
ANY data (partition-of-keys, conservation-of-counts, monotonicity,
bucketed-vs-sequential agreement)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

VALS = st.lists(
    st.one_of(st.none(), st.floats(min_value=-1e4, max_value=1e4,
                                   allow_nan=False, allow_infinity=False)),
    min_size=1, max_size=30,
)

SPARK_SETTINGS = dict(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(vals=VALS, width=st.sampled_from([0.25, 1.0, 3.0]))
@settings(**SPARK_SETTINGS)
def test_histogram_conserves_and_contains(spark, vals, width):
    from docetl_spark.functions.stats import histogram

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = histogram(df, "v", bin_width=width).collect()
    n_nonnull = sum(1 for v in vals if v is not None)
    assert sum(r["n_rows"] for r in rows) == n_nonnull
    w = int(round(width * 100))
    for v in vals:
        if v is None:
            continue
        import math
        c = math.floor(v * 100 + 0.5)
        lo = c - ((c % w) + w) % w
        assert any(r["bin_lo"] == lo for r in rows)
    assert all(0 <= r["share_bp"] <= 10000 for r in rows)


@given(vals=VALS)
@settings(**SPARK_SETTINGS)
def test_running_totals_terminal_share(spark, vals):
    from docetl_spark.functions.stats import running_totals

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "seq long, v double").withColumn(
        "k", F.lit("g"))
    out = sorted(running_totals(df, "v", keys=["k"], order_by=["seq"]).collect(),
                 key=lambda r: r["seq"])
    # cum is a prefix fold: last == total; share ends at 10000 iff tot != 0
    import math
    cents = [0 if v is None else math.floor(v * 100 + 0.5) for v in vals]
    assert out[-1]["cum_value"] == sum(cents)
    if sum(cents) != 0:
        assert out[-1]["cum_share_bp"] == 10000
    else:
        assert all(r["cum_share_bp"] is None for r in out)


@given(old_keys=st.sets(st.integers(0, 20)), new_keys=st.sets(st.integers(0, 20)))
@settings(**SPARK_SETTINGS)
def test_data_diff_partitions_key_union(spark, old_keys, new_keys):
    from docetl_spark.functions.joins import data_diff

    old = spark.createDataFrame([(k, k % 3) for k in old_keys] or [(None, None)],
                                "id long, v long").filter(F.col("id").isNotNull())
    new = spark.createDataFrame([(k, k % 5) for k in new_keys] or [(None, None)],
                                "id long, v long").filter(F.col("id").isNotNull())
    out = {r["id"]: r["diff_status"] for r in data_diff(old, new, ["id"]).collect()}
    assert set(out) == old_keys | new_keys
    for k in old_keys | new_keys:
        if k not in old_keys:
            assert out[k] == "added"
        elif k not in new_keys:
            assert out[k] == "removed"
        else:
            assert out[k] == ("unchanged" if k % 3 == k % 5 else "changed")


@given(vals=st.lists(st.tuples(
    st.integers(0, 3),                       # key
    st.integers(0, 10**6),                   # ts
    st.floats(-100, 100, allow_nan=False)),  # value
    min_size=1, max_size=40))
@settings(**SPARK_SETTINGS)
def test_ewma_bucketed_agrees_with_sequential(spark, vals):
    from docetl_spark.functions.timeseries import ewma, ewma_bucketed

    rows = [(k, t, i, v) for i, (k, t, v) in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, ts long, eid long, v double")
    seq = {r["k"]: r for r in ewma(df, "ts", "v", keys=["k"], alpha=0.4,
                                   tiebreak="eid").collect()}
    bkt = {r["k"]: r for r in ewma_bucketed(
        df, "ts", "v", keys=["k"], alpha=0.4, bucket_width=1000,
        tiebreak="eid").collect()}
    assert set(seq) == set(bkt)
    for k in seq:
        assert bkt[k]["n"] == seq[k]["n"]
        if seq[k]["ewma"] is None:
            assert bkt[k]["ewma"] is None
        else:
            assert bkt[k]["ewma"] == pytest.approx(seq[k]["ewma"], rel=1e-9, abs=1e-9)


@given(days=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 40)),
                     min_size=1, max_size=30))
@settings(**SPARK_SETTINGS)
def test_active_users_monotone_windows(spark, days):
    from docetl_spark.functions.timeseries import active_users

    df = spark.createDataFrame([(u, d * 10 + 1) for u, d in days], "u long, ts long")
    out = active_users(df, "ts", user_col="u", day_ns=10, windows=(1, 7, 30)).collect()
    observed = {d for _, d in days}
    assert {r["day"] for r in out} == observed
    for r in out:
        assert 1 <= r["au_1d"] <= r["au_7d"] <= r["au_30d"]
        assert r["au_1d"] == len({u for u, d in days if d == r["day"]})
