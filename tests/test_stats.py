"""functions/stats.py — key-skew profiling."""

import pytest

from docetl_spark.functions.stats import skew_profile


def test_skew_profile_shares_and_ranks(spark):
    # 100 rows: key 'hot' owns 60, 'warm' 30, ten singles
    rows = [("hot",)] * 60 + [("warm",)] * 30 + [(f"k{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, ["k"])
    out = skew_profile(df, ["k"], top=3).collect()
    assert [r["k"] for r in out] == ["hot", "warm", "k0"]
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert out[0]["n_rows"] == 60 and out[0]["share_bp"] == 6000
    assert out[1]["share_bp"] == 3000
    assert out[2]["share_bp"] == 100
    assert [r["cum_share_bp"] for r in out] == [6000, 9000, 9100]
    assert out[0]["total_rows"] == 100 and out[0]["n_keys"] == 12


def test_skew_profile_multi_key_and_floor(spark):
    # 3 rows over 2 composite keys: shares floor (1/3 -> 3333bp)
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2)], ["x", "y"]
    )
    out = {(r["x"], r["y"]): r for r in skew_profile(df, ["x", "y"]).collect()}
    assert out[("a", 1)]["share_bp"] == 6666  # floor, never round
    assert out[("b", 2)]["share_bp"] == 3333
    assert out[("b", 2)]["cum_share_bp"] == 10000


def test_skew_profile_rejects_empty_keys(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(ValueError):
        skew_profile(df, [])


def test_skew_profile_near_unique_key(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], ["x"])
    out = skew_profile(df, ["x"], top=5).collect()
    assert len(out) == 5
    assert all(r["n_keys"] == 50 and r["share_bp"] == 200 for r in out)
