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


# ------------------------------------------------------ exact quantiles


def test_exact_quantiles_matches_builtin_percentile(spark):
    import random

    from pyspark.sql import functions as F

    from docetl_spark.functions.stats import exact_quantiles

    rng = random.Random(7)
    rows = [(f"g{i % 3}", rng.uniform(-100, 100)) for i in range(257)]
    df = spark.createDataFrame(rows, ["g", "v"])
    ps = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
    mine = {r["g"]: r for r in exact_quantiles(df, "v", ps, by=["g"]).collect()}
    builtin = {
        r["g"]: r
        for r in df.groupBy("g")
        .agg(*[F.percentile("v", p).alias(f"b{i}") for i, p in enumerate(ps)])
        .collect()
    }
    tags = ["p0", "p25", "p50", "p90", "p99", "p100"]
    for g in mine:
        for i, tag in enumerate(tags):
            # bit-for-bit, not approx — the formula must be the engine's
            assert repr(mine[g][tag]) == repr(builtin[g][f"b{i}"]), (g, tag)


def test_exact_quantiles_global_ignores_nulls(spark):
    from docetl_spark.functions.stats import exact_quantiles

    df = spark.createDataFrame(
        [(None,), (1.0,), (2.0,), (3.0,), (None,)], "v double"
    )
    out = exact_quantiles(df, "v", [0.5]).collect()
    assert len(out) == 1 and out[0]["n"] == 3 and out[0]["p50"] == 2.0


def test_exact_quantiles_single_row_and_validation(spark):
    import pytest as _pytest

    from docetl_spark.functions.stats import exact_quantiles

    df = spark.createDataFrame([(5.0,)], "v double")
    out = exact_quantiles(df, "v", [0.0, 0.5, 1.0]).collect()[0]
    assert out["p0"] == out["p50"] == out["p100"] == 5.0
    with _pytest.raises(ValueError):
        exact_quantiles(df, "v", [])
    with _pytest.raises(ValueError):
        exact_quantiles(df, "v", [1.5])


def test_exact_quantiles_keeps_all_null_groups(spark):
    """Review repro: an all-NULL group must surface as (group, n=0,
    NULL quantiles) — percentile()/quantile_cont semantics — not vanish."""
    from docetl_spark.functions.stats import exact_quantiles

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", None), ("b", None)], "g string, v double"
    )
    out = {r["g"]: r for r in exact_quantiles(df, "v", [0.5], by=["g"]).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["n"] == 2 and out["a"]["p50"] == 1.5
    assert out["b"]["n"] == 0 and out["b"]["p50"] is None


def test_exact_quantiles_mixed_nulls_in_group(spark):
    from docetl_spark.functions.stats import exact_quantiles

    df = spark.createDataFrame(
        [("a", None), ("a", 4.0), ("a", 2.0), ("a", None)], "g string, v double"
    )
    out = exact_quantiles(df, "v", [0.5, 1.0], by=["g"]).collect()[0]
    assert out["n"] == 2 and out["p50"] == 3.0 and out["p100"] == 4.0


def test_skew_profile_plan_is_hash_join(spark):
    """The 1-row totals join must stay a BroadcastHashJoin via the
    shared non-foldable-key helper (a literal key folds to BNLJ)."""
    df = spark.createDataFrame([(i % 5,) for i in range(50)], ["k"])
    from docetl_spark.functions.stats import skew_profile

    plan = skew_profile(df, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


# ── round-9 ops: weighted_quantiles / trend_fit / benford_profile ──


def test_weighted_quantiles_exact_cuts(spark):
    from docetl_spark.functions.stats import weighted_quantiles

    rows = [("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 2.0), ("a", 10.0, 0.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    out = {(r["g"], r["q_bp"]): r["value"] for r in
           weighted_quantiles(df, "v", "w", qs_bp=[2500, 5000, 10000], by=["g"]).collect()}
    # total weight 4.0: 25% -> first value whose cum >= 1.0 (v=1),
    # 50% -> cum >= 2.0 (v=2), 100% -> v=10 is zero-weight but cum
    # reaches total at v=3 already -> 3.0
    assert out == {("a", 2500): 1.0, ("a", 5000): 2.0, ("a", 10000): 3.0}


def test_weighted_quantiles_validates(spark):
    from docetl_spark.functions.stats import weighted_quantiles

    df = spark.createDataFrame([(1.0, 1.0)], "v double, w double")
    with pytest.raises(ValueError, match="at least one q"):
        weighted_quantiles(df, "v", "w", qs_bp=[])
    with pytest.raises(ValueError, match="in \\(0, 10000\\]"):
        weighted_quantiles(df, "v", "w", qs_bp=[0])


def test_trend_fit_known_slope(spark):
    from docetl_spark.functions.stats import trend_fit

    # y = 2*x cents exactly: x in seconds 0..4 (ns inputs), y = 0.02*x dollars
    rows = [("a", i * 10**9, 0.02 * i) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, ts long, v double")
    out = {r["g"]: r for r in trend_fit(df, "ts", "v", by=["g"]).collect()}
    assert out["a"]["n"] == 5
    assert out["a"]["slope_micro"] == 2_000_000  # 2 cents/sec * 1e6


def test_trend_fit_degenerate_groups_null(spark):
    from docetl_spark.functions.stats import trend_fit

    rows = [("one", 10**9, 1.0),                    # n=1
            ("flat", 5 * 10**9, 1.0), ("flat", 5 * 10**9, 9.0)]  # zero x-variance
    df = spark.createDataFrame(rows, "g string, ts long, v double")
    out = {r["g"]: r["slope_micro"] for r in trend_fit(df, "ts", "v", by=["g"]).collect()}
    assert out == {"one": None, "flat": None}


def test_trend_fit_global_negative_slope(spark):
    from docetl_spark.functions.stats import trend_fit

    rows = [(i * 10**9, -0.01 * i) for i in range(10)]
    df = spark.createDataFrame(rows, "ts long, v double")
    r = trend_fit(df, "ts", "v").collect()[0]
    assert r["n"] == 10 and r["slope_micro"] == -1_000_000


def test_benford_profile_digits_and_expectation(spark):
    from docetl_spark.functions.stats import benford_profile

    # cents strings: 123.45 -> 12345 -> digit 1; -0.07 -> 7; 0.0 -> dropped
    rows = [(123.45,), (-0.07,), (0.0,), (None,), (2.0,)]
    df = spark.createDataFrame(rows, "v double")
    out = {r["digit"]: r for r in benford_profile(df, "v").collect()}
    assert set(out) == {1, 2, 7}
    assert out[1]["expected_bp"] == 3010
    assert out[1]["share_bp"] == 3333  # 1 of 3 kept rows
    assert out[7]["deviation_bp"] == 3333 - 580


def test_benford_profile_grouped(spark):
    from docetl_spark.functions.stats import benford_profile

    rows = [("a", 1.0), ("a", 1.5), ("b", 9.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {(r["g"], r["digit"]): r["share_bp"] for r in
           benford_profile(df, "v", by=["g"]).collect()}
    assert out == {("a", 1): 10000, ("b", 9): 10000}


def test_basket_pairs_exact_metrics(spark):
    from docetl_spark.functions.stats import basket_pairs

    # baskets: 1={x,y}, 2={x,y}, 3={x}, 4={z} ; duplicate rows collapse
    rows = [(1, "x"), (1, "y"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (4, "z")]
    df = spark.createDataFrame(rows, "bk int, it string")
    out = {(r["item_a"], r["item_b"]): r for r in basket_pairs(df, "bk", "it").collect()}
    assert set(out) == {("x", "y")}
    r = out[("x", "y")]
    assert r["pair_n"] == 2 and r["n_a"] == 3 and r["n_b"] == 2
    assert r["support_bp"] == 5000            # 2 of 4 baskets
    assert r["conf_ab_bp"] == 6666            # 2/3 trunc
    assert r["conf_ba_bp"] == 10000
    assert r["lift_micro"] == 2 * 4 * 1_000_000 // (3 * 2)


def test_basket_pairs_min_pair_count_and_empty(spark):
    from docetl_spark.functions.stats import basket_pairs

    rows = [(1, "x"), (1, "y")]
    df = spark.createDataFrame(rows, "bk int, it string")
    assert basket_pairs(df, "bk", "it", min_pair_count=2).count() == 0
    empty = spark.createDataFrame([], "bk int, it string")
    assert basket_pairs(empty, "bk", "it").count() == 0


def test_audience_overlap_grid_includes_empty(spark):
    from docetl_spark.functions.stats import audience_overlap

    rows = [(1, "a"), (2, "a"), (1, "b"), (3, "c")]
    df = spark.createDataFrame(rows, "u int, g string")
    out = {(r["group_a"], r["group_b"]): r for r in audience_overlap(df, "u", "g").collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    assert ab["n_both"] == 1 and ab["n_either"] == 2 and ab["jaccard_bp"] == 5000
    ac = out[("a", "c")]
    assert ac["n_both"] == 0 and ac["jaccard_bp"] == 0   # empty overlap surfaces


def test_rfm_segments_scores(spark):
    from docetl_spark.functions.stats import rfm_segments

    # 5 customers, strictly increasing on every dimension -> scores 1..5
    rows = []
    for c in range(1, 6):
        for i in range(c):  # frequency = c
            rows.append((c, c * 1000, float(c)))
    df = spark.createDataFrame(rows, "cust int, ts long, amt double")
    out = {r["cust"]: r for r in
           rfm_segments(df, keys=["cust"], ts_col="ts", amount_col="amt").collect()}
    for c in range(1, 6):
        assert out[c]["r_score"] == c and out[c]["f_score"] == c and out[c]["m_score"] == c
        assert out[c]["segment"] == f"R{c}F{c}M{c}"
        assert out[c]["monetary_cents"] == c * c * 100


def test_gini_bp_known_values(spark):
    from docetl_spark.functions.stats import gini_bp

    # perfect equality -> 0; [0,0,0,10] -> G = (2*40 - 5*10)/(4*10) = 0.75
    rows = [("eq", 5.0)] * 4 + [("uneq", 0.0)] * 3 + [("uneq", 10.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in gini_bp(df, "v", by=["g"]).collect()}
    assert out["eq"]["gini_bp"] == 0
    assert out["uneq"]["gini_bp"] == 7500
    assert out["uneq"]["total_cents"] == 1000


def test_gini_bp_zero_total_and_negative(spark):
    from docetl_spark.functions.stats import gini_bp

    zeros = spark.createDataFrame([("z", 0.0), ("z", 0.0)], "g string, v double")
    assert gini_bp(zeros, "v", by=["g"]).collect()[0]["gini_bp"] is None
    neg = spark.createDataFrame([("n", -1.0)], "g string, v double")
    with pytest.raises(Exception, match="negative values"):
        gini_bp(neg, "v", by=["g"]).collect()


def test_skyline_2d_dominance(spark):
    from docetl_spark.functions.stats import skyline_2d

    # minimize x, maximize y: (1,5) and (3,8) survive; (2,4) dominated by
    # (1,5); (3,8) duplicate keeps only the first by tiebreak
    rows = [("g", 1, 5, 1), ("g", 2, 4, 2), ("g", 3, 8, 3), ("g", 3, 8, 4)]
    df = spark.createDataFrame(rows, "g string, x int, y int, id int")
    got = {(r["x"], r["y"], r["id"]) for r in
           skyline_2d(df, "x", "y", by=["g"], tiebreak=["id"]).collect()}
    assert got == {(1, 5, 1), (3, 8, 3)}


def test_skyline_2d_direction_flags(spark):
    from docetl_spark.functions.stats import skyline_2d

    rows = [(1, 5), (2, 4), (3, 8)]
    df = spark.createDataFrame(rows, "x int, y int")
    # maximize x, minimize y: (3,8) in; (2,4) in (better y); (1,5) dominated by (2,4)
    got = {(r["x"], r["y"]) for r in
           skyline_2d(df, "x", "y", minimize_x=False, maximize_y=False).collect()}
    assert got == {(3, 8), (2, 4)}


def test_seasonal_outliers_flags_cell_relative(spark):
    from docetl_spark.functions.stats import seasonal_outliers

    HOUR = 3_600 * 10**9
    # hour-0 cell: mostly 10s with one 100 (outlier IN ITS CELL);
    # hour-1 cell: all 100s (so 100 is normal there)
    rows = ([(i, i * 1000, 10.0) for i in range(30)] + [(30, 31_000, 100.0)]
            + [(40 + i, HOUR + i * 1000, 100.0) for i in range(5)])
    df = spark.createDataFrame(rows, "event_id long, ts long, v double")
    out = {r["event_id"]: r for r in seasonal_outliers(df, "v", "ts").collect()}
    assert out[30]["is_outlier"] is True          # 100 vs 30 tens: z ~ 5.4
    assert all(not out[40 + i]["is_outlier"] for i in range(5))
    assert out[30]["hod"] == 0 and out[40]["hod"] == 1


def test_pair_metrics_counts(spark):
    from docetl_spark.functions.stats import pair_metrics

    pred = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (2, 1), (None, 7)], "id_a int, id_b int")
    truth = spark.createDataFrame([(2, 1), (3, 4), (8, 9)], "id_a int, id_b int")
    r = pair_metrics(pred, truth).collect()[0]
    # pred collapses to {(1,2),(3,4),(5,6)} (reversed dup + NULL dropped)
    assert r["n_pred"] == 3 and r["n_true"] == 3
    assert r["tp"] == 2 and r["fp"] == 1 and r["fn"] == 1
    assert r["precision_bp"] == 6666 and r["recall_bp"] == 6666
    assert r["f1_bp"] == 2 * 2 * 10000 // (4 + 1 + 1)


def test_pair_metrics_empty_sides(spark):
    from docetl_spark.functions.stats import pair_metrics

    empty = spark.createDataFrame([], "id_a int, id_b int")
    truth = spark.createDataFrame([(1, 2)], "id_a int, id_b int")
    r = pair_metrics(empty, truth).collect()[0]
    assert r["n_pred"] == 0 and r["precision_bp"] is None and r["recall_bp"] == 0


def test_decade_histogram_buckets(spark):
    from docetl_spark.functions.stats import decade_histogram

    rows = [(0.05,), (0.5,), (5.0,), (50.0,), (-5.0,), (0.0,), (None,)]
    df = spark.createDataFrame(rows, "v double")
    out = {(r["sign"], r["decade"]): r["n_rows"] for r in
           decade_histogram(df, "v").collect()}
    # cents: 5, 50, 500, 5000, -500, 0 -> decades 1,2,3,4 / (-1,3) / (0,0)
    assert out == {(1, 1): 1, (1, 2): 1, (1, 3): 1, (1, 4): 1, (-1, 3): 1, (0, 0): 1}


def test_trend_fit_null_group_key_survives(spark):
    from docetl_spark.functions.stats import trend_fit

    rows = [(None, 0, 0.0), (None, 10**9, 0.02), ("a", 0, 1.0), ("a", 10**9, 1.0)]
    df = spark.createDataFrame(rows, "g string, ts long, v double")
    out = {r["g"]: r for r in trend_fit(df, "ts", "v", by=["g"]).collect()}
    assert None in out and out[None]["n"] == 2
    assert out[None]["slope_micro"] == 2_000_000
    assert out["a"]["slope_micro"] == 0  # flat y over varying x: slope exactly 0


def test_pair_metrics_both_empty_scores_zero(spark):
    from docetl_spark.functions.stats import pair_metrics

    empty = spark.createDataFrame([], "id_a int, id_b int")
    r = pair_metrics(empty, empty).collect()[0]
    assert (r["n_pred"], r["n_true"], r["tp"], r["fp"], r["fn"]) == (0, 0, 0, 0, 0)
    assert r["precision_bp"] is None and r["f1_bp"] is None


def test_ab_test_summary_matches_manual_z2(spark):
    from docetl_spark.functions.stats import ab_test_summary

    # A: 100 users, 30 convert; B: 120 users, 20 convert
    rows = ([("A", i, i < 30) for i in range(100)]
            + [("B", 1000 + i, i < 20) for i in range(120)])
    df = spark.createDataFrame(rows, "variant string, uid long, won boolean")
    r = ab_test_summary(df, "variant", "won", entity_col="uid").collect()[0]
    assert (r["n_a"], r["c_a"], r["n_b"], r["c_b"]) == (100, 30, 120, 20)
    assert r["rate_a_bp"] == 3000 and r["rate_b_bp"] == 1666
    n_a, c_a, n_b, c_b = 100, 30, 120, 20
    d = c_a * n_b - c_b * n_a
    n, c = n_a + n_b, c_a + c_b
    want = d * d * n * 1000 // (n_a * n_b * c * (n - c))
    assert r["z2_milli"] == want
    # z^2 ~ 5.6 > 3.84 -> significant at 95%
    assert r["significant"] is True and want > 3841


def test_ab_test_summary_entity_dedup_and_degenerate(spark):
    from docetl_spark.functions.stats import ab_test_summary

    # the same user converting twice counts once
    rows = [("A", 1, True), ("A", 1, True), ("A", 2, False),
            ("B", 3, False), ("B", 4, False)]
    df = spark.createDataFrame(rows, "variant string, uid long, won boolean")
    r = ab_test_summary(df, "variant", "won", entity_col="uid").collect()[0]
    assert r["n_a"] == 2 and r["c_a"] == 1
    # all-false pool on one side is fine; all-false on BOTH -> degenerate NULL
    allf = spark.createDataFrame([("A", 1, False), ("B", 2, False)],
                                 "variant string, uid long, won boolean")
    r2 = ab_test_summary(allf, "variant", "won", entity_col="uid").collect()[0]
    assert r2["z2_milli"] is None and r2["significant"] is None


def test_collapse_rare_floors(spark):
    from docetl_spark.functions.stats import collapse_rare

    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1 + [(None,)]
    df = spark.createDataFrame(rows, "cat string")
    out = collapse_rare(df, "cat", min_count=3)
    got = {r["cat"] for r in out.collect()}
    assert got == {"a", "b", "__other__", None}   # NULL stays NULL
    # share floor: c is 10% of 10 non-null rows; 1500bp folds c AND b? b=30%
    out2 = {r["cat"] for r in collapse_rare(df, "cat", min_share_bp=1500).collect()}
    assert out2 == {"a", "b", "__other__", None}
    with pytest.raises(ValueError, match="min_count and/or"):
        collapse_rare(df, "cat")


def test_target_encode_loo_exact(spark):
    from docetl_spark.functions.stats import target_encode_loo

    rows = [(1, "x", 1.0), (2, "x", 2.0), (3, "x", 3.0),
            (4, "solo", 9.0), (5, None, 1.0), (6, "x", None)]
    df = spark.createDataFrame(rows, "id long, cat string, v double")
    out = {r["id"]: r["te_milli"] for r in target_encode_loo(df, "cat", "v").collect()}
    # x sums to 600 cents over 3 rows: loo means (500/2, 400/2, 300/2)*10
    assert out[1] == (600 - 100) * 1000 // 2
    assert out[2] == (600 - 200) * 1000 // 2
    assert out[3] == (600 - 300) * 1000 // 2
    assert out[4] is None       # singleton category
    assert out[5] is None       # NULL category
    assert out[6] is None       # NULL target
