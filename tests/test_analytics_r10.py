"""Round-10 analytics wave: hand-checked + edge-case + brute-force
parity tests for mlstats.py, the timeseries stream additions,
text.vocab_growth and training.curriculum_order."""

import math
import random

import pytest
from pyspark.sql import functions as F

from docetl_spark.functions.mlstats import (
    cramers_v2,
    dist_drift,
    impurity_by,
    kaplan_meier,
    mann_kendall_by,
    spearman_by,
    trimmed_mean_by,
    woe_table,
)
from docetl_spark.functions.timeseries import (
    acf_table,
    changepoint_mean_shift,
    runs_by,
    session_entry_exit,
    sma_crossover,
)

SEEDS = [11, 23]


# ------------------------------------------------------------- spearman

def test_spearman_monotone_and_grouped(spark):
    df = spark.createDataFrame(
        [(i % 2, float(i), float(i ** 3)) for i in range(1, 11)],
        "g int, x double, y double")
    r = spearman_by(df, "x", "y").collect()[0]
    assert (r["n"], r["sign"], r["rho2_bp"]) == (10, 1, 10000)
    anti = spearman_by(df.withColumn("y", -F.col("y")), "x", "y").collect()[0]
    assert (anti["sign"], anti["rho2_bp"]) == (-1, 10000)
    for row in spearman_by(df, "x", "y", by=["g"]).collect():
        assert (row["sign"], row["rho2_bp"]) == (1, 10000)


def test_spearman_null_rows_drop_before_ranking(spark):
    # the NULL-y row must not occupy an x-rank
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, None), (3.0, 2.0), (4.0, 3.0)],
        "x double, y double")
    r = spearman_by(df, "x", "y").collect()[0]
    assert (r["n"], r["sign"], r["rho2_bp"]) == (3, 1, 10000)


@pytest.mark.parametrize("seed", SEEDS)
def test_spearman_matches_bruteforce_midranks(spark, seed):
    rng = random.Random(seed)
    rows = [(float(rng.randrange(8)), float(rng.randrange(8)))
            for _ in range(40)]  # heavy ties on both axes
    df = spark.createDataFrame(rows, "x double, y double")
    got = spearman_by(df, "x", "y").collect()[0]

    def midranks(vs):
        s = sorted(range(len(vs)), key=lambda i: vs[i])
        out = [0.0] * len(vs)
        i = 0
        while i < len(s):
            j = i
            while j < len(s) and vs[s[j]] == vs[s[i]]:
                j += 1
            mr = (i + 1 + j) / 2
            for k in range(i, j):
                out[s[k]] = mr
            i = j
        return out

    xs = [int(2 * m) for m in midranks([r[0] for r in rows])]
    ys = [int(2 * m) for m in midranks([r[1] for r in rows])]
    n = len(rows)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    num = n * sxy - sx * sy
    dx, dy = n * sxx - sx * sx, n * syy - sy * sy
    assert got["n"] == n
    assert got["sign"] == (1 if num > 0 else -1 if num < 0 else 0)
    assert got["rho2_bp"] == num * num * 10000 // (dx * dy)


# ------------------------------------------------------------- cramers

def test_cramers_v2_bounds_and_undefined(spark):
    perfect = spark.createDataFrame(
        [("a", "x")] * 5 + [("b", "y")] * 7, "u string, v string")
    r = cramers_v2(perfect, "u", "v").collect()[0]
    # chi2_bp is a sum of per-cell floored DIVs, so perfect association
    # reads a few bp under 10000 (documented truncation, never over)
    assert 9998 <= r["v2_bp"] <= 10000
    indep = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")] * 4, "u string, v string")
    assert cramers_v2(indep, "u", "v").collect()[0]["v2_bp"] == 0
    single = spark.createDataFrame([("a", "x"), ("a", "y")], "u string, v string")
    assert cramers_v2(single, "u", "v").collect()[0]["v2_bp"] is None
    grouped = cramers_v2(
        perfect.withColumn("g", F.lit(1)), "u", "v", by=["g"]).collect()
    assert 9998 <= grouped[0]["v2_bp"] <= 10000


# ------------------------------------------------------------- impurity

def test_impurity_decomposition_hand_checked(spark):
    # feature splits 50/50 label -> full reduction
    df = spark.createDataFrame(
        [("f1", 1)] * 3 + [("f2", 0)] * 3, "f string, l int")
    r = impurity_by(df, "f", "l").collect()[0]
    assert (r["parent_gini_bp"], r["child_gini_bp"], r["reduction_bp"]) == (5000, 0, 5000)
    # useless feature: children mirror the parent -> reduction 0
    df2 = spark.createDataFrame(
        [("f1", 1), ("f1", 0), ("f2", 1), ("f2", 0)], "f string, l int")
    r2 = impurity_by(df2, "f", "l").collect()[0]
    assert r2["parent_gini_bp"] == 5000 and r2["reduction_bp"] == 0
    # weighted child: f1=[1,1,0] (gini 4/9), f2=[0] (gini 0), parent [1,1,0,0]
    df3 = spark.createDataFrame(
        [("f1", 1), ("f1", 1), ("f1", 0), ("f2", 0)], "f string, l int")
    r3 = impurity_by(df3, "f", "l").collect()[0]
    # child = (9-5)*10000 DIV (3*4) + (1-1)*10000 DIV (1*4) = 3333
    assert (r3["parent_gini_bp"], r3["child_gini_bp"]) == (5000, 3333)


# ------------------------------------------------------------- drift

def test_dist_drift_summary_detail_and_null_level(spark):
    rows = ([("a", "w1")] * 5 + [("b", "w1")] * 4 + [(None, "w1")] * 1
            + [("a", "w2")] * 8 + [("b", "w2")] * 1 + [(None, "w2")] * 1)
    df = spark.createDataFrame(rows, "cat string, period string")
    s = dist_drift(df, "cat", "period", base="w1", current="w2").collect()[0]
    # shares w1: a 5000, b 4000, null 1000; w2: a 8000, b 1000, null 1000
    assert (s["n_base"], s["n_current"], s["n_categories"]) == (10, 10, 3)
    assert s["tv_bp"] == (3000 + 3000 + 0) // 2
    d = {r["category"]: r for r in dist_drift(
        df, "cat", "period", base="w1", current="w2", detail=True).collect()}
    assert d["a"]["drift_bp"] == 3000 and d["b"]["drift_bp"] == -3000
    assert d[None]["n_base"] == 1 and d[None]["drift_bp"] == 0
    # one empty side -> NULL summary tv
    empty = dist_drift(df.filter(F.col("period") == "w1"),
                       "cat", "period", base="w1", current="w2").collect()[0]
    assert empty["tv_bp"] is None


def test_dist_drift_odd_sum_truncates(spark):
    # ODD Σ|drift_bp| pins the integer-DIV contract: Spark DIV truncates
    # and the oracle's `// 2` must match — a float /2 then CAST would
    # round in DuckDB (7/2→4) and truncate in Spark, a 1-bp divergence
    rows = [("a", "w1"), ("b", "w1"), ("b", "w1"), ("a", "w2")]
    df = spark.createDataFrame(rows, "cat string, period string")
    s = dist_drift(df, "cat", "period", base="w1", current="w2").collect()[0]
    # base shares: a 3333, b 6666; current: a 10000, b 0
    # |drift| = 6667 + 6666 = 13333 (odd) -> tv = 13333 DIV 2 = 6666
    assert s["tv_bp"] == 6666


# ------------------------------------------------------------- woe

def test_woe_table_exact_odds(spark):
    df = spark.createDataFrame(
        [("u", 1)] * 3 + [("u", 0)] * 1 + [("v", 1)] * 1 + [("v", 0)] * 3,
        "f string, l int")
    rows = {r["value"]: r for r in woe_table(df, "f", "l").collect()}
    # u: pos 3/4 of positives, neg 1/4 of negatives -> odds 3.0
    assert rows["u"]["odds_bp"] == 30000 and rows["v"]["odds_bp"] == 3333
    assert rows["u"]["pos_share_bp"] == 7500 and rows["u"]["neg_share_bp"] == 2500
    # value with no negatives -> NULL odds (infinite)
    df2 = spark.createDataFrame([("w", 1), ("z", 0)], "f string, l int")
    rows2 = {r["value"]: r for r in woe_table(df2, "f", "l").collect()}
    assert rows2["w"]["odds_bp"] is None
    # non-binary label raises loudly
    bad = spark.createDataFrame([("u", 3)], "f string, l int")
    with pytest.raises(Exception, match="0/1"):
        woe_table(bad, "f", "l").collect()


# ------------------------------------------------------------- trimmed

def test_trimmed_mean_drops_tails_exactly(spark):
    df = spark.createDataFrame(
        [(1, float(v)) for v in [1, 2, 3, 4, 100]]
        + [(2, float(v)) for v in [10, 20]],
        "g int, v double")
    rows = {r["g"]: r for r in trimmed_mean_by(
        df, "v", by=["g"], trim_bp=2000).collect()}
    assert (rows[1]["n_trimmed_each"], rows[1]["n_kept"]) == (1, 3)
    assert rows[1]["trimmed_mean_cents"] == 300  # mean(2,3,4)
    assert rows[2]["n_trimmed_each"] == 0 and rows[2]["trimmed_mean_cents"] == 1500
    with pytest.raises(ValueError, match="5000"):
        trimmed_mean_by(df, "v", by=["g"], trim_bp=5000)
    with pytest.raises(ValueError, match="grouping keys"):
        trimmed_mean_by(df, "v", by=[])


# --------------------------------------------------------- mann-kendall

def test_mann_kendall_trend_and_guard(spark):
    up = spark.createDataFrame(
        [(1, i, float(i)) for i in range(6)], "g int, t int, v double")
    r = mann_kendall_by(up, "t", "v", by=["g"]).collect()[0]
    assert (r["n_pairs"], r["s"]) == (15, 15)
    down = mann_kendall_by(
        up.withColumn("v", -F.col("v")), "t", "v", by=["g"]).collect()[0]
    assert down["s"] == -15
    flat = mann_kendall_by(
        up.withColumn("v", F.lit(1.0)), "t", "v", by=["g"]).collect()[0]
    assert (flat["s"], flat["n_tie"]) == (0, 15)
    with pytest.raises(Exception, match="max_group_rows"):
        mann_kendall_by(up, "t", "v", by=["g"], max_group_rows=3).collect()
    # single-row group: zero pairs, not a crash
    one = spark.createDataFrame([(9, 0, 1.0)], "g int, t int, v double")
    r1 = mann_kendall_by(one, "t", "v", by=["g"]).collect()[0]
    assert (r1["n"], r1["n_pairs"], r1["s"]) == (1, 0, 0)


@pytest.mark.parametrize("seed", SEEDS)
def test_mann_kendall_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    rows = [(1, t, float(rng.randrange(5))) for t in range(30)]
    df = spark.createDataFrame(rows, "g int, t int, v double")
    got = mann_kendall_by(df, "t", "v", by=["g"]).collect()[0]
    vs = [v for _, _, v in sorted(rows, key=lambda r: r[1])]
    s = sum((vs[j] > vs[i]) - (vs[j] < vs[i])
            for i in range(len(vs)) for j in range(i + 1, len(vs)))
    assert got["s"] == s


# ------------------------------------------------------------- KM

def test_kaplan_meier_classic_table(spark):
    # the textbook example: durations 1,2,2,3 with the 2 censored once
    df = spark.createDataFrame([(1, 1), (2, 1), (2, 0), (3, 1)], "d int, e int")
    rows = {r["t"]: r for r in kaplan_meier(df, "d", "e").collect()}
    assert (rows[1]["n_risk"], rows[1]["n_events"], rows[1]["survival"]) == (4, 1, 0.75)
    assert (rows[2]["n_risk"], rows[2]["n_censored"]) == (3, 1)
    assert rows[2]["survival"] == 0.75 * (2 / 3)
    assert (rows[3]["n_risk"], rows[3]["survival"]) == (1, 0.0)


def test_kaplan_meier_censor_only_times_do_not_step(spark):
    df = spark.createDataFrame([(1, 1), (2, 0), (3, 1)], "d int, e int")
    rows = {r["t"]: r for r in kaplan_meier(df, "d", "e").collect()}
    assert rows[2]["survival"] == rows[1]["survival"]  # censoring only
    assert rows[3]["n_risk"] == 1
    neg = spark.createDataFrame([(-1, 1)], "d int, e int")
    with pytest.raises(Exception, match=">= 0"):
        kaplan_meier(neg, "d", "e").collect()


def test_kaplan_meier_grouped(spark):
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 1), ("b", 5, 0)], "g string, d int, e int")
    rows = {(r["g"], r["t"]): r for r in
            kaplan_meier(df, "d", "e", by=["g"]).collect()}
    assert rows[("a", 1)]["survival"] == 0.5
    assert rows[("a", 2)]["survival"] == 0.0
    assert rows[("b", 5)]["survival"] == 1.0  # censored-only group


# ------------------------------------------------------- changepoint

def test_changepoint_finds_the_shift(spark):
    rows = [(1, i, 10.0) for i in range(6)] + [(1, i, 50.0) for i in range(6, 9)]
    df = spark.createDataFrame(rows, "k int, t int, v double")
    r = changepoint_mean_shift(df, keys=["k"], ts_col="t", value_col="v").collect()[0]
    assert (r["split_idx"], r["split_ts"]) == (6, 5)
    assert (r["mean_left_cents"], r["mean_right_cents"]) == (1000, 5000)
    # constant stream: every split scores 0 -> earliest split wins
    flat = spark.createDataFrame([(1, i, 2.0) for i in range(4)], "k int, t int, v double")
    rf = changepoint_mean_shift(flat, keys=["k"], ts_col="t", value_col="v").collect()[0]
    assert rf["split_idx"] == 1 and int(rf["score"]) == 0
    # single-row key vanishes
    one = spark.createDataFrame([(7, 0, 1.0)], "k int, t int, v double")
    assert changepoint_mean_shift(one, keys=["k"], ts_col="t", value_col="v").count() == 0


@pytest.mark.parametrize("seed", SEEDS)
def test_changepoint_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    vals = [float(rng.randrange(20)) for _ in range(25)]
    df = spark.createDataFrame(
        [(1, t, v) for t, v in enumerate(vals)], "k int, t int, v double")
    got = changepoint_mean_shift(df, keys=["k"], ts_col="t", value_col="v").collect()[0]
    cents = [int(v * 100 + 0.5) for v in vals]
    n, s = len(cents), sum(cents)
    best = None
    for k in range(1, n):
        sl = sum(cents[:k])
        num = (n - k) * sl - k * (s - sl)
        score = num * num // (k * (n - k) * n)
        if best is None or score > best[0]:
            best = (score, k)
    assert (int(got["score"]), got["split_idx"]) == best


def test_merge_count_inversions_matches_bruteforce():
    from docetl_spark.functions.mlstats import _merge_count_inversions
    import numpy as np

    rng = random.Random(7)
    for n in (0, 1, 2, 63, 64, 65, 128, 200, 513):
        seq = np.array([rng.randrange(8) for _ in range(n)], dtype=np.int64)
        want = sum(
            1 for i in range(n) for j in range(i + 1, n) if seq[i] > seq[j])
        assert _merge_count_inversions(seq) == want, n


@pytest.mark.parametrize("seed", SEEDS)
def test_mann_kendall_ties_heavy_bruteforce(spark, seed):
    # heavy ties on BOTH t and v exercise every decomposition term
    rng = random.Random(seed)
    rows = [(1, rng.randrange(6), float(rng.randrange(4))) for _ in range(60)]
    df = spark.createDataFrame(rows, "g int, t int, v double")
    got = mann_kendall_by(df, "t", "v", by=["g"]).collect()[0]
    up = down = tie = np_ = 0
    for i in range(len(rows)):
        for j in range(len(rows)):
            if rows[i][1] < rows[j][1]:
                np_ += 1
                if rows[j][2] > rows[i][2]:
                    up += 1
                elif rows[j][2] < rows[i][2]:
                    down += 1
                else:
                    tie += 1
    assert (got["n_pairs"], got["n_up"], got["n_down"], got["n_tie"],
            got["s"]) == (np_, up, down, tie, up - down)


def test_kendall_and_mk_guard_lifted_past_2000(spark):
    """The old quadratic-join bound was 2000; the O(n log n) rewrite
    must handle a 5000-row group without the guard firing."""
    from docetl_spark.functions.mlstats import kendall_tau_by

    n = 5000
    df = spark.createDataFrame(
        [(1, i, float((i * 37) % 101)) for i in range(n)],
        "g int, t int, v double")
    r = mann_kendall_by(df, "t", "v", by=["g"]).collect()[0]
    assert r["n_pairs"] == n * (n - 1) // 2
    assert r["n_up"] + r["n_down"] + r["n_tie"] == r["n_pairs"]
    k = kendall_tau_by(df, "t", "v", by=["g"]).collect()[0]
    assert k["n_pairs"] == n * (n - 1) // 2
    # t is strictly increasing and v has period-101 ties on a grid:
    # the two decompositions must agree (same pair universe)
    assert k["n_discordant"] == r["n_down"] and k["n_concordant"] == r["n_up"]


def test_changepoint_quotient_overflow_raises_named(spark):
    # n=2, values sized so the 19-digit num guard passes but num² DIV den
    # would exceed Long.MAX (den = 1·1·2): the per-split quotient digit
    # check must fire the NAMED raise, not a generic ANSI overflow (or a
    # NULL score winning the argmax in non-ANSI mode)
    big = 4.0e16  # cents ≈ 4e18: num = 2·|Δ|/... within 19 digits, num²/2 ≫ Long.MAX
    df = spark.createDataFrame(
        [(1, 0, big), (1, 1, -big)], "k int, t int, v double")
    with pytest.raises(Exception, match="changepoint_mean_shift"):
        changepoint_mean_shift(
            df, keys=["k"], ts_col="t", value_col="v").collect()


# ------------------------------------------------------------- sma

def test_sma_crossover_directions(spark):
    vals = [1, 1, 1, 1, 1, 1, 1, 10, 10, 10, 10, 1, 1, 1, 1]
    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate(vals)], "k int, t int, v double")
    rows = sorted(sma_crossover(df, keys=["k"], ts_col="t", value_col="v",
                                short_n=2, long_n=4).collect(),
                  key=lambda r: r["ts"])
    assert [r["direction"] for r in rows] == ["golden", "death"]
    # cross-multiplied comparison: short mean 5.5 vs long 3.25 at the cross
    assert rows[0]["short_mean_cents"] == 550 and rows[0]["long_mean_cents"] == 325
    with pytest.raises(ValueError, match="short_n < long_n"):
        sma_crossover(df, keys=["k"], ts_col="t", value_col="v",
                      short_n=4, long_n=4)


# ------------------------------------------------------------- runs

def test_runs_alternating_vs_blocked(spark):
    alt = spark.createDataFrame(
        [(1, i, float(10 if i % 2 else 0)) for i in range(6)], "k int, t int, v double")
    r = runs_by(alt, keys=["k"], ts_col="t", value_col="v").collect()[0]
    assert (r["n_runs"], r["longest_run"], r["n_above"]) == (6, 1, 3)
    blocked = spark.createDataFrame(
        [(1, i, 0.0) for i in range(3)] + [(1, i, 10.0) for i in range(3, 6)],
        "k int, t int, v double")
    rb = runs_by(blocked, keys=["k"], ts_col="t", value_col="v").collect()[0]
    assert (rb["n_runs"], rb["longest_run"]) == (2, 3)
    # all-equal stream: never strictly above the mean -> one run
    flat = spark.createDataFrame([(1, i, 5.0) for i in range(4)], "k int, t int, v double")
    rfl = runs_by(flat, keys=["k"], ts_col="t", value_col="v").collect()[0]
    assert (rfl["n_runs"], rfl["n_above"]) == (1, 0)


def test_runs_key_named_like_staging_reserved(spark):
    # a key literally named _n or _s used to be silently overwritten by
    # the staging withColumns, corrupting the above-mean test — now
    # staged as _rn_n/_rn_s and both patterns are reserved
    df = spark.createDataFrame(
        [("a", 1, i, float(10 if i % 2 else 0)) for i in range(6)],
        "_n string, k int, t int, v double")
    r = runs_by(df, keys=["_n", "k"], ts_col="t", value_col="v").collect()[0]
    assert (r["n_runs"], r["n_above"]) == (6, 3)
    df2 = df.withColumnRenamed("_n", "_rn_n")
    with pytest.raises(ValueError, match="reserves"):
        runs_by(df2, keys=["_rn_n", "k"], ts_col="t", value_col="v")


# ------------------------------------------------------------- acf

def test_acf_table_matches_single_lag_op(spark):
    from docetl_spark.functions.timeseries import autocorr_lag

    rng = random.Random(5)
    df = spark.createDataFrame(
        [(1, t, float(rng.randrange(50))) for t in range(40)],
        "k int, t int, v double")
    table = {r["lag"]: r for r in acf_table(
        df, keys=["k"], ts_col="t", value_col="v", max_lag=4).collect()}
    for lag in range(1, 5):
        single = autocorr_lag(df, "v", keys=["k"], ts_col="t", lag=lag).collect()[0]
        assert table[lag]["n_pairs"] == single["n_pairs"]
        assert table[lag]["ar_micro"] == single["ar_micro"], lag


# ------------------------------------------------------- entry/exit

def test_session_entry_exit_bounce_accounting(spark):
    rows = [(1, 0, 1, "A"), (1, 5, 2, "B"), (1, 100, 3, "C"), (2, 0, 4, "B")]
    df = spark.createDataFrame(rows, "u int, t long, eid int, page string")
    out = {r["page"]: r for r in session_entry_exit(
        df, keys=["u"], ts_col="t", page_col="page", gap=10,
        tiebreak="eid").collect()}
    assert out["A"]["n_entries"] == 1 and out["A"]["n_bounces"] == 0
    assert out["A"]["n_exits"] == 0 and out["A"]["bounce_bp"] == 0
    assert out["B"]["n_exits"] == 2  # session [A,B] exit + bounce [B]
    assert out["B"]["n_entries"] == 1 and out["B"]["bounce_bp"] == 10000
    assert out["C"]["n_bounces"] == 1
    with pytest.raises(ValueError, match="tiebreak"):
        session_entry_exit(df, keys=["u"], ts_col="t", page_col="page",
                           gap=10, tiebreak="")


# ---------------------------------------------------------- vocab/curr

def test_vocab_growth_curve(spark):
    from docetl_spark.functions.text import vocab_growth

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "d e a"), (4, ""), (5, "f")],
        "doc_id long, text string")
    rows = {r["n_docs"]: r for r in vocab_growth(
        df, "text", id_col="doc_id", step=2).collect()}
    assert rows[2]["cum_tokens"] == 5 and rows[2]["cum_vocab"] == 3
    assert rows[4]["cum_vocab"] == 5  # the empty doc adds nothing
    assert rows[5]["cum_tokens"] == 9 and rows[5]["cum_vocab"] == 6
    assert 1 not in rows and 3 not in rows  # checkpoints only + final


def test_curriculum_order_round_robins_tiers(spark):
    from docetl_spark.functions.training import curriculum_order

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 13)], "id int, score double")
    rows = sorted(curriculum_order(df, "score", id_cols=["id"], n_tiers=3).collect(),
                  key=lambda r: r["position"])
    assert [r["position"] for r in rows] == list(range(1, 13))
    assert [r["tier"] for r in rows] == [1, 2, 3] * 4
    # tier 1 holds the 4 easiest scores
    assert sorted(r["score"] for r in rows if r["tier"] == 1) == [1.0, 2.0, 3.0, 4.0]
    # deterministic across invocations (salted hash, not partition order)
    again = sorted(curriculum_order(df, "score", id_cols=["id"], n_tiers=3).collect(),
                   key=lambda r: r["position"])
    assert [(r["id"], r["position"]) for r in again] == \
        [(r["id"], r["position"]) for r in rows]


# -------------------------------------------------------- kendall tau

def test_kendall_tau_hand_checked(spark):
    from docetl_spark.functions.mlstats import kendall_tau_by

    # perfect agreement
    up = spark.createDataFrame(
        [(1, float(i), float(i * 2)) for i in range(5)], "g int, x double, y double")
    r = kendall_tau_by(up, "x", "y", by=["g"]).collect()[0]
    assert (r["n_pairs"], r["n_concordant"], r["tau_a_bp"]) == (10, 10, 10000)
    # perfect disagreement
    down = kendall_tau_by(
        up.withColumn("y", -F.col("y")), "x", "y", by=["g"]).collect()[0]
    assert (down["n_discordant"], down["tau_a_bp"]) == (10, -10000)
    # ties decompose
    t = spark.createDataFrame(
        [(1, 1.0, 1.0), (1, 1.0, 2.0), (1, 2.0, 2.0)], "g int, x double, y double")
    rt = kendall_tau_by(t, "x", "y", by=["g"]).collect()[0]
    assert rt["n_pairs"] == 3 and rt["n_tie_x"] == 1 and rt["n_tie_y"] == 1
    assert rt["n_concordant"] == 1 and rt["tau_a_bp"] == 3333
    with pytest.raises(Exception, match="max_group_rows"):
        kendall_tau_by(up, "x", "y", by=["g"], max_group_rows=3).collect()


@pytest.mark.parametrize("seed", SEEDS)
def test_kendall_tau_matches_bruteforce(spark, seed):
    from docetl_spark.functions.mlstats import kendall_tau_by

    rng = random.Random(seed)
    rows = [(1, float(rng.randrange(6)), float(rng.randrange(6)))
            for _ in range(30)]
    df = spark.createDataFrame(rows, "g int, x double, y double")
    got = kendall_tau_by(df, "x", "y", by=["g"]).collect()[0]
    conc = disc = 0
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            s = (rows[j][1] - rows[i][1]) * (rows[j][2] - rows[i][2])
            conc += s > 0
            disc += s < 0
    n_pairs = len(rows) * (len(rows) - 1) // 2
    assert (got["n_pairs"], got["n_concordant"], got["n_discordant"]) == \
        (n_pairs, conc, disc)
    num = (conc - disc) * 10000
    assert got["tau_a_bp"] == (num // n_pairs if num >= 0
                               else -((-num) // n_pairs))


# --------------------------------------------------------- theil-sen

def test_theil_sen_robust_to_outlier(spark):
    from docetl_spark.functions.mlstats import theil_sen_by

    # slope 2 cents/t with one wild outlier the median ignores
    rows = [(1, t, 0.02 * t) for t in range(8)] + [(1, 8, 100.0)]
    df = spark.createDataFrame(rows, "g int, t int, v double")
    r = theil_sen_by(df, "t", "v", by=["g"]).collect()[0]
    # slope_milli = Δcents*1000 DIV Δt = 2*1000 = 2000 for clean pairs
    assert r["slope_milli"] == 2000
    assert r["n"] == 9 and r["n_pairs"] == 36
    # single-row group: NULL slope, zero pairs
    one = spark.createDataFrame([(2, 0, 1.0)], "g int, t int, v double")
    r1 = theil_sen_by(one, "t", "v", by=["g"]).collect()[0]
    assert r1["n_pairs"] == 0 and r1["slope_milli"] is None
    # equal-timestamp pairs drop (undefined slope)
    eq = spark.createDataFrame(
        [(3, 5, 1.0), (3, 5, 9.0), (3, 6, 2.0)], "g int, t int, v double")
    re_ = theil_sen_by(eq, "t", "v", by=["g"]).collect()[0]
    assert re_["n_pairs"] == 2


@pytest.mark.parametrize("seed", SEEDS)
def test_theil_sen_matches_bruteforce(spark, seed):
    from docetl_spark.functions.mlstats import theil_sen_by

    rng = random.Random(seed)
    rows = [(1, t, rng.uniform(-5, 5)) for t in range(20)]
    df = spark.createDataFrame(rows, "g int, t int, v double")
    got = theil_sen_by(df, "t", "v", by=["g"]).collect()[0]
    import math
    cents = [(t, math.floor(v * 100 + 0.5)) for _, t, v in rows]
    slopes = []
    for i in range(len(cents)):
        for j in range(i + 1, len(cents)):
            dc = cents[j][1] - cents[i][1]
            dt = cents[j][0] - cents[i][0]
            q = dc * 1000 / dt
            # Spark decimal DIV truncates toward zero
            slopes.append(int(q) if q >= 0 else -int(-q))
    slopes.sort()
    assert got["n_pairs"] == len(slopes)
    assert got["slope_milli"] == slopes[(len(slopes) + 1) // 2 - 1]


# ------------------------------------------------- YAML pipeline specs

def _one_op_pipeline(data, op):
    return {
        "datasets": {"d": {"type": "memory", "data": data}},
        "operations": [op],
        "pipeline": {"steps": [
            {"name": "s", "input": "d", "operations": [op["name"]]}]},
    }


def test_r10_ops_compile_from_yaml_specs(spark):
    """Every round-10 op is pipeline-spec drivable (the COVERAGE.md
    'SemanticFrame verb AND validated YAML op' contract)."""
    from docetl_spark import run_pipeline

    xy = [{"g": 1, "x": float(i), "y": float(i * i), "t": i,
           "id": i, "l": i % 2, "cat": "ab"[i % 2], "p": "wz"[i % 2]}
          for i in range(1, 9)]
    stream = [{"u": 1, "t": i, "v": float(i % 3), "id": i, "page": "AB"[i % 2]}
              for i in range(12)]
    docs = [{"doc_id": i, "text": f"w{i} common", "score": float(i)}
            for i in range(8)]
    km = [{"d": 1, "e": 1}, {"d": 2, "e": 0}, {"d": 3, "e": 1}]

    cases = [
        (xy, {"name": "o", "type": "spearman", "x_col": "x", "y_col": "y"},
         lambda rows: rows[0]["rho2_bp"] == 10000),
        (xy, {"name": "o", "type": "cramers_v2", "col_a": "cat", "col_b": "p"},
         lambda rows: rows[0]["v2_bp"] is not None),
        (xy, {"name": "o", "type": "impurity", "feature_col": "cat",
              "label_col": "l"},
         lambda rows: rows[0]["parent_gini_bp"] == 5000),
        (xy, {"name": "o", "type": "dist_drift", "category_col": "cat",
              "period_col": "p", "base": "w", "current": "z"},
         lambda rows: rows[0]["tv_bp"] is not None),
        (xy, {"name": "o", "type": "woe_table", "feature_col": "cat",
              "label_col": "l"},
         lambda rows: len(rows) == 2),
        (xy, {"name": "o", "type": "trimmed_mean", "value_col": "x",
              "by": ["g"], "trim_bp": 1500},
         lambda rows: rows[0]["n_trimmed_each"] == 1),
        (xy, {"name": "o", "type": "mann_kendall", "ts_col": "t",
              "value_col": "x", "by": ["g"]},
         lambda rows: rows[0]["s"] == rows[0]["n_pairs"]),
        (xy, {"name": "o", "type": "kendall_tau", "x_col": "x",
              "y_col": "y", "by": ["g"]},
         lambda rows: rows[0]["tau_a_bp"] == 10000),
        (xy, {"name": "o", "type": "theil_sen", "ts_col": "t",
              "value_col": "x", "by": ["g"]},
         lambda rows: rows[0]["slope_milli"] == 100000),
        (km, {"name": "o", "type": "kaplan_meier", "duration_col": "d",
              "event_col": "e"},
         lambda rows: len(rows) == 3),
        (stream, {"name": "o", "type": "changepoint_mean_shift",
                  "keys": ["u"], "ts_col": "t", "value_col": "v",
                  "tiebreak": "id"},
         lambda rows: rows[0]["n"] == 12),
        (stream, {"name": "o", "type": "sma_crossover", "keys": ["u"],
                  "ts_col": "t", "value_col": "v", "short_n": 2,
                  "long_n": 4, "tiebreak": "id"},
         lambda rows: all(r["direction"] in ("golden", "death") for r in rows)),
        (stream, {"name": "o", "type": "runs", "keys": ["u"],
                  "ts_col": "t", "value_col": "v", "tiebreak": "id"},
         lambda rows: rows[0]["n_runs"] >= 2),
        (stream, {"name": "o", "type": "acf_table", "keys": ["u"],
                  "ts_col": "t", "value_col": "v", "max_lag": 2,
                  "tiebreak": "id"},
         lambda rows: sorted(r["lag"] for r in rows) == [1, 2]),
        (stream, {"name": "o", "type": "session_entry_exit", "keys": ["u"],
                  "ts_col": "t", "page_col": "page", "gap": 100,
                  "tiebreak": "id"},
         lambda rows: sum(r["n_entries"] for r in rows) == 1),
        (docs, {"name": "o", "type": "vocab_growth", "text_col": "text",
                "id_col": "doc_id", "step": 4},
         lambda rows: rows[-1]["cum_vocab"] == 9),
        (docs, {"name": "o", "type": "curriculum_order",
                "score_col": "score", "id_cols": ["doc_id"], "n_tiers": 2},
         lambda rows: sorted(r["position"] for r in rows) == list(range(1, 9))),
    ]
    for data, op, check in cases:
        out = run_pipeline(spark, _one_op_pipeline(data, op))
        rows = sorted(out.df.collect(), key=lambda r: str(r))
        assert check(rows), (op["type"], rows)
