"""Time-series operators: as-of join, binned range join, time rollup."""

import pytest
from pyspark.sql import functions as F

from docetl_spark.functions import timeseries as ts


def test_asof_backward_matches_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 205, "b"), (2, 150, "c"), (3, 50, "d")],
        ["k", "t", "lv"],
    )
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 200, 20.0), (1, 300, 30.0), (2, 149, 5.0)],
        ["k", "t", "rv"],
    )
    out = {
        (r["k"], r["t"]): (r["rv_r"], r["t_r"])
        for r in ts.asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t", right_cols=["rv"]
        ).collect()
    }
    assert out[(1, 100)] == (10.0, 100)   # exact ts matches
    assert out[(1, 205)] == (20.0, 200)   # latest at-or-before
    assert out[(2, 150)] == (5.0, 149)
    assert out[(3, 50)] == (None, None)   # no right rows for key


def test_asof_forward_and_tolerance(spark):
    left = spark.createDataFrame([(1, 100), (1, 260)], ["k", "t"])
    right = spark.createDataFrame([(1, 140, "x"), (1, 500, "y")], ["k", "t", "rv"])
    fwd = {
        r["t"]: (r["rv_r"], r["t_r"])
        for r in ts.asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t",
            right_cols=["rv"], direction="forward", tolerance=100,
        ).collect()
    }
    assert fwd[100] == ("x", 140)          # within 100
    assert fwd[260] == (None, None)        # nearest after is 500, gap 240 > 100


def test_asof_join_plan_has_no_join(spark):
    left = spark.createDataFrame([(1, 100)], ["k", "t"])
    right = spark.createDataFrame([(1, 90, 1.0)], ["k", "t", "rv"])
    plan = ts.asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t", right_cols=["rv"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union + window only: one exchange, no join


def test_range_join_binned_no_duplicates(spark):
    points = spark.createDataFrame(
        [(1, 10), (1, 3600), (1, 7199), (1, 7200), (2, 100)], ["k", "t"]
    )
    iv = spark.createDataFrame(
        [(1, 0, 7200, "w1"), (1, 7200, 7300, "w2"), (2, 0, 50, "w3"), (2, 60, 60, "wEmpty")],
        ["k", "s", "e", "name"],
    )
    rows = ts.range_join(
        points, iv, point_ts="t", start_ts="s", end_ts="e", on=["k"], bin_width=3600
    ).select("k", "t", "name").collect()
    got = sorted((r["k"], r["t"], r["name"]) for r in rows)
    assert got == [(1, 10, "w1"), (1, 3600, "w1"), (1, 7199, "w1"), (1, 7200, "w2")]
    plan_ok = ts.range_join(points, iv, point_ts="t", start_ts="s", end_ts="e", on=["k"], bin_width=3600)
    plan = plan_ok._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_time_rollup_grains_consistent(spark):
    rows = [(i, 86400 + 60 * i, float(i)) for i in range(180)]  # 3 hours of minutes
    df = spark.createDataFrame(rows, ["id", "e", "v"])
    out = ts.time_rollup(df, "e", {"total": F.sum("v"), "n": F.count(F.lit(1))})
    grains = {r["grain"]: r for r in out.collect() if r["grain"] == "all"}
    assert grains["all"]["n"] == 180 and grains["all"]["total"] == sum(range(180))
    by_grain = out.groupBy("grain").agg(F.sum("n").alias("n")).collect()
    gn = {r["grain"]: r["n"] for r in by_grain}
    assert gn["minute"] == gn["hour"] == gn["day"] == gn["all"] == 180  # each grain partitions all rows
    hours = [r for r in out.collect() if r["grain"] == "hour"]
    assert len(hours) == 3 or len(hours) == 4  # 180 minutes spanning 3-4 hour buckets


def test_asof_join_matches_bruteforce_property(spark):
    """Randomized check vs a per-row brute-force reference."""
    import random

    rng = random.Random(11)
    lrows = [(rng.randint(1, 5), rng.randint(0, 1000), i) for i in range(120)]
    rrows = [(rng.randint(1, 5), rng.randint(0, 1000), 100 + i, float(i)) for i in range(80)]
    left = spark.createDataFrame(lrows, ["k", "t", "lid"])
    right = spark.createDataFrame(rrows, ["k", "t", "rid", "rv"])

    got = {
        r["lid"]: (r["rv_r"], r["t_r"])
        for r in ts.asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t",
            right_cols=["rv"], right_tiebreak="rid", tolerance=300,
        ).collect()
    }
    assert len(got) == len(lrows)
    for k, t, lid in lrows:
        cands = [(rt, rid, rv) for (rk, rt, rid, rv) in rrows if rk == k and rt <= t and t - rt <= 300]
        if not cands:
            assert got[lid] == (None, None), (lid, got[lid])
        else:
            best = max(cands)  # latest ts, then max rid (tiebreak: last wins)
            assert got[lid] == (best[2], best[0]), (lid, got[lid], best)


def test_asof_hot_key_bucketed_identical_to_default(spark):
    """The skew escape hatch (hot_key_bucket) must produce EXACTLY the
    default plan's rows — both directions, with tolerance, tiebreaks,
    cross-bucket carry (buckets with no right rows), and a null right
    value that lets an older row's value show through."""
    import random

    rng = random.Random(23)
    lrows = [(rng.randint(1, 4), rng.randint(0, 2000), i) for i in range(200)]
    rrows = [
        (rng.randint(1, 4), rng.randint(0, 2000), 100 + i,
         None if i % 7 == 0 else float(i))
        for i in range(120)
    ]
    left = spark.createDataFrame(lrows, ["k", "t", "lid"])
    right = spark.createDataFrame(rrows, ["k", "t", "rid", "rv"])

    for direction in ("backward", "forward"):
        for tol in (None, 150):
            kw = dict(on=["k"], left_ts="t", right_ts="t", right_cols=["rv", "rid"],
                      right_tiebreak="rid", direction=direction, tolerance=tol)
            base = {r["lid"]: (r["rv_r"], r["rid_r"], r["t_r"])
                    for r in ts.asof_join(left, right, **kw).collect()}
            for width in (64, 5000):  # many small buckets; one giant bucket
                bucketed = {r["lid"]: (r["rv_r"], r["rid_r"], r["t_r"])
                            for r in ts.asof_join(left, right, hot_key_bucket=width, **kw).collect()}
                assert bucketed == base, (direction, tol, width)

    # bucketed windows partition by (key, bucket): the physical plan must
    # not contain a window partitioned by the bare key over the unioned
    # data (the single-task-per-key shape) for the final pass
    out = ts.asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                       right_cols=["rv"], hot_key_bucket=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_bkt" in plan

    import pytest as _pytest

    with _pytest.raises(ValueError, match="hot_key_bucket"):
        ts.asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                     right_cols=["rv"], hot_key_bucket=0)


def test_asof_bucketed_exact_at_ns_boundaries(spark):
    """Bucket assignment must be LONG floor division: double-precision
    division misbuckets epoch-ns values near bucket boundaries (e.g.
    472399*3600e9 - 1 floors UP through a double), silently dropping the
    match the default plan returns."""
    W = 3_600_000_000_000  # 1h in ns
    base = 472_398 * W
    # right at the end of bucket 472398; left at the start of 472399
    rows_r = [(1, base + W - 1, 7, 1.0)]
    rows_l = [(1, base + W, 100), (1, base + W - 1, 101)]
    left = spark.createDataFrame(rows_l, ["k", "t", "lid"])
    right = spark.createDataFrame(rows_r, ["k", "t", "rid", "rv"])
    kw = dict(on=["k"], left_ts="t", right_ts="t", right_cols=["rv"],
              right_tiebreak="rid")
    want = {r["lid"]: r["rv_r"] for r in ts.asof_join(left, right, **kw).collect()}
    got = {r["lid"]: r["rv_r"]
           for r in ts.asof_join(left, right, hot_key_bucket=W, **kw).collect()}
    assert want == {100: 1.0, 101: 1.0}
    assert got == want


def test_range_join_matches_bruteforce_property(spark):
    import random

    rng = random.Random(13)
    prow = [(rng.randint(1, 4), rng.randint(0, 500), i) for i in range(100)]
    irow = []
    for i in range(40):
        s = rng.randint(0, 480)
        irow.append((rng.randint(1, 4), s, s + rng.randint(0, 90), i))
    points = spark.createDataFrame(prow, ["k", "t", "pid"])
    iv = spark.createDataFrame(irow, ["k", "s", "e", "iid"])
    got = sorted(
        (r["pid"], r["iid"])
        for r in ts.range_join(points, iv, point_ts="t", start_ts="s", end_ts="e", on=["k"], bin_width=64).collect()
    )
    want = sorted(
        (pid, iid)
        for (pk, t, pid) in prow
        for (ik, s, e, iid) in irow
        if pk == ik and s <= t < e
    )
    assert got == want


def test_range_join_exact_at_ns_boundaries(spark):
    """Bin assignment must be long floor division (double misbins epoch-ns
    near bin boundaries, cf. the asof hot-key fix)."""
    W = 3_600_000_000_000
    b = 472_399 * W
    points = spark.createDataFrame([(1, b - 1, 0), (1, b, 1)], ["k", "t", "pid"])
    iv = spark.createDataFrame([(1, b - 10, b, 0), (1, b, b + 10, 1)], ["k", "s", "e", "iid"])
    got = sorted((r["pid"], r["iid"]) for r in ts.range_join(
        points, iv, point_ts="t", start_ts="s", end_ts="e", on=["k"],
        bin_width=W).collect())
    # p0 (t=b-1) is in [b-10, b) only; p1 (t=b) is in [b, b+10) only
    assert got == [(0, 0), (1, 1)]


def _rows_set(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_sessionize_bucketed_identical_to_default(spark):
    """Bucketed sessionize must reproduce the default plan exactly:
    sessions spanning bucket boundaries, sparse (empty) buckets, equal
    timestamps at a boundary, and a hot key owning most rows."""
    import random

    rng = random.Random(7)
    rows = []
    eid = 0
    # hot key: 300 events in bursts (sessions) across a wide span
    t = 0
    for _ in range(300):
        t += rng.choice([5, 20, 50, 2_000, 9_000])  # mixes gaps > and < 1800
        rows.append(("hot", t, eid)); eid += 1
    # sparse keys: few events with huge gaps (empty buckets between)
    for k in range(5):
        t = rng.randrange(100)
        for _ in range(rng.randrange(1, 8)):
            rows.append((f"u{k}", t, eid)); eid += 1
            t += rng.choice([10, 1800, 1801, 100_000])
    # boundary ties: two events at the exact bucket edge
    rows += [("edge", 7200, eid), ("edge", 7200, eid + 1), ("edge", 7201, eid + 2)]
    df = spark.createDataFrame(rows, ["user_id", "e", "event_id"])

    base = ts.sessionize(df, keys=["user_id"], ts_col="e", gap=1800, tiebreak="event_id")
    for width in (600, 1800, 7200, 86_400):
        b = ts.sessionize(
            df, keys=["user_id"], ts_col="e", gap=1800,
            tiebreak="event_id", hot_key_bucket=width,
        )
        assert _rows_set(b, ["user_id", "event_id", "session_id"]) == _rows_set(
            base, ["user_id", "event_id", "session_id"]
        ), f"bucketed sessionize diverged at width={width}"


def test_sessionize_bucketed_plan_windows_by_bucket(spark):
    """The heavy (per-row) windows of the bucketed plan partition by
    (key, _bkt); only the tiny bucket-summary window may use the bare
    key."""
    df = spark.createDataFrame([("u", 1, 1), ("u", 2, 2)], ["user_id", "e", "event_id"])
    out = ts.sessionize(df, keys=["user_id"], ts_col="e", gap=10,
                        tiebreak="event_id", hot_key_bucket=100)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    import re

    for m in re.finditer(r"Window \[([^\]]*)\], \[([^\]]*)\], \[([^\]]*)\]", plan):
        exprs, part = m.group(1), m.group(2)
        if "_sts" in m.group(3):  # row-level window (ordered by the row ts)
            assert "_bkt" in part, (exprs, part)


def test_sessionize_bucketed_keeps_null_keys_and_timestamps(spark):
    """NULL key / NULL ts rows group like any value in the default plan's
    windows; the bucketed plan's summary join-back must be null-safe or
    those rows vanish (code-review r6 finding, reproduced before fix)."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("user_id", T.StringType()),
        T.StructField("e", T.LongType()),
        T.StructField("event_id", T.LongType()),
    ])
    rows = [("u", 100, 1), ("u", 10_000, 2), (None, 100, 3), (None, 5_000, 4),
            ("v", None, 5), (None, None, 6)]
    df = spark.createDataFrame(rows, schema)
    base = ts.sessionize(df, keys=["user_id"], ts_col="e", gap=1800, tiebreak="event_id")
    b = ts.sessionize(df, keys=["user_id"], ts_col="e", gap=1800,
                      tiebreak="event_id", hot_key_bucket=3600)
    want = _rows_set(base, ["user_id", "event_id", "session_id"])
    got = _rows_set(b, ["user_id", "event_id", "session_id"])
    assert len(got) == len(rows), f"bucketed plan dropped rows: {got}"
    assert got == want


def test_hot_key_bucket_fractional_width_rejected(spark):
    """0 < width < 1 must raise, not truncate to a divide-by-zero bucket
    expression."""
    import pytest as _pytest

    df = spark.createDataFrame([("u", 1, 1)], ["user_id", "e", "event_id"])
    with _pytest.raises(ValueError, match="positive"):
        ts.sessionize(df, keys=["user_id"], ts_col="e", gap=10,
                      tiebreak="event_id", hot_key_bucket=0.5)
    with _pytest.raises(ValueError, match="positive"):
        ts.asof_join(df, df, on=["user_id"], left_ts="e", right_ts="e",
                     right_cols=["event_id"], hot_key_bucket=0.5)


# ------------------------------------------------------- rolling features
def test_rolling_features_semantics(spark):
    from docetl_spark.functions import timeseries

    rows = [
        # user 1: ts 0, 10, 20, 30 with values 1..4
        (1, 1, 0, 1.0), (2, 1, 10, 2.0), (3, 1, 20, 3.0), (4, 1, 30, 4.0),
        # user 2: single event
        (5, 2, 100, 9.0),
        # ts tie inside user 3 -> event_id breaks it
        (6, 3, 50, 1.0), (7, 3, 50, 2.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "v"])
    out = timeseries.rolling_features(
        df, "ts", keys=["user_id"],
        value_aggs={"v_sum": F.sum("v")},
        lookback_rows=3, tiebreak=["event_id"],
    )
    got = {r["event_id"]: r for r in out.collect()}
    assert [got[i]["event_idx"] for i in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert got[1]["prev_ts"] is None and got[2]["prev_ts"] == 0
    # trailing-3 frame: event 4 sees values 2+3+4, not 1
    assert got[4]["v_sum"] == 9.0 and got[4]["rolling_n"] == 3
    assert got[3]["v_sum"] == 6.0 and got[1]["v_sum"] == 1.0
    assert got[5]["rolling_n"] == 1 and got[5]["prev_ts"] is None
    # tie broken by event_id: 6 before 7
    assert got[6]["event_idx"] == 1 and got[7]["event_idx"] == 2
    assert got[7]["prev_ts"] == 50


def test_rolling_features_single_window_spec(spark):
    """All features must share one window: exactly one Exchange/Sort in
    the plan (one shuffle, one sort — the operator's scale contract)."""
    from docetl_spark.functions import timeseries

    df = spark.createDataFrame([(1, 1, 0, 1.0)], ["event_id", "user_id", "ts", "v"])
    out = timeseries.rolling_features(
        df, "ts", keys=["user_id"], value_aggs={"v_sum": F.sum("v")},
        tiebreak=["event_id"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
    assert "Window" in plan


def test_rolling_features_validates_args(spark):
    from docetl_spark.functions import timeseries
    import pytest as _pytest

    df = spark.createDataFrame([(1, 1, 0, 1.0)], ["event_id", "user_id", "ts", "v"])
    with _pytest.raises(ValueError):
        timeseries.rolling_features(df, "ts", keys=["user_id"], lookback_rows=0)
    # output-name collision raises instead of silently overwriting
    clash = df.withColumnRenamed("v", "rolling_n")
    with _pytest.raises(ValueError, match="rolling_n"):
        timeseries.rolling_features(clash, "ts", keys=["user_id"])
    with _pytest.raises(ValueError, match="v_sum"):
        timeseries.rolling_features(
            df.withColumnRenamed("v", "v_sum"), "ts", keys=["user_id"],
            value_aggs={"v_sum": F.sum("v_sum")},
        )


def test_rolling_features_bucketed_equivalence(spark):
    """hot_key_bucket must be results-IDENTICAL to the default plan:
    random timelines with ties, sparse buckets, null ts and null keys,
    swept over bucket widths and lookbacks."""
    import random

    from docetl_spark.functions import timeseries

    rng = random.Random(23)
    rows = []
    for i in range(400):
        uid = rng.choice([1, 1, 1, 1, 2, 3, None])  # hot key + null key
        ts = rng.choice([None] if rng.random() < 0.03 else [rng.randrange(0, 5000)])
        rows.append((i, uid, ts, float(i % 7)))
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long, v double")

    def run(**kw):
        out = timeseries.rolling_features(
            df, "ts", keys=["user_id"],
            value_aggs={"v_sum": F.sum("v")},
            tiebreak=["event_id"], **kw,
        )
        return sorted(
            (r["event_id"], r["event_idx"], r["prev_ts"], r["rolling_n"], r["v_sum"])
            for r in out.collect()
        )

    for k in (1, 3, 10):
        want = run(lookback_rows=k)
        for width in (1, 7, 400, 10_000):
            assert run(lookback_rows=k, hot_key_bucket=width) == want, (k, width)


def test_rolling_features_bucketed_rejects_bad_width(spark):
    from docetl_spark.functions import timeseries
    import pytest as _pytest

    df = spark.createDataFrame([(1, 1, 0, 1.0)], ["event_id", "user_id", "ts", "v"])
    with _pytest.raises(ValueError):
        timeseries.rolling_features(df, "ts", keys=["user_id"], hot_key_bucket=0)


def test_rolling_features_bucketed_equivalence_timestamp_ts(spark):
    """Sub-second TIMESTAMP ts: bucket assignment may truncate to whole
    seconds but ORDERING must use the raw timestamp, or events inside
    the same second would tie in the bucketed path only."""
    from docetl_spark.functions import timeseries

    rows = [
        # three events inside the same second, deliberately out of
        # event_id order so a truncated sort would scramble them
        (1, 1, "2024-01-01 00:00:01.900", 1.0),
        (2, 1, "2024-01-01 00:00:01.100", 2.0),
        (3, 1, "2024-01-01 00:00:01.500", 3.0),
        (4, 1, "2024-01-01 00:00:05.250", 4.0),
        (5, 2, "2024-01-01 00:00:01.750", 5.0),
    ]
    df = (
        spark.createDataFrame(rows, "event_id long, user_id long, ts string, v double")
        .withColumn("ts", F.to_timestamp("ts"))
    )

    def run(**kw):
        out = timeseries.rolling_features(
            df, "ts", keys=["user_id"],
            value_aggs={"v_sum": F.sum("v")},
            lookback_rows=2, tiebreak=["event_id"], **kw,
        )
        return sorted(
            (r["event_id"], r["event_idx"], r["prev_ts"], r["rolling_n"], r["v_sum"])
            for r in out.collect()
        )

    want = run()
    # event order must be 2 (.1s), 3 (.5s), 1 (.9s), 4 — by RAW ts
    by_id = {e: idx for (e, idx, *_rest) in want}
    assert by_id[2] == 1 and by_id[3] == 2 and by_id[1] == 3 and by_id[4] == 4
    for width in (1, 2, 60):
        assert run(hot_key_bucket=width) == want, width


def test_rolling_features_bucketed_internal_clash_raises(spark):
    from docetl_spark.functions import timeseries
    import pytest as _pytest

    df = spark.createDataFrame([(1, 1, 0, 1.0)], ["event_id", "user_id", "ts", "_bkt"])
    with _pytest.raises(ValueError, match="_bkt"):
        timeseries.rolling_features(df, "ts", keys=["user_id"], hot_key_bucket=10)


# ------------------------------------------------------------- funnels


def test_funnel_ordering_enforced(spark):
    from docetl_spark.functions.timeseries import funnel

    # u1 completes in order; u2 purchases BEFORE clicking (step 3 must
    # not count); u3 only views
    rows = [
        (1, "u1", 100, "view"), (2, "u1", 200, "click"), (3, "u1", 300, "purchase"),
        (4, "u2", 100, "view"), (5, "u2", 150, "purchase"), (6, "u2", 200, "click"),
        (7, "u3", 100, "view"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    out = {r["user_id"]: r for r in funnel(
        df, ["view", "click", "purchase"], tiebreak="event_id").collect()}
    assert out["u1"]["reached"] == 3 and out["u1"]["step3_ts"] == 300
    assert out["u2"]["reached"] == 2 and out["u2"]["step3_ts"] is None
    assert out["u3"]["reached"] == 1 and out["u3"]["step2_ts"] is None


def test_funnel_same_ts_counts_via_tiebreak_order(spark):
    from docetl_spark.functions.timeseries import funnel

    # click at the SAME ts as view: the running min sees the view row
    # first only when the tiebreak orders it first
    rows = [(1, "u", 100, "view"), (2, "u", 100, "click")]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    out = funnel(df, ["view", "click"], tiebreak="event_id").collect()[0]
    assert out["reached"] == 2 and out["step2_ts"] == 100
    # reversed ids: click row sorts before the view -> never qualifies
    rows = [(2, "u", 100, "view"), (1, "u", 100, "click")]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    out = funnel(df, ["view", "click"], tiebreak="event_id").collect()[0]
    assert out["reached"] == 1 and out["step2_ts"] is None


def test_funnel_single_shuffle_plan(spark):
    from pyspark.sql import functions as F

    from docetl_spark.functions.timeseries import funnel

    df = spark.range(100).select(
        F.col("id").alias("event_id"), (F.col("id") % 10).alias("user_id"),
        F.col("id").alias("ts"),
        F.when(F.col("id") % 3 == 0, "view").otherwise("click").alias("event_type"),
    )
    plan = funnel(df, ["view", "click"], tiebreak="event_id")._jdf.queryExecution().executedPlan().toString()
    # the k chained window columns + final agg must share ONE
    # hash-partitioning on user_id: exactly one exchange, no joins
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan


def test_funnel_rejects_empty_steps(spark):
    import pytest as _pytest

    from docetl_spark.functions.timeseries import funnel

    df = spark.createDataFrame([(1, "u", 1, "view")], ["event_id", "user_id", "ts", "event_type"])
    with _pytest.raises(ValueError):
        funnel(df, [])


# ------------------------------------------------------ hopping windows


def test_hopping_rollup_overlap_count(spark):
    from pyspark.sql import functions as F

    from docetl_spark.functions.timeseries import hopping_rollup

    # one event at ts=10_000 with every=1000, size=4000 -> exactly 4
    # windows: starts 7000..10000
    df = spark.createDataFrame([(10_000, 1.0)], ["ts", "value"])
    out = hopping_rollup(
        df, {"n": F.count(F.lit(1))}, ts_col="ts", every_ns=1000, size_ns=4000
    ).collect()
    assert sorted(r["window_start"] for r in out) == [7000, 8000, 9000, 10000]
    assert all(r["n"] == 1 for r in out)


def test_hopping_rollup_window_membership_exact(spark):
    """Every event counts in window s iff s <= ts < s + size."""
    from pyspark.sql import functions as F

    from docetl_spark.functions.timeseries import hopping_rollup

    rows = [(t,) for t in [0, 999, 1000, 3999, 4000, 7500]]
    df = spark.createDataFrame(rows, ["ts"])
    out = {
        (r["window_start"]): r["n"]
        for r in hopping_rollup(
            df, {"n": F.count(F.lit(1))}, ts_col="ts", every_ns=1000, size_ns=2000
        ).collect()
    }
    # brute force
    want = {}
    for (t,) in rows:
        for s in range(((t // 1000) - 1) * 1000, (t // 1000) * 1000 + 1, 1000):
            if s <= t < s + 2000:
                want[s] = want.get(s, 0) + 1
    assert out == want


def test_hopping_rollup_validates_params(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from docetl_spark.functions.timeseries import hopping_rollup

    df = spark.createDataFrame([(1,)], ["ts"])
    for every, size in [(0, 1000), (1000, 0), (1000, 2500)]:
        with _pytest.raises(ValueError):
            hopping_rollup(df, {"n": F.count(F.lit(1))}, ts_col="ts",
                           every_ns=every, size_ns=size)


# ---------------------------------------------------------------- gap_fill

def test_gap_fill_dense_grid_and_locf(spark):
    # key 1: buckets 0,1,4 observed -> grid 0..4, gaps 2,3 carry bucket-1 sum
    df = spark.createDataFrame(
        [(1, 5, 10), (1, 15, 20), (1, 42, 7), (2, 30, 1)],
        ["k", "t", "v"],
    )
    out = ts.gap_fill(
        df, "t", keys=["k"], bucket_width=10,
        aggs={"n": F.count(F.lit(1)), "s": F.sum("v")}, locf_cols=["s"],
    )
    rows = {(r["k"], r["bucket_start"]): (r["n"], r["s"], r["s_filled"])
            for r in out.collect()}
    assert rows[(1, 0)] == (1, 10, 10)
    assert rows[(1, 10)] == (1, 20, 20)
    assert rows[(1, 20)] == (None, None, 20)   # gap: locf carries 20
    assert rows[(1, 30)] == (None, None, 20)
    assert rows[(1, 40)] == (1, 7, 7)
    assert rows[(2, 30)] == (1, 1, 1)          # single-bucket key: no gaps
    assert len(rows) == 6


def test_gap_fill_negative_ts_floor(spark):
    # pre-epoch: -5 must land in bucket [-10, 0), not [0, 10)
    df = spark.createDataFrame([(1, -5, 1), (1, 14, 2)], ["k", "t", "v"])
    out = ts.gap_fill(df, "t", keys=["k"], bucket_width=10,
                      aggs={"n": F.count(F.lit(1))})
    starts = sorted(r["bucket_start"] for r in out.collect())
    assert starts == [-10, 0, 10]


def test_gap_fill_validates_args(spark):
    df = spark.createDataFrame([(1, 1, 1)], ["k", "t", "v"])
    import pytest
    with pytest.raises(ValueError, match="aggs"):
        ts.gap_fill(df, "t", keys=["k"], bucket_width=10, aggs={})
    with pytest.raises(ValueError, match="locf_cols"):
        ts.gap_fill(df, "t", keys=["k"], bucket_width=10,
                    aggs={"n": F.count(F.lit(1))}, locf_cols=["nope"])
    with pytest.raises(ValueError, match="bucket_width"):
        ts.gap_fill(df, "t", keys=["k"], bucket_width=0,
                    aggs={"n": F.count(F.lit(1))})


# ------------------------------------------------------- time_weighted_avg

def test_time_weighted_avg_trapezoid(spark):
    # v: 0 at t=0, 10 at t=10, 10 at t=20
    # segments: (0+10)/2*10 = 50, (10+10)/2*10 = 100 -> 150/20 = 7.5
    df = spark.createDataFrame([(1, 0, 0), (1, 10, 10), (1, 20, 10)],
                               ["k", "t", "v"])
    r = ts.time_weighted_avg(df, "t", "v", keys=["k"]).collect()[0]
    assert r["twa"] == 7.5
    assert r["n_samples"] == 3
    assert r["duration"] == 20


def test_time_weighted_avg_single_sample_falls_back_to_mean(spark):
    df = spark.createDataFrame([(1, 5, 42), (2, 0, 1), (2, 0, 3)],
                               ["k", "t", "v"])
    rows = {r["k"]: r["twa"]
            for r in ts.time_weighted_avg(
                df, "t", "v", keys=["k"], order_cols=["v"]).collect()}
    assert rows[1] == 42.0        # single sample
    assert rows[2] == 2.0         # zero duration -> plain mean


def test_time_weighted_avg_irregular_sampling_weights_by_interval(spark):
    # constant 100 for a long interval then a brief 0 spike: twa near 100,
    # plain mean would say 50
    df = spark.createDataFrame([(1, 0, 100), (1, 90, 100), (1, 100, 0)],
                               ["k", "t", "v"])
    r = ts.time_weighted_avg(df, "t", "v", keys=["k"]).collect()[0]
    assert r["twa"] == (100 * 90 + 50 * 10) / 100.0  # 95.0


# -------------------------------------------------------- cohort_retention

def test_cohort_retention_matrix(spark):
    # period 10: u1 first p0 active p0,p1,p2; u2 first p0 active p0,p2;
    # u3 first p1 active p1
    rows = [(1, 1), (1, 12), (1, 25), (2, 3), (2, 22), (3, 15), (3, 16)]
    df = spark.createDataFrame(rows, ["u", "t"])
    out = {(r["cohort_period"], r["period_offset"]):
           (r["n_active"], r["cohort_size"], r["retention_pct"])
           for r in ts.cohort_retention(df, "t", "u", period=10).collect()}
    assert out[(0, 0)] == (2, 2, 100.0)
    assert out[(0, 1)] == (1, 2, 50.0)
    assert out[(0, 2)] == (2, 2, 100.0)
    assert out[(10, 0)] == (1, 1, 100.0)
    assert len(out) == 4


def test_cohort_retention_validates_period(spark):
    import pytest
    df = spark.createDataFrame([(1, 1)], ["u", "t"])
    with pytest.raises(ValueError, match="period"):
        ts.cohort_retention(df, "t", "u", period=0)


def test_time_weighted_avg_rejects_float_values(spark):
    import pytest
    df = spark.createDataFrame([(1, 0, 1.5)], ["k", "t", "v"])
    with pytest.raises(TypeError, match="integral"):
        ts.time_weighted_avg(df, "t", "v", keys=["k"])


def test_gap_fill_reserved_name_collision(spark):
    import pytest
    df = spark.createDataFrame([(1, 1, 1)], ["k", "t", "bucket_start"])
    with pytest.raises(ValueError, match="reserves"):
        ts.gap_fill(df, "t", keys=["k"], bucket_width=10,
                    aggs={"n": F.count(F.lit(1))})
    # locf output name clashing with an input column
    df3 = spark.createDataFrame([(1, 1, 1, 0)], ["k", "t", "s", "s_filled"])
    with pytest.raises(ValueError, match="reserves"):
        ts.gap_fill(df3, "t", keys=["k"], bucket_width=10,
                    aggs={"s": F.sum("s")}, locf_cols=["s"])


def test_gap_fill_linear_interpolation(spark):
    # key 1: s=10 at bucket 0, s=40 at bucket 3 -> gaps 1,2 get 20, 30
    df = spark.createDataFrame([(1, 5, 10), (1, 35, 40)], ["k", "t", "v"])
    out = ts.gap_fill(df, "t", keys=["k"], bucket_width=10,
                      aggs={"s": F.sum("v")}, interp_cols=["s"])
    rows = {r["bucket_start"]: r["s_interp"] for r in out.collect()}
    assert rows == {0: 10.0, 10: 20.0, 20: 30.0, 30: 40.0}


def test_gap_fill_interp_one_sided_edges(spark):
    # s observed only at bucket 1 (middle of the n-driven grid): buckets
    # before it fall back to the next value, after it to the previous
    df = spark.createDataFrame(
        [(1, 5, None), (1, 15, 7), (1, 25, None)], ["k", "t", "v"]
    )
    out = ts.gap_fill(df, "t", keys=["k"], bucket_width=10,
                      aggs={"s": F.sum("v")}, interp_cols=["s"])
    rows = {r["bucket_start"]: r["s_interp"] for r in out.collect()}
    assert rows == {0: 7.0, 10: 7.0, 20: 7.0}


def test_gap_fill_locf_and_interp_same_column(spark):
    df = spark.createDataFrame([(1, 0, 0), (1, 20, 20)], ["k", "t", "v"])
    out = ts.gap_fill(df, "t", keys=["k"], bucket_width=10,
                      aggs={"s": F.sum("v")},
                      locf_cols=["s"], interp_cols=["s"])
    rows = {r["bucket_start"]: (r["s_filled"], r["s_interp"])
            for r in out.collect()}
    assert rows[10] == (0, 10.0)   # locf holds, interpolation bridges


def test_gap_fill_interp_validates(spark):
    import pytest
    df = spark.createDataFrame([(1, 1, 1)], ["k", "t", "v"])
    with pytest.raises(ValueError, match="interp_cols"):
        ts.gap_fill(df, "t", keys=["k"], bucket_width=10,
                    aggs={"n": F.count(F.lit(1))}, interp_cols=["x"])
    df2 = spark.createDataFrame([(1, 1, 1, 2.0)], ["k", "t", "v", "s_interp"])
    with pytest.raises(ValueError, match="reserves"):
        ts.gap_fill(df2, "t", keys=["k"], bucket_width=10,
                    aggs={"s": F.sum("v")}, interp_cols=["s"])


# ── round-9 ops ──────────────────────────────────────────────────


def test_interval_union_merges_overlaps(spark):
    from docetl_spark.functions.timeseries import interval_union

    rows = [("a", 0, 10), ("a", 5, 20), ("a", 20, 25),   # one island (touching merges)
            ("a", 40, 50),                                # second island
            ("b", 0, 0)]                                  # zero-length
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = {r["k"]: r for r in interval_union(df, keys=["k"], start_col="s", end_col="e").collect()}
    assert out["a"]["n_intervals"] == 4 and out["a"]["n_merged"] == 2
    assert out["a"]["covered_ns"] == 25 + 10 and out["a"]["span_ns"] == 50
    assert out["b"]["covered_ns"] == 0 and out["b"]["n_merged"] == 1


def test_interval_union_contained_interval(spark):
    from docetl_spark.functions.timeseries import interval_union

    # second interval entirely inside the first: running-max over PRECEDING
    # (not lag) is what keeps the third from opening a false island
    rows = [("a", 0, 100), ("a", 10, 20), ("a", 30, 40)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    r = interval_union(df, keys=["k"], start_col="s", end_col="e").collect()[0]
    assert r["n_merged"] == 1 and r["covered_ns"] == 100


def test_interval_union_rejects_corrupt(spark):
    from docetl_spark.functions.timeseries import interval_union

    df = spark.createDataFrame([("a", 10, 5)], "k string, s long, e long")
    with pytest.raises(Exception, match="end < start"):
        interval_union(df, keys=["k"], start_col="s", end_col="e").collect()
    dfn = spark.createDataFrame([("a", None, 5)], "k string, s long, e long")
    with pytest.raises(Exception, match="NULL start/end"):
        interval_union(dfn, keys=["k"], start_col="s", end_col="e").collect()


def test_session_paths_order_and_ties(spark):
    from docetl_spark.functions.timeseries import session_paths

    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "d"),
            (2, 1, "a"), (2, 2, "b"),
            (3, 5, "x"), (3, 6, None)]
    df = spark.createDataFrame(rows, "sid long, ts long, st string")
    out = [(r["path"], r["n_sessions"], r["rank"]) for r in
           session_paths(df, session_keys=["sid"], state_col="st", ts_col="ts",
                         max_len=3, top=10).collect()]
    assert out[0] == ("a>b", 1, 1) or out[0][2] == 1
    paths = {p for p, _, _ in out}
    assert "a>b>c" in paths            # max_len truncates the 4th state
    assert "x>null" in paths           # NULL state stays visible


def test_autocorr_lag_perfect_ar1(spark):
    from docetl_spark.functions.timeseries import autocorr_lag

    # v_t = v_{t-1} exactly -> AR coefficient 1.0 (1_000_000 micro)
    rows = [("a", t, 5.0) for t in range(6)]
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    r = autocorr_lag(df, "v", keys=["k"], ts_col="ts").collect()[0]
    assert r["n_pairs"] == 5 and r["ar_micro"] is None  # zero variance -> NULL

    rows2 = [("a", t, float(2 * t)) for t in range(6)]
    df2 = spark.createDataFrame(rows2, "k string, ts long, v double")
    r2 = autocorr_lag(df2, "v", keys=["k"], ts_col="ts").collect()[0]
    assert r2["ar_micro"] == 1_000_000  # linear series: slope exactly 1


def test_null_runs_counts_runs(spark):
    from docetl_spark.functions.timeseries import null_runs

    rows = [("a", 1, None), ("a", 2, None), ("a", 3, 1.0), ("a", 4, None),
            ("b", 1, 1.0)]
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    out = {r["k"]: r for r in null_runs(df, "v", keys=["k"], ts_col="ts").collect()}
    assert out["a"]["n_nulls"] == 3 and out["a"]["n_runs"] == 2 and out["a"]["max_run"] == 2
    assert out["b"]["n_nulls"] == 0 and out["b"]["n_runs"] == 0 and out["b"]["max_run"] == 0


def test_changepoint_cusum_detects_level_shift(spark):
    from docetl_spark.functions.timeseries import changepoint_cusum

    # flat at 10 then a +100 level shift: alarms only after the shift
    rows = [("a", t, 10.0) for t in range(10)] + [("a", t, 110.0) for t in range(10, 20)]
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    out = {r["ts"]: r["alarm"] for r in
           changepoint_cusum(df, "v", keys=["k"], ts_col="ts", threshold=30.0).collect()}
    assert not any(out[t] for t in range(10))
    assert out[19]  # cusum accumulated well past the threshold by the end


def test_changepoint_cusum_matches_recursion(spark):
    import random

    from docetl_spark.functions.timeseries import changepoint_cusum

    rng = random.Random(7)
    vals = [round(rng.uniform(-50, 50), 2) for _ in range(40)]
    rows = [("a", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    got = {r["ts"]: r["cusum_milli"] for r in
           changepoint_cusum(df, "v", keys=["k"], ts_col="ts", threshold=10.0).collect()}
    # naive recursion on n-scaled integers, then the same milli projection
    import math
    cents = [int(math.floor(v * 100 + 0.5)) for v in vals]
    n, sx = len(cents), sum(cents)
    s = 0
    for t, c in enumerate(cents):
        s = max(0, s + (c * n - sx))
        assert got[t] == (s * 1000) // (n * 100), f"t={t}"


def test_period_over_period_adjacency_guard(spark):
    from docetl_spark.functions.timeseries import period_over_period

    W = 100
    rows = [("a", 10, 1.0), ("a", 110, 3.0),            # adjacent buckets
            ("a", 350, 5.0)]                            # gap: bucket 300, prev 200 empty
    df = spark.createDataFrame(rows, "g string, ts long, v double")
    out = {r["bucket_ns"]: r for r in
           period_over_period(df, "ts", "v", width_ns=W, by=["g"]).collect()}
    assert out[0]["prev_cents"] is None
    assert out[100]["prev_cents"] == 100 and out[100]["delta_cents"] == 200
    assert out[100]["pct_change_bp"] == 20000
    assert out[300]["prev_cents"] is None and out[300]["pct_change_bp"] is None


def test_period_over_period_zero_prev(spark):
    from docetl_spark.functions.timeseries import period_over_period

    rows = [("a", 10, 0.0), ("a", 110, 3.0)]
    df = spark.createDataFrame(rows, "g string, ts long, v double")
    r = {x["bucket_ns"]: x for x in
         period_over_period(df, "ts", "v", width_ns=100, by=["g"]).collect()}
    assert r[100]["prev_cents"] == 0 and r[100]["pct_change_bp"] is None


def test_cohort_values_ltv_curve(spark):
    from docetl_spark.functions.timeseries import cohort_values

    W = 100
    rows = [  # user 1 first seen period 0, active 0 and 2; user 2 first seen period 1
        (1, 10, 1.0), (1, 50, 2.0), (1, 210, 4.0),
        (2, 110, 10.0), (2, 150, None),
    ]
    df = spark.createDataFrame(rows, "u long, ts long, v double")
    out = {(r["cohort_ns"], r["age"]): r for r in
           cohort_values(df, entity_col="u", ts_col="ts", value_col="v",
                         width_ns=W).collect()}
    assert out[(0, 0)]["period_cents"] == 300 and out[(0, 0)]["n_entities"] == 1
    assert (0, 1) not in out                      # inactive age rows absent
    assert out[(0, 2)]["period_cents"] == 400 and out[(0, 2)]["cum_cents"] == 700
    assert out[(100, 0)]["period_cents"] == 1000  # NULL value counts 0
    assert out[(100, 0)]["n_entities"] == 1


def test_cohort_values_validates(spark):
    from docetl_spark.functions.timeseries import cohort_values

    df = spark.createDataFrame([(1, 1, 1.0)], "u long, ts long, v double")
    with pytest.raises(ValueError, match="positive"):
        cohort_values(df, entity_col="u", ts_col="ts", value_col="v", width_ns=0)


def test_funnel_within_ns_conversion_window(spark):
    from docetl_spark.functions.timeseries import funnel

    rows = [  # user 1: click inside the window, purchase outside it
        (1, 0, "view"), (1, 50, "click"), (1, 200, "purchase"),
        # user 2: everything inside
        (2, 0, "view"), (2, 10, "click"), (2, 20, "purchase"),
        # user 3: a SECOND view inside the window must not re-anchor
        (3, 0, "view"), (3, 90, "view"), (3, 150, "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    out = {r["user_id"]: r for r in
           funnel(df, ["view", "click", "purchase"], within_ns=100).collect()}
    assert out[1]["reached"] == 2 and out[1]["step3_ts"] is None
    assert out[2]["reached"] == 3
    # user 3's click at 150 is outside [0, 100] of the FIRST view
    assert out[3]["reached"] == 1
    # without the window, all three complete further
    plain = {r["user_id"]: r["reached"] for r in
             funnel(df, ["view", "click", "purchase"]).collect()}
    assert plain[1] == 3 and plain[3] == 2
