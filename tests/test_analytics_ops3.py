"""Round-8 analytics/shape additions: data_diff, histogram,
mad_outliers, running_totals, group_concat, time_profile. Registry
oracle parity is covered by test_oracle_gate; these pin semantics on
synthetic edges the testdata doesn't hit."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from docetl_spark.functions.joins import data_diff
from docetl_spark.functions.stats import histogram, mad_outliers, running_totals
from docetl_spark.functions.timeseries import time_profile
from docetl_spark.operators.shape import group_concat


def test_data_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "d", 40)],
        "id long, s string, v long")
    new = spark.createDataFrame(
        [(2, "b", 20), (3, None, 31), (4, "x", 41), (5, "e", 50)],
        "id long, s string, v long")
    out = {r["id"]: r for r in data_diff(old, new, ["id"]).collect()}
    assert out[1]["diff_status"] == "removed" and out[1]["changed_cols"] == []
    assert out[2]["diff_status"] == "unchanged"
    # NULL == NULL is not a change; 30 -> 31 is
    assert out[3]["diff_status"] == "changed" and out[3]["changed_cols"] == ["v"]
    assert out[4]["changed_cols"] == ["s", "v"]
    assert out[5]["diff_status"] == "added"
    # compare subset: v-only diff vanishes
    sub = {r["id"]: r for r in data_diff(old, new, ["id"], compare=["s"]).collect()}
    assert sub[3]["diff_status"] == "unchanged"
    with pytest.raises(ValueError, match="key column"):
        data_diff(old, new.drop("id"), ["id"])


def test_histogram_bins_and_negatives(spark):
    # bin straddling zero must floor toward -inf, not truncate toward 0
    df = spark.createDataFrame(
        [(-1.5,), (-0.5,), (0.5,), (1.5,), (None,)], "v double")
    out = {r["bin_lo"]: r["n_rows"] for r in histogram(
        df, "v", bin_width=1.0).collect()}
    assert out == {-200: 1, -100: 1, 0: 1, 100: 1}
    shares = {r["bin_lo"]: r["share_bp"] for r in histogram(
        df, "v", bin_width=2.0).collect()}
    assert shares == {-200: 5000, 0: 5000}
    g = histogram(df.withColumn("g", F.lit("x")), "v", bin_width=1.0, by=["g"])
    assert g.count() == 4
    with pytest.raises(ValueError, match="bin_width"):
        histogram(df, "v", bin_width=0.001, scale=100)


def test_mad_outliers_robustness(spark):
    # one wild value: mean/stddev z would drag, median/MAD flags it alone
    rows = [(i, float(v)) for i, v in enumerate([10, 11, 12, 11, 10, 11, 1000])]
    df = spark.createDataFrame(rows, "id long, v double")
    out = {r["id"]: r["is_outlier"] for r in mad_outliers(df, "v").collect()}
    assert out[6] is True and sum(out.values()) == 1
    # zero-MAD group: any deviation from the median flags
    z = spark.createDataFrame([(1, 5.0), (2, 5.0), (3, 5.0), (4, 6.0)], "id long, v double")
    zo = {r["id"]: r["is_outlier"] for r in mad_outliers(z, "v").collect()}
    assert zo == {1: False, 2: False, 3: False, 4: True}
    # NULL values flag False; grouped path keeps every row
    g = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", 2.0)], "g string, v double")
    go = mad_outliers(g, "v", by=["g"]).collect()
    assert len(go) == 3 and all(r["is_outlier"] is False for r in go)


def test_running_totals_exact_shares(spark):
    rows = [("u", 1, 1.0), ("u", 2, 2.0), ("u", 3, None), ("u", 4, 1.0), ("w", 1, 0.0)]
    df = spark.createDataFrame(rows, "k string, seq long, v double")
    out = {(r["k"], r["seq"]): r for r in running_totals(
        df, "v", keys=["k"], order_by=["seq"]).collect()}
    assert [out[("u", i)]["cum_value"] for i in (1, 2, 3, 4)] == [100, 300, 300, 400]
    assert out[("u", 4)]["cum_share_bp"] == 10000
    assert out[("u", 1)]["cum_share_bp"] == 2500
    # zero-total key: share NULL, not a division error
    assert out[("w", 1)]["cum_share_bp"] is None


def test_group_concat_sorted_capped(spark):
    df = spark.createDataFrame(
        [("g", "b"), ("g", "a"), ("g", "b"), ("g", None), ("h", None)],
        "k string, s string")
    out = {r["k"]: r for r in group_concat(df, ["k"], "s").collect()}
    assert out["g"]["joined"] == "a,b" and out["g"]["n_values"] == 2
    assert out["h"]["joined"] == "" and out["h"]["n_values"] == 0
    cap = {r["k"]: r for r in group_concat(
        df, ["k"], "s", limit=1, distinct=False, sep="|").collect()}
    assert cap["g"]["joined"] == "a" and cap["g"]["n_values"] == 3


def test_time_profile_dow_hod(spark):
    day = 86_400 * 10**9
    hour = 3_600 * 10**9
    # 1970-01-01 is a Thursday (dow 3); one pre-epoch row lands Wednesday
    rows = [(0,), (day,), (4 * day + 5 * hour,), (-hour,)]
    df = spark.createDataFrame(rows, "ts long")
    out = {(r["dow"], r["hod"]): r["n_rows"] for r in time_profile(df, "ts").collect()}
    assert out[(3, 0)] == 1   # epoch: Thu 00
    assert out[(4, 0)] == 1   # Fri 00
    assert out[(0, 5)] == 1   # Mon 05
    assert out[(2, 23)] == 1  # Wed 23 (pre-epoch floor, not trunc)
    withv = time_profile(
        df.withColumn("v", F.lit(2.0)), "ts",
        aggs={"v_sum": F.sum(F.col("v"))})
    assert withv.columns == ["dow", "hod", "n_rows", "v_sum"]


def test_r8_verbs_and_yaml_specs(spark):
    from docetl_spark import SemanticFrame
    from docetl_spark.plans.compiler import apply_op
    from docetl_spark.plans.ir import OpSpec

    rows = [("a", 1, 100, 1.0), ("a", 2, 5000, 9.0), ("b", 1, 100, 2.0)]
    sf = SemanticFrame.from_df(
        spark.createDataFrame(rows, "k string, seq long, ts long, v double"))
    assert sf.flag_outliers_mad("v").df.columns[-1] == "is_outlier"
    assert sf.histogram("v", bin_width=1.0).df.columns == ["bin_lo", "n_rows", "share_bp"]
    assert sf.running_totals("v", keys=["k"], order_by=["seq"]).count() == 3
    assert sf.group_concat(["k"], "seq").df.columns == ["k", "n_values", "joined"]
    assert sf.time_profile("ts").df.columns == ["dow", "hod", "n_rows"]
    assert sf.diff_against(sf, ["k", "seq"]).df.columns == [
        "k", "seq", "diff_status", "changed_cols"]
    # YAML spec path, incl. the dataset-ref data_diff and expr aggs
    for spec in (
        OpSpec("flag_outliers_mad", {"value_col": "v"}),
        OpSpec("histogram", {"value_col": "v", "bin_width": 1.0}),
        OpSpec("running_totals", {"value_col": "v", "keys": ["k"], "order_by": ["seq"]}),
        OpSpec("group_concat", {"group_cols": ["k"], "value_col": "seq"}),
        OpSpec("time_profile", {"ts_col": "ts", "aggs": {"v_sum": "sum(v)"}}),
    ):
        assert apply_op(sf, spec, {}).df.count() >= 1
    d = apply_op(sf, OpSpec("data_diff", {"right": "newer", "keys": ["k", "seq"]}),
                 {"newer": sf})
    assert d.df.filter(F.col("diff_status") == "unchanged").count() == 3


def test_histogram_weight_col_matches_raw(spark):
    raw = spark.createDataFrame(
        [("a", 0.5), ("a", 0.6), ("a", 1.5), ("b", 0.5)], "g string, v double")
    pre = raw.groupBy("g", "v").agg(F.count(F.lit(1)).alias("w"))
    a = sorted(tuple(r) for r in histogram(raw, "v", bin_width=1.0, by=["g"]).collect())
    b = sorted(tuple(r) for r in histogram(
        pre, "v", bin_width=1.0, by=["g"], weight_col="w").collect())
    assert a == b


def test_stream_running_totals_matches_batch_across_batches(spark, tmp_path):
    """Cross-batch state carry: two single-file micro-batches; every
    key's cum must continue from batch 0 into batch 1."""
    from docetl_spark.streaming import events as stream_ops

    import pandas as pd

    rows = [(i, 1_700_000_000_000_000_000 + i * 10**9, i % 2, float(v) if v is not None else None)
            for i, v in enumerate([1.0, 2.0, None, 4.0, 0.5, 3.0])]
    cols = ["event_id", "ts", "user_id", "value"]
    d = tmp_path / "in"
    d.mkdir()
    pd.DataFrame(rows[:3], columns=cols).to_parquet(d / "b0.parquet")
    pd.DataFrame(rows[3:], columns=cols).to_parquet(d / "b1.parquet")
    stream = stream_ops.read_events_stream(spark, str(d), max_files_per_trigger=1)
    out = stream_ops.running_totals_stateful(
        stream.select("user_id", "ts", "event_id", "value"))
    rows_out = stream_ops.run_available_now(
        out, checkpoint=stream_ops.scratch_checkpoint_dir("ckpt_rt_"),
        output_mode="append", shuffle_partitions=4,
    )
    got = {r["event_id"]: r["cum_value"] for r in rows_out}
    ev = spark.createDataFrame(rows, "event_id long, ts long, user_id long, value double")
    want = {r["event_id"]: r["cum_value"] for r in running_totals(
        ev, "value", keys=["user_id"], order_by=["ts", "event_id"]).collect()}
    assert got == want and len(got) == 6


def test_active_users_rolling_windows(spark):
    from docetl_spark.functions.timeseries import active_users

    D = 100
    # users: u1 active days 0,1; u2 day 0; u3 day 9 (gap days 2-8 quiet)
    rows = [(1, 5), (1, 150), (2, 50), (3, 9 * D + 1), (1, None)]
    df = spark.createDataFrame(rows, "u long, ts long")
    out = {r["day"]: r for r in active_users(
        df, "ts", user_col="u", day_ns=D, windows=(1, 7)).collect()}
    # quiet days manufactured by the fan-out must NOT appear
    assert set(out) == {0, 1, 9}
    assert out[0]["au_1d"] == 2 and out[0]["au_7d"] == 2
    assert out[1]["au_1d"] == 1 and out[1]["au_7d"] == 2
    # day 9: only u3 within 7d (u1's last activity was day 1, 8 days back)
    assert out[9]["au_1d"] == 1 and out[9]["au_7d"] == 1
    with pytest.raises(ValueError, match="windows"):
        active_users(df, "ts", user_col="u", windows=())


def test_mad_outliers_null_group_key_flags(spark):
    """Review r8: a NULL by-key is a real group — the median join must
    be null-safe or every row of that group silently unflags."""
    from docetl_spark.functions.stats import mad_outliers

    rows = [(None, float(v)) for v in list(range(10)) + [1000]]
    df = spark.createDataFrame(rows, "g string, v double")
    assert mad_outliers(df, "v", by=["g"]).filter(F.col("is_outlier")).count() == 1
    # global path must not plan a BroadcastNestedLoopJoin
    plan = mad_outliers(df, "v")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_heavy_hitters_global_no_lingering_cache(spark):
    from docetl_spark.functions.stats import heavy_hitters

    spark.catalog.clearCache()
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "v string")
    rows = {r["value"]: r for r in heavy_hitters(df, "v", top=1).collect()}
    assert rows["a"]["n_rows"] == 2 and rows["__other__"]["n_rows"] == 1
    assert rows["a"]["share_bp"] == 6666
    # the two-action global path must unpersist its scratch cache
    jsc = spark.sparkContext._jsc.sc()
    assert jsc.getPersistentRDDs().size() == 0


def test_fast_decompose_skips_steps_without_target(spark):
    """Review r8: per-step optimize must skip steps that don't contain
    the target map instead of aborting the pipeline."""
    from docetl_spark import FakeBackend, run_pipeline

    be = FakeBackend(rules={"winner": lambda ctx: "A"})
    config = {
        "default_model": "fake",
        "datasets": {"docs": {"type": "memory", "data": [
            {"doc_id": 1, "text": "alpha"}]}},
        "operations": [
            {"type": "code_map", "name": "pre",
             "code": "def transform(d): return {'n_chars': len(d.get('text') or '')}",
             "output": {"schema": {"n_chars": "int"}}},
            {"type": "map", "name": "summ", "prompt": "Summarize {{ input.text }}",
             "output": {"schema": {"summary": "str"}}},
        ],
        "pipeline": {"steps": [
            {"name": "s1", "input": "docs", "operations": ["pre"]},
            {"name": "s2", "operations": ["summ"]},
        ]},
        "optimize": {"method": "fast_decompose", "target": "summ", "sample_size": 1},
    }
    out = run_pipeline(spark, config, backend=be)
    assert out.df.count() == 1


def test_sample_pps_exact_count_and_multiplicity(spark):
    from docetl_spark.functions.training import sample_pps

    rows = [(i, 1.0) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, w double")
    out = sample_pps(df, "w", 5, order_by=["id"]).collect()
    # equal weights: exactly n selections, one copy each
    assert len(out) == 5 and all(r["n_copies"] == 1 for r in out)
    assert sum(r["n_copies"] for r in out) == 5
    # one dominant weight crosses several boundaries -> multiplicity
    heavy = spark.createDataFrame(
        [(1, 1.0), (2, 80.0), (3, 1.0)], "id long, w double")
    h = {r["id"]: r["n_copies"] for r in sample_pps(
        heavy, "w", 4, order_by=["id"]).collect()}
    assert h[2] >= 3 and sum(h.values()) == 4
    # zero/NULL weights never selected; empty-weight strata vanish
    z = spark.createDataFrame(
        [("a", 1, 0.0), ("a", 2, None), ("b", 3, 2.0)], "s string, id long, w double")
    got = sample_pps(z, "w", 2, order_by=["id"], strata=["s"]).collect()
    assert {r["id"] for r in got} == {3}
    with pytest.raises(ValueError, match="order_by"):
        sample_pps(df, "w", 3, order_by=[])


def test_percentile_normalize_exact_bp(spark):
    from docetl_spark.functions.training import percentile_normalize

    rows = [("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 4.0), ("a", None), ("b", 9.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = percentile_normalize(df, "v", by=["g"]).collect()
    got = sorted(
        ((r["g"], r["v"], r["pct_bp"]) for r in out),
        key=lambda t: (t[0], t[1] is not None, t[1] or 0.0),
    )
    # n=4 non-null in a: ranks 1,2,2,4 -> (r-1)*10000 DIV 3
    assert got == [
        ("a", None, None), ("a", 1.0, 0), ("a", 2.0, 3333),
        ("a", 2.0, 3333), ("a", 4.0, 10000), ("b", 9.0, 0),
    ]


def test_merge_rollup_equals_full_recompute(spark):
    from docetl_spark.functions.timeseries import merge_rollup, rollup_state

    aggs = {"n": ("count", "v"), "s": ("sum", "v"),
            "lo": ("min", "v"), "hi": ("max", "v")}
    rows = [(i % 4, float(i) if i % 5 else None) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, v double")
    old = df.filter(F.col("v").isNull() | (F.col("v") < 20))
    new = df.subtract(old)
    merged = merge_rollup(rollup_state(old, ["k"], aggs), new, ["k"], aggs)
    full = rollup_state(df, ["k"], aggs)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
    # delta introduces a brand-new key; base-only keys survive untouched
    extra = spark.createDataFrame([(99, 1.0)], "k long, v double")
    m2 = {r["k"]: r for r in merge_rollup(
        rollup_state(old, ["k"], aggs), extra, ["k"], aggs).collect()}
    assert m2[99]["n"] == 1 and m2[0]["n"] is not None
    with pytest.raises(ValueError, match="not mergeable"):
        rollup_state(df, ["k"], {"a": ("avg", "v")})
    # NULL key is ONE state per side and must merge to ONE row
    nb = spark.createDataFrame([(None, 1.0), (None, 2.0)], "k string, v double")
    nd = spark.createDataFrame([(None, 3.0)], "k string, v double")
    aggs2 = {"n": ("count", "v"), "s": ("sum", "v")}
    m = merge_rollup(rollup_state(nb, ["k"], aggs2), nd, ["k"], aggs2).collect()
    assert len(m) == 1 and m[0]["n"] == 3 and m[0]["s"] == 600


def test_apply_cdc_merge_semantics(spark):
    from docetl_spark.functions.timeseries import apply_cdc

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (None, "n", 0.0)],
        "id long, s string, v double")
    changes = spark.createDataFrame(
        [
            (2, 100, 1, "U", "b2", 21.0),   # update
            (2, 50, 2, "U", "bX", 99.0),    # older change loses
            (3, 100, 3, "D", None, None),   # delete existing
            (4, 100, 4, "I", "d", 40.0),    # insert new key
            (5, 100, 5, "D", None, None),   # delete of a never-seen key
            (None, 100, 6, "U", "n2", 1.0), # NULL key is a real key
        ],
        "id long, ts long, cid long, op string, s string, v double")
    out = {r["id"]: r for r in apply_cdc(
        base, changes, keys=["id"], ts_col="ts", tiebreak="cid").collect()}
    assert set(out) == {1, 2, 4, None}
    assert out[1]["s"] == "a"                       # untouched passthrough
    assert out[2]["s"] == "b2" and out[2]["v"] == 21.0
    assert out[4]["s"] == "d"                       # insert
    assert out[None]["s"] == "n2"                   # null-safe key merge
    with pytest.raises(ValueError, match="missing columns"):
        apply_cdc(base, changes.drop("v"), keys=["id"], ts_col="ts")


def test_state_durations(spark):
    from docetl_spark.functions.timeseries import state_durations

    rows = [
        (1, 0, "idle"), (1, 100, "run"), (1, 250, "idle"), (1, 400, "run"),
        (2, 0, "run"),  # dangling only
    ]
    df = spark.createDataFrame(rows, "k long, ts long, st string")
    out = {(r["k"], r["state"]): r for r in state_durations(
        df, keys=["k"], ts_col="ts", state_col="st").collect()}
    assert out[(1, "idle")]["total_ns"] == 100 + 150
    assert out[(1, "idle")]["n_visits"] == 2
    assert out[(1, "run")]["total_ns"] == 150  # final run visit dangles
    assert out[(2, "run")]["total_ns"] is None and out[(2, "run")]["n_visits"] == 1


def test_debounce_gap_semantics(spark):
    from docetl_spark.functions.timeseries import debounce

    rows = [(1, 0, 1), (1, 50, 2), (1, 100, 3), (1, 250, 4), (2, 10, 5)]
    df = spark.createDataFrame(rows, "k long, ts long, eid long")
    kept = sorted(r["eid"] for r in debounce(
        df, keys=["k"], ts_col="ts", min_gap_ns=100, tiebreak="eid").collect())
    # gap vs previous RAW event: 0 keeps, 50 drops (gap 50), 100 keeps
    # (gap 50 vs raw prev at 50... no: gap 100-50=50 -> drops), 250 keeps
    assert kept == [1, 4, 5]
    with pytest.raises(ValueError, match="min_gap_ns"):
        debounce(df, keys=["k"], ts_col="ts", min_gap_ns=0)


def test_throttle_earliest_k_per_window(spark):
    from docetl_spark.functions.timeseries import throttle

    rows = [(1, t, i) for i, t in enumerate([0, 1, 2, 9, 10, 11, 12])] + [(2, 5, 99)]
    df = spark.createDataFrame(rows, "k long, ts long, eid long")
    kept = sorted(r["eid"] for r in throttle(
        df, keys=["k"], ts_col="ts", window_ns=10,
        max_per_window=2, tiebreak="eid").collect())
    # window [0,10): events 0,1,2,9 -> keep first 2 (eid 0,1);
    # window [10,20): 10,11,12 -> keep 4,5; key 2 keeps its only event
    assert kept == [0, 1, 4, 5, 99]


def test_edit_distance_pairs_prefix_and_suffix_blocks(spark):
    from docetl_spark.functions.dedup import edit_distance_pairs

    rows = [(1, "cold gear"), (2, "Cold Gears"), (3, "red gear"),
            (4, "bolt"), (5, "colt"), (6, None)]
    df = spark.createDataFrame(rows, "id int, t string")
    # prefix mode: (1,2) share 'cold' (case/space-normalized, d=1);
    # (4,5) diverge at char 2 -> NOT candidates under prefix blocking
    pre = {(r["id_a"], r["id_b"]): r["distance"] for r in
           edit_distance_pairs(df, "id", "t", max_distance=1, prefix_len=4).collect()}
    assert pre == {(1, 2): 1}
    # suffix mode: 'gear(s)' tails — (1,3) differ by 3 > d, (1,2) share
    # nothing at the tail ('gear' vs 'ears')
    suf = {(r["id_a"], r["id_b"]): r["distance"] for r in
           edit_distance_pairs(df, "id", "t", max_distance=3, prefix_len=4,
                               block="suffix").collect()}
    assert (1, 3) in suf and suf[(1, 3)] == 3


def test_edit_distance_pairs_length_bucket_adjacency(spark):
    from docetl_spark.functions.dedup import edit_distance_pairs

    # lengths 9 and 10 land in different DIV-2 buckets; the adjacent-
    # bucket explode is what lets them meet (and exactly once)
    rows = [(1, "abcdefghi"), (2, "abcdefghij")]
    df = spark.createDataFrame(rows, "id int, t string")
    out = edit_distance_pairs(df, "id", "t", max_distance=1, prefix_len=4).collect()
    assert len(out) == 1 and out[0]["distance"] == 1


def test_edit_distance_pairs_validates(spark):
    from docetl_spark.functions.dedup import edit_distance_pairs

    df = spark.createDataFrame([(1, "x")], "id int, t string")
    with pytest.raises(ValueError, match="'prefix' or 'suffix'"):
        edit_distance_pairs(df, "id", "t", block="middle")
    with pytest.raises(ValueError, match="unblocked"):
        edit_distance_pairs(df, "id", "t", prefix_len=0)
