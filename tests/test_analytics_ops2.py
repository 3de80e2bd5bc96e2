"""Round-7 analytics/shape additions: streaks, attribution, heavy
hitters, robust outliers, melt, JSON extraction, tf-df keywords.
Registry-level oracle parity is covered by test_oracle_gate; these pin
the operator semantics on synthetic edges the testdata doesn't hit."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from docetl_spark.functions.stats import heavy_hitters, robust_outliers
from docetl_spark.functions.timeseries import attribute_conversions, streaks
from docetl_spark.functions.text import tfdf_keywords
from docetl_spark.operators.shape import json_extract_columns, melt


def test_streaks_islands_and_min_buckets(spark):
    W = 10
    rows = [(1, b * W + off) for b in (0, 1, 2, 5, 6) for off in (1, 7)] + [(2, 3 * W)]
    df = spark.createDataFrame(rows, "user_id long, ts long")
    out = {
        (r["user_id"], r["streak_start"]): r
        for r in streaks(df, "ts", keys=["user_id"], bucket_width=W).collect()
    }
    assert len(out) == 3
    a = out[(1, 0)]
    assert (a["streak_end"], a["n_buckets"], a["n_events"]) == (20, 3, 6)
    b = out[(1, 50)]
    assert (b["streak_end"], b["n_buckets"], b["n_events"]) == (60, 2, 4)
    assert out[(2, 30)]["n_buckets"] == 1
    kept = streaks(df, "ts", keys=["user_id"], bucket_width=W, min_buckets=2).count()
    assert kept == 2


def test_streaks_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, 1)], "user_id long, ts long")
    with pytest.raises(ValueError):
        streaks(df, "ts", keys=[], bucket_width=10)
    with pytest.raises(ValueError):
        streaks(df, "ts", keys=["user_id"], bucket_width=0)


def _attr_events(spark):
    # user 1: click@10, view@20, purchase@25 (last=view, first=click
    # inside horizon 20); user 2: click@1, purchase@100 (outside h=20)
    rows = [
        (101, 1, 10, "click"), (102, 1, 20, "view"), (103, 1, 25, "purchase"),
        (104, 2, 1, "click"), (105, 2, 100, "purchase"),
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts long, event_type string")


def test_attribution_last_and_first_touch(spark):
    ev = _attr_events(spark)
    last = {r["event_id"]: r for r in attribute_conversions(
        ev, conversion_type="purchase", touch_types=["click", "view"],
        horizon=20, tiebreak="event_id", carry_cols=["event_id"],
    ).collect()}
    assert last[103]["touch_type"] == "view" and last[103]["lag_ns"] == 5
    assert last[105]["touch_ts"] is None and last[105]["lag_ns"] is None

    first = {r["event_id"]: r for r in attribute_conversions(
        ev, conversion_type="purchase", touch_types=["click", "view"],
        horizon=20, model="first_touch", tiebreak="event_id",
        carry_cols=["event_id"],
    ).collect()}
    # window [5, 25]: click@10 is the first touch
    assert first[103]["touch_type"] == "click" and first[103]["lag_ns"] == 15
    assert first[105]["touch_ts"] is None


def test_attribution_rejects_bad_model(spark):
    ev = _attr_events(spark)
    with pytest.raises(ValueError):
        attribute_conversions(ev, conversion_type="purchase",
                              touch_types=["click"], horizon=1, model="shapley")


def test_heavy_hitters_other_rollup_and_shares(spark):
    rows = [("g", v) for v in ["a"] * 5 + ["b"] * 3 + ["c"] * 1 + ["d"] * 1]
    df = spark.createDataFrame(rows, "grp string, v string")
    out = {r["value"]: r for r in heavy_hitters(
        df, "v", by=["grp"], top=2).collect()}
    assert out["a"]["rank"] == 1 and out["a"]["n_rows"] == 5
    assert out["a"]["share_bp"] == 5000
    assert out["__other__"]["rank"] == 3 and out["__other__"]["n_rows"] == 2
    assert out["__other__"]["share_bp"] == 2000
    no_other = heavy_hitters(df, "v", by=["grp"], top=2, with_other=False)
    assert no_other.count() == 2


def test_robust_outliers_flags_and_edges(spark):
    # 20 inliers + one 100x value: z = |1000-57|/216 = 4.4 > 3
    # (with only 4 inliers the outlier inflates stddev to z=1.8 — not
    # flagged, correctly)
    rows = [("a", float(v)) for v in [10] * 20 + [1000]] + [
        ("b", 5.0),            # n=1: never flags
        (None, 3.0), (None, 3.0),  # NULL group key must survive (zero variance)
        ("a", None),           # NULL value: false, not NULL
    ]
    df = spark.createDataFrame(rows, "grp string, value double")
    out = robust_outliers(df, "value", by=["grp"]).collect()
    flags = {(r["grp"], r["value"]): r["is_outlier"] for r in out}
    assert len(out) == len(rows)  # null-safe join keeps every row
    assert flags[("a", 1000.0)] is True
    assert flags[("a", 10.0)] is False
    assert flags[("b", 5.0)] is False
    assert flags[(None, 3.0)] is False
    assert flags[("a", None)] is False


def test_melt_roundtrips_wide_row(spark):
    df = spark.createDataFrame([(1, 10, 20)], "id long, x long, y long")
    out = melt(df, ["id"], ["x", "y"], var_name="m", value_name="v")
    got = {(r["id"], r["m"]): r["v"] for r in out.collect()}
    assert got == {(1, "x"): 10, (1, "y"): 20}
    with pytest.raises(ValueError):
        melt(df, ["id"], [])
    with pytest.raises(ValueError):
        melt(df, ["id"], ["nope"])


def test_json_extract_nulls_on_garbage(spark):
    rows = [('{"k": 7, "u": {"n": "ann"}}',), ("not json",), (None,), ('{"k": "x"}',)]
    df = spark.createDataFrame(rows, "props string")
    out = json_extract_columns(
        df, "props", {"k": "k:long", "name": "u.n"}, drop_source=True
    ).collect()
    assert out[0].__fields__ == ["k", "name"]
    # exactly one row yields k=7, one yields name='ann'; garbage -> NULLs
    vals = [(r["k"], r["name"]) for r in out]
    assert (7, "ann") in vals
    assert sum(1 for k, n in vals if k is None) == 3  # 'x' fails try_cast too


def test_tfdf_keywords_ranks_rare_terms_first(spark):
    rows = [
        (1, "common rare common"),
        (2, "common common other"),
        (3, "common filler words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfdf_keywords(df, "text", id_col="doc_id", top=2)
    top1 = {r["doc_id"]: r["term"] for r in out.collect() if r["rank"] == 1}
    # 'rare' (df=1) outranks 'common' (df=3) in doc 1 despite lower tf
    assert top1[1] == "rare"
    with pytest.raises(ValueError):
        tfdf_keywords(df, "text", id_col="doc_id", top=0)


def test_changelog_to_scd2_compression_and_intervals(spark):
    from docetl_spark.functions.timeseries import changelog_to_scd2

    rows = [
        (1, 10, "a", 100), (1, 20, "a", 101),  # no-op update compresses
        (1, 30, "b", 102), (1, 40, None, 103), (1, 50, None, 104),  # NULL run = one version
        (2, 5, "x", 200),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, attr string, eid long")
    out = changelog_to_scd2(df, keys=["k"], ts_col="ts", attrs=["attr"],
                            tiebreak="eid")
    got = sorted(
        ((r["k"], r["valid_from"], r["attr"], r["valid_to"], r["is_current"])
         for r in out.collect())
    )
    assert got == [
        (1, 10, "a", 30, False),
        (1, 30, "b", 40, False),
        (1, 40, None, None, True),
        (2, 5, "x", None, True),
    ]
    # compress=False keeps every changelog row as a version
    assert changelog_to_scd2(df, keys=["k"], ts_col="ts", attrs=["attr"],
                             tiebreak="eid", compress=False).count() == 6
    with pytest.raises(ValueError):
        changelog_to_scd2(df, keys=["k"], ts_col="ts", attrs=["k"])


def test_winsorize_clips_at_exact_bounds(spark):
    from docetl_spark.functions.stats import winsorize

    vals = list(range(1, 101))  # p5 interpolates to 5.95, p95 to 95.05
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    out = {r["x"]: r["x_w"] for r in winsorize(
        df, "x", lower=0.05, upper=0.95).collect()}
    import math

    def q(p):  # exact_quantiles' own arithmetic, ulp-for-ulp
        pos = (100 - 1) * p
        f = pos - math.floor(pos)
        v_lo, v_hi = vals[math.floor(pos)], vals[math.ceil(pos)]
        return (1.0 - f) * v_lo + f * v_hi

    lo, hi = q(0.05), q(0.95)
    assert out[1] == lo and out[3] == lo
    assert out[100] == hi and out[99] == hi
    assert out[50] == 50.0
    with pytest.raises(ValueError):
        winsorize(df, "x", lower=0.9, upper=0.1)


def test_heavy_hitters_global_no_spurious_other(spark):
    from docetl_spark.functions.stats import heavy_hitters

    df = spark.createDataFrame([("a",), ("a",), ("b",)], "v string")
    rows = heavy_hitters(df, "v", top=5).collect()
    # <= top distinct values: the empty global tail must NOT emit a
    # ('__other__', NULL, NULL) row (review-pass repro)
    assert sorted(r["value"] for r in rows) == ["a", "b"]
    assert all(r["n_rows"] is not None and r["share_bp"] is not None for r in rows)
    with pytest.raises(ValueError):
        heavy_hitters(df, "v", by=["rank"])


def test_gap_fill_null_ts_key_skipped_not_crashed(spark):
    from docetl_spark.functions.timeseries import gap_fill

    df = spark.createDataFrame(
        [(1, 10, 1), (1, 30, 1), (2, None, 1)], "k long, ts long, c long"
    )
    out = gap_fill(df, "ts", keys=["k"], bucket_width=10,
                   aggs={"n": F.count(F.lit(1))}, max_buckets_per_key=100)
    rows = out.collect()
    # key 2 (all-NULL ts) drops silently, the pre-guard behavior; the
    # guard itself still fires with a NAMED message on a real outlier
    assert {r["k"] for r in rows} == {1}
    bad = spark.createDataFrame([(1, 0, 1), (1, 10**15, 1)], "k long, ts long, c long")
    with pytest.raises(Exception, match="max_buckets_per_key"):
        gap_fill(bad, "ts", keys=["k"], bucket_width=10,
                 aggs={"n": F.count(F.lit(1))}, max_buckets_per_key=100).collect()


def test_heavy_hitters_weight_col_matches_raw(spark):
    from docetl_spark.functions.stats import heavy_hitters

    raw = spark.createDataFrame(
        [("g", v) for v in ["a"] * 5 + ["b"] * 3 + ["c"] * 2],
        "grp string, v string",
    )
    pre = raw.groupBy("grp", "v").count()
    a = sorted(tuple(r) for r in heavy_hitters(raw, "v", by=["grp"], top=2).collect())
    b = sorted(tuple(r) for r in heavy_hitters(
        pre, "v", by=["grp"], top=2, weight_col="count").collect())
    assert a == b


def test_ewma_recurrence_nulls_and_edges(spark):
    from docetl_spark.functions.timeseries import ewma

    rows = [
        (1, 1, 10.0), (1, 2, 20.0), (1, 3, None),  # NULL dropped from fold
        (2, 1, 5.0),                               # single value: ewma = x0
        (3, 1, None),                              # all-NULL: n=0, ewma NULL
    ]
    df = spark.createDataFrame(rows, "k long, ts long, v double")
    out = {r["k"]: r for r in ewma(df, "ts", "v", keys=["k"], alpha=0.5).collect()}
    assert out[1]["n"] == 2 and out[1]["ewma"] == 10.0 * 0.5 + 20.0 * 0.5
    assert out[2]["n"] == 1 and out[2]["ewma"] == 5.0
    assert out[3]["n"] == 0 and out[3]["ewma"] is None
    with pytest.raises(ValueError):
        ewma(df, "ts", "v", keys=["k"], alpha=0.0)
    with pytest.raises(ValueError):
        ewma(df, "ts", "v", keys=[], alpha=0.5)


def test_transitions_counts_consecutive_pairs(spark):
    from docetl_spark.functions.timeseries import transitions

    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (2, 1, "a")]
    df = spark.createDataFrame(rows, "k long, ts long, s string")
    out = {(r["from_state"], r["to_state"]): r["n"] for r in transitions(
        df, keys=["k"], ts_col="ts", state_col="s").collect()}
    # user 2's single event contributes nothing
    assert out == {("a", "b"): 1, ("b", "b"): 1}
    with pytest.raises(ValueError):
        transitions(df, keys=[], ts_col="ts", state_col="s")


def test_quantile_buckets_global_matches_ntile(spark):
    from docetl_spark.functions.stats import quantile_buckets

    df = spark.createDataFrame([(i,) for i in range(1, 8)], "x long")
    # grouped path on a constant group == Spark's own ntile
    grouped = quantile_buckets(
        df.withColumn("g", F.lit(1)), "x", 3, by=["g"], tiebreak=["x"]
    ).select("x", "bucket")
    global_ = quantile_buckets(df, "x", 3, tiebreak=["x"])
    a = sorted((r["x"], r["bucket"]) for r in grouped.collect())
    b = sorted((r["x"], r["bucket"]) for r in global_.collect())
    assert a == b  # the closed form IS the NTILE assignment
    assert [x[1] for x in a] == [1, 1, 1, 2, 2, 3, 3]  # first bucket gets the extra
    with pytest.raises(ValueError):
        quantile_buckets(df, "x", 0)
    # the divergent case the one-liner (rank-1)*k DIV n + 1 gets wrong:
    # 10 rows / 4 buckets -> NTILE sizes (3,3,2,2), the one-liner's
    # (3,2,3,2) interleaves big and small buckets
    df10 = spark.createDataFrame([(i,) for i in range(1, 11)], "x long")
    g10 = quantile_buckets(
        df10.withColumn("g", F.lit(1)), "x", 4, by=["g"], tiebreak=["x"]
    ).select("x", "bucket")
    gl10 = quantile_buckets(df10, "x", 4, tiebreak=["x"])
    assert sorted((r["x"], r["bucket"]) for r in g10.collect()) == \
        sorted((r["x"], r["bucket"]) for r in gl10.collect())
    sizes = {}
    for r in gl10.collect():
        sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
    assert [sizes[b] for b in sorted(sizes)] == [3, 3, 2, 2]
    # n < buckets: NTILE gives bucket == rank, no skipped ids
    df2 = spark.createDataFrame([(1,), (2,)], "x long")
    got = sorted(r["bucket"] for r in quantile_buckets(
        df2, "x", 10, tiebreak=["x"]).collect())
    assert got == [1, 2]


def test_salted_join_result_identical(spark):
    from docetl_spark.functions.joins import salted_join

    left = spark.createDataFrame(
        [(k, i) for k in (1, 1, 1, 2, 3) for i in range(2)], "k long, li long"
    )
    right = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k long, rv string")
    plain = sorted(tuple(r) for r in left.join(right, "k").collect())
    salted = sorted(tuple(r) for r in salted_join(left, right, ["k"], salt=4).collect())
    assert plain == salted
    plain_l = sorted(tuple(r) for r in left.join(right, "k", "left").collect())
    salted_l = sorted(tuple(r) for r in salted_join(left, right, ["k"], salt=4, how="left").collect())
    assert plain_l == salted_l
    with pytest.raises(ValueError):
        salted_join(left, right, ["k"], salt=2, how="outer")
    with pytest.raises(ValueError):
        salted_join(left, right, ["nope"], salt=2)


def test_ngram_stats_counts_repeats_and_short_docs(spark):
    from docetl_spark.functions.text import ngram_stats

    rows = [(1, "a b a b"), (2, "a b"), (3, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["gram"]: (r["tf"], r["df"]) for r in ngram_stats(
        df, "text", id_col="doc_id", n=2).collect()}
    # doc 1: "a b","b a","a b" -> tf(a b)=2 there; doc 3 (<2 tokens) emits nothing
    assert out == {"a b": (3, 2), "b a": (1, 1)}


def test_snapshot_latest_keeps_one_per_key(spark):
    from docetl_spark.functions.timeseries import snapshot_latest

    rows = [(1, 10, "a", 1), (1, 20, "b", 2), (1, 20, "c", 3), (2, 5, "x", 4)]
    df = spark.createDataFrame(rows, "k long, ts long, v string, eid long")
    out = {r["k"]: r for r in snapshot_latest(
        df, keys=["k"], ts_col="ts", tiebreak="eid").collect()}
    assert out[1]["v"] == "c"  # ts tie broken by eid desc
    assert out[2]["v"] == "x"
    with pytest.raises(ValueError):
        snapshot_latest(df, keys=[], ts_col="ts")


def test_interval_join_exactly_once_pairs(spark):
    from docetl_spark.functions.timeseries import interval_join

    # left interval spans MANY bins; right overlaps it across several —
    # the canonical-bin rule must emit the pair exactly once
    left = spark.createDataFrame(
        [(1, 0, 100, "L1"), (1, 200, 210, "L2"), (2, 0, 50, "L3")],
        "k long, s long, e long, lid string",
    )
    right = spark.createDataFrame(
        [(1, 90, 205, "R1"), (1, 500, 600, "R2"), (2, 50, 60, "R3")],
        "k long, s long, e long, rid string",
    )
    out = interval_join(
        left, right, on=["k"], left_start="s", left_end="e",
        right_start="s", right_end="e", bin_width=10,
    )
    pairs = sorted((r["lid"], r["rid_r"]) for r in out.collect())
    # L1 x R1 overlap [90,100); L2 x R1 overlap [200,205); R2 no match;
    # L3 x R3: half-open [0,50) vs [50,60) do NOT overlap
    assert pairs == [("L1", "R1"), ("L2", "R1")]
    with pytest.raises(ValueError):
        interval_join(left, right, on=[], left_start="s", left_end="e",
                      right_start="s", right_end="e", bin_width=10)


def test_stream_transitions_matches_batch_across_micro_batches(spark, tmp_path):
    """Batch parity INCLUDING the cross-batch state carry: the input is
    two parquet files drained with max_files_per_trigger=1, so every
    user's last event from batch 0 must bridge into batch 1 through the
    (last_ts, last_state) state — the operator's headline claim."""
    from docetl_spark.functions.timeseries import transitions
    from docetl_spark.streaming import events as stream_ops

    import pandas as pd

    rows = [(i, 1_700_000_000_000_000_000 + i * 10**9, i % 3, t)
            for i, t in enumerate(["view", "click", "view", "purchase", "click",
                                   "view", "click", "purchase", "view"])]
    schema = "event_id long, ts long, user_id long, event_type string"
    cols = ["event_id", "ts", "user_id", "event_type"]
    ev = spark.createDataFrame(rows, schema)
    # time-split single-file parquets: earlier half lands in micro-batch 0
    d = tmp_path / "in"
    d.mkdir()
    pd.DataFrame(rows[:5], columns=cols).to_parquet(d / "b0.parquet")
    pd.DataFrame(rows[5:], columns=cols).to_parquet(d / "b1.parquet")
    stream = stream_ops.read_events_stream(
        spark, str(d), max_files_per_trigger=1)
    pairs = stream_ops.transitions_stateful(
        stream.select("user_id", "ts", "event_id", "event_type"))
    rows_out = stream_ops.run_available_now(
        pairs, checkpoint=stream_ops.scratch_checkpoint_dir("ckpt_ttest_"),
        output_mode="append", shuffle_partitions=4,
    )
    got = {}
    for r in rows_out:
        key = (r["from_state"], r["to_state"])
        got[key] = got.get(key, 0) + 1
    want = {(r["from_state"], r["to_state"]): r["n"] for r in transitions(
        ev, keys=["user_id"], ts_col="ts", state_col="event_type",
        tiebreak="event_id").collect()}
    assert got == want
    # the carry is actually load-bearing: cross-file pairs exist
    # (every user has events on both sides of the split)
    batch0_only = {}
    for r in transitions(spark.createDataFrame(rows[:5], schema),
                         keys=["user_id"], ts_col="ts",
                         state_col="event_type", tiebreak="event_id").collect():
        batch0_only[(r["from_state"], r["to_state"])] = r["n"]
    for r in transitions(spark.createDataFrame(rows[5:], schema),
                         keys=["user_id"], ts_col="ts",
                         state_col="event_type", tiebreak="event_id").collect():
        k = (r["from_state"], r["to_state"])
        batch0_only[k] = batch0_only.get(k, 0) + r["n"]
    assert batch0_only != want  # per-batch-only pairs would be WRONG


def test_readability_counts_and_empty(spark):
    from docetl_spark.functions.text import readability

    rows = [(1, "The cat sat. It purred!"), (2, ""), (3, "xyz pqrst")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["r"] for r in df.select(
        "doc_id", readability(F.col("text")).alias("r")).collect()}
    r1 = out[1]
    assert r1["n_words"] == 5 and r1["n_sentences"] == 2
    # the/cat/sat./it/purred! -> vowel groups 1+1+1+1+2 = 6
    assert r1["n_syllables"] == 6
    assert abs(r1["flesch"] - (206.835 - 1.015 * 2.5 - 84.6 * 1.2)) < 1e-6
    assert out[2]["n_words"] == 0 and out[2]["flesch"] is None
    # vowel-less words floor at 1 syllable
    assert out[3]["n_syllables"] == 2 and out[3]["n_sentences"] == 1


def test_frame_verbs_chain(spark):
    from docetl_spark import SemanticFrame

    ev = spark.createDataFrame(
        [(1, 5, "a", '{"k": 3}'), (1, 15, "a", '{"k": 4}'), (2, 7, "b", "{}")],
        "user_id long, ts long, v string, props string",
    )
    sf = SemanticFrame.from_df(ev)
    # user 1's buckets 0,1 are consecutive -> ONE island; user 2 -> one
    assert sf.streaks("ts", keys=["user_id"], bucket_width=10).count() == 2
    assert sf.heavy_hitters("v", top=1).count() >= 1
    assert sf.json_extract("props", {"k": "k:long"}).df.schema["k"].simpleString() == "k:bigint"
    assert sf.flag_outliers("ts", by=["user_id"]).count() == 3
    assert sf.melt(["user_id"], ["ts"]).count() == 3


def test_heavy_hitters_weighted_null_tail_surfaces_other(spark):
    """ADVICE r7: in the weight_col path a genuine __other__ group whose
    weights are ALL NULL must surface (with NULL n_rows), not silently
    vanish through the empty-tail nullness filter."""
    rows = [("a", 10), ("b", 5), ("c", None), ("d", None)]
    df = spark.createDataFrame(rows, "v string, w long")
    out = {r["value"]: r for r in heavy_hitters(
        df, "v", top=2, weight_col="w").collect()}
    assert "__other__" in out
    assert out["__other__"]["n_rows"] is None
    # and the empty-tail guard still holds: <= top distinct values
    # yields NO __other__ row even when some weights are NULL
    small = spark.createDataFrame([("a", None), ("b", 3)], "v string, w long")
    vals = [r["value"] for r in heavy_hitters(
        small, "v", top=5, weight_col="w").collect()]
    assert "__other__" not in vals


def test_robust_outliers_overflow_raises_non_ansi(spark):
    """ADVICE r7: with ANSI off, decimal overflow yields NULL comparisons;
    the operator must raise loudly instead of silently flagging the whole
    group non-outlier. NULL *values* still flag False quietly."""
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        big = spark.createDataFrame(
            [(1, 1.0e6), (2, 2.0e6), (3, 9.0e6)], "id long, value double")
        with pytest.raises(Exception, match="overflow"):
            # scale=10^12 makes dev^2*1e4*(n-1) blow past decimal(38,0)
            robust_outliers(big, "value", scale=10**12).collect()
        ok = spark.createDataFrame(
            [(1, 1.0), (2, 2.0), (3, None)], "id long, value double")
        got = {r["id"]: r["is_outlier"] for r in robust_outliers(
            ok, "value").collect()}
        assert got == {1: False, 2: False, 3: False}
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_transitions_stateful_custom_column_names(spark, tmp_path):
    """ADVICE r7: ts_col/id_col thread through to the executor-side fold
    (they were hardcoded to 'ts'/'event_id')."""
    from docetl_spark.streaming import events as stream_ops

    import pandas as pd

    rows = [(i, 1_700_000_000_000_000_000 + i * 10**9, 1, t)
            for i, t in enumerate(["view", "click", "purchase"])]
    cols = ["eid", "when_ns", "uid", "etype"]
    d = tmp_path / "in"
    d.mkdir()
    pd.DataFrame(rows, columns=cols).to_parquet(d / "b0.parquet")
    stream = (spark.readStream.schema(
        "eid long, when_ns long, uid long, etype string").parquet(str(d)))
    pairs = stream_ops.transitions_stateful(
        stream, user_col="uid", state_col="etype",
        ts_col="when_ns", id_col="eid")
    rows_out = stream_ops.run_available_now(
        pairs, checkpoint=stream_ops.scratch_checkpoint_dir("ckpt_tcols_"),
        output_mode="append", shuffle_partitions=4,
    )
    got = sorted((r["from_state"], r["to_state"]) for r in rows_out)
    assert got == [("click", "purchase"), ("view", "click")]
