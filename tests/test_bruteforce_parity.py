"""Brute-force equivalence sweeps for the round-7 operators: seeded
random datasets, Spark plan vs a naive Python reference. These guard
the PLAN constructions (bin attribution, window framing, as-of
composition, sequential folds) against edge geometry the example tests
and the DuckDB oracles (which share some formulation choices) can't
independently witness.

Fixed seeds, modest sizes: each case is one Spark job, not a
hypothesis-per-example loop."""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.mark.parametrize("seed", [7, 41, 1234])
def test_interval_join_matches_naive_overlap(spark, seed):
    from docetl_spark.functions.timeseries import interval_join

    rng = random.Random(seed)

    def intervals(n, tag):
        out = []
        for i in range(n):
            k = rng.randint(1, 4)
            s = rng.randint(-50, 200)
            e = s + rng.randint(-5, 60)  # some inverted/empty on purpose
            out.append((k, s, e, f"{tag}{i}"))
        return out

    L, R = intervals(40, "L"), intervals(40, "R")
    ldf = spark.createDataFrame(L, "k long, s long, e long, lid string")
    rdf = spark.createDataFrame(R, "k long, s long, e long, rid string")
    got = sorted(
        (r["lid"], r["rid_r"])
        for r in interval_join(
            ldf, rdf, on=["k"], left_start="s", left_end="e",
            right_start="s", right_end="e", bin_width=7,
        ).collect()
    )
    want = sorted(
        (lid, rid)
        for (lk, ls, le, lid) in L
        for (rk, rs, re, rid) in R
        if lk == rk and le > ls and re > rs and ls < re and rs < le
    )
    assert got == want


@pytest.mark.parametrize("seed", [3, 99])
def test_streaks_matches_naive_islands(spark, seed):
    from docetl_spark.functions.timeseries import streaks

    rng = random.Random(seed)
    W = 10
    rows = [(rng.randint(1, 5), rng.randint(-80, 300)) for _ in range(250)]
    df = spark.createDataFrame(rows, "k long, ts long")
    got = sorted(
        (r["k"], r["streak_start"], r["streak_end"], r["n_buckets"], r["n_events"])
        for r in streaks(df, "ts", keys=["k"], bucket_width=W).collect()
    )
    # naive islands
    from collections import defaultdict

    per = defaultdict(lambda: defaultdict(int))
    for k, ts in rows:
        per[k][ts // W] += 1  # python floor div == the pmod/DIV floor
    want = []
    for k, buckets in per.items():
        bs = sorted(buckets)
        run = [bs[0]]
        for b in bs[1:]:
            if b == run[-1] + 1:
                run.append(b)
            else:
                want.append((k, run[0] * W, run[-1] * W, len(run),
                             sum(buckets[x] for x in run)))
                run = [b]
        want.append((k, run[0] * W, run[-1] * W, len(run),
                     sum(buckets[x] for x in run)))
    assert got == sorted(want)


@pytest.mark.parametrize("model", ["last_touch", "first_touch"])
def test_attribution_matches_naive(spark, model):
    from docetl_spark.functions.timeseries import attribute_conversions

    rng = random.Random(17)
    rows = []
    for i in range(300):
        rows.append((i, rng.randint(1, 6), rng.randint(0, 1000),
                     rng.choice(["touchA", "touchB", "conv", "noise"])))
    df = spark.createDataFrame(rows, "eid long, u long, ts long, et string")
    H = 80
    got = sorted(
        (r["eid"], r["touch_ts"], r["touch_type"])
        for r in attribute_conversions(
            df, conversion_type="conv", touch_types=["touchA", "touchB"],
            horizon=H, user_col="u", ts_col="ts", type_col="et",
            model=model, tiebreak="eid", carry_cols=["eid"],
        ).collect()
    )
    want = []
    for (eid, u, cts, et) in rows:
        if et != "conv":
            continue
        cands = [(ts, tid, tty) for (tid, tu, ts, tty) in rows
                 if tu == u and tty in ("touchA", "touchB")
                 and cts - H <= ts <= cts]
        if not cands:
            want.append((eid, None, None))
        else:
            pick = max(cands) if model == "last_touch" else min(cands)
            want.append((eid, pick[0], pick[2]))
    assert got == sorted(want)


def test_ewma_matches_pandas(spark):
    import pandas as pd

    from docetl_spark.functions.timeseries import ewma

    rng = random.Random(5)
    rows = [(rng.randint(1, 4), i, rng.uniform(-10, 10)) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, ts long, v double")
    got = {r["k"]: r["ewma"] for r in ewma(
        df, "ts", "v", keys=["k"], alpha=0.25).collect()}
    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"]).sort_values(["k", "ts"])
    want = pdf.groupby("k")["v"].apply(
        lambda s: s.ewm(alpha=0.25, adjust=False).mean().iloc[-1])
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-12)


@pytest.mark.parametrize("seed", [11, 77])
def test_scd2_matches_naive(spark, seed):
    from docetl_spark.functions.timeseries import changelog_to_scd2

    rng = random.Random(seed)
    rows = [(i, rng.randint(1, 4), rng.randint(0, 60),
             rng.choice(["a", "b", None])) for i in range(120)]
    df = spark.createDataFrame(rows, "eid long, k long, ts long, attr string")
    key = lambda t: (t[0], t[1], t[2] or "", -1 if t[3] is None else t[3])  # noqa: E731
    got = sorted(
        ((r["k"], r["valid_from"], r["attr"], r["valid_to"])
         for r in changelog_to_scd2(
             df, keys=["k"], ts_col="ts", attrs=["attr"], tiebreak="eid"
         ).collect()),
        key=key,
    )
    from collections import defaultdict

    per = defaultdict(list)
    for (eid, k, ts, attr) in rows:
        per[k].append((ts, eid, attr))
    want = []
    for k, evs in per.items():
        evs.sort(key=lambda x: (x[0], x[1]))
        versions = []
        prev = object()  # sentinel != anything; None == None IS a no-change
        for ts, _eid, attr in evs:
            if attr != prev:
                versions.append((ts, attr))
                prev = attr
        for i, (vf, attr) in enumerate(versions):
            vt = versions[i + 1][0] if i + 1 < len(versions) else None
            want.append((k, vf, attr, vt))
    assert got == sorted(want, key=key)
