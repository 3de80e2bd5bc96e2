"""Brute-force equivalence sweeps for the round-8 operators: seeded
random datasets, Spark plan vs a naive Python reference — guarding the
plan constructions (boundary crossings, CDC latest-change election,
LEAD-closed intervals, rolling distinct windows, affine chains) against
edge geometry the fixed-testdata oracles can't independently witness.

Fixed seeds, modest sizes: each case is one Spark job."""

from __future__ import annotations

import math
import random
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.mark.parametrize("seed", [11, 202])
def test_sample_pps_matches_naive_systematic(spark, seed):
    from docetl_spark.functions.training import sample_pps

    rng = random.Random(seed)
    rows = [(s, i, rng.choice([None, 0.0, rng.uniform(0.01, 30.0)]))
            for s in ("a", "b") for i in range(25)]
    df = spark.createDataFrame(rows, "s string, id long, w double")
    n = 6
    got = {(r["s"], r["id"]): r["n_copies"] for r in sample_pps(
        df, "w", n, order_by=["id"], strata=["s"]).collect()}
    want = {}
    for stratum in ("a", "b"):
        sub = sorted((i, w) for (s, i, w) in rows if s == stratum)
        cents = [0 if w is None else math.floor(w * 100 + 0.5) for _, w in sub]
        tot = sum(cents)
        cum = 0
        for (i, _w), c in zip(sub, cents):
            prev, cum = cum, cum + c
            k = (cum * n) // tot - (prev * n) // tot if tot > 0 else 0
            if k > 0:
                want[(stratum, i)] = k
    assert got == want
    # exactly n copies per stratum with any positive total
    for stratum in ("a", "b"):
        assert sum(v for (s, _), v in want.items() if s == stratum) == n


@pytest.mark.parametrize("seed", [5, 77])
def test_apply_cdc_matches_naive_merge(spark, seed):
    from docetl_spark.functions.timeseries import apply_cdc

    rng = random.Random(seed)
    base_rows = [(k, rng.randint(0, 9)) for k in range(12) if rng.random() < 0.7]
    ch_rows = [
        (rng.randint(0, 15), t, cid, rng.choice(["U", "U", "D"]), rng.randint(10, 99))
        for cid, t in enumerate(rng.choices(range(5), k=30))
    ]
    base = spark.createDataFrame(base_rows, "k long, v long")
    ch = spark.createDataFrame(ch_rows, "k long, ts long, cid long, op string, v long")
    got = {r["k"]: r["v"] for r in apply_cdc(
        base, ch, keys=["k"], ts_col="ts", tiebreak="cid").collect()}
    latest = {}
    for k, t, cid, op, v in ch_rows:
        if k not in latest or (t, cid) > latest[k][:2]:
            latest[k] = (t, cid, op, v)
    want = {}
    for k, v in base_rows:
        if k not in latest:
            want[k] = v
    for k, (_t, _c, op, v) in latest.items():
        if op != "D":
            want[k] = v
    assert got == want


@pytest.mark.parametrize("seed", [13, 4242])
def test_state_durations_matches_naive(spark, seed):
    from docetl_spark.functions.timeseries import state_durations

    rng = random.Random(seed)
    rows = [(rng.randint(1, 3), rng.randint(0, 500), i, rng.choice("xyz"))
            for i in range(60)]
    df = spark.createDataFrame(rows, "k long, ts long, eid long, st string")
    got = {(r["k"], r["state"]): (r["n_visits"], r["total_ns"])
           for r in state_durations(
               df, keys=["k"], ts_col="ts", state_col="st", tiebreak="eid").collect()}
    want = {}
    for k in {r[0] for r in rows}:
        seq = sorted(((t, e, s) for (kk, t, e, s) in rows if kk == k))
        for i, (t, _e, s) in enumerate(seq):
            n, tot = want.get((k, s), (0, None))
            gap = seq[i + 1][0] - t if i + 1 < len(seq) else None
            if gap is not None:
                tot = (tot or 0) + gap
            want[(k, s)] = (n + 1, tot)
    assert got == want


@pytest.mark.parametrize("seed", [29, 3030])
def test_active_users_matches_naive(spark, seed):
    from docetl_spark.functions.timeseries import active_users

    rng = random.Random(seed)
    rows = [(rng.randint(1, 6), rng.randint(0, 45) * 10 + rng.randint(0, 9))
            for _ in range(120)]
    df = spark.createDataFrame(rows, "u long, ts long")
    got = {r["day"]: (r["au_1d"], r["au_7d"]) for r in active_users(
        df, "ts", user_col="u", day_ns=10, windows=(1, 7)).collect()}
    days = sorted({t // 10 for _, t in rows})
    want = {}
    for d in days:
        a1 = {u for u, t in rows if t // 10 == d}
        a7 = {u for u, t in rows if d - 6 <= t // 10 <= d}
        want[d] = (len(a1), len(a7))
    assert got == want


@pytest.mark.parametrize("seed", [17])
def test_merge_rollup_matches_naive_any_split(spark, seed):
    from docetl_spark.functions.timeseries import merge_rollup, rollup_state

    rng = random.Random(seed)
    rows = [(rng.randint(0, 5), rng.choice([None, rng.uniform(-50, 50)]))
            for _ in range(80)]
    cut = rng.randint(1, 79)
    aggs = {"n": ("count", "v"), "s": ("sum", "v"),
            "lo": ("min", "v"), "hi": ("max", "v")}
    base = spark.createDataFrame(rows[:cut], "k long, v double")
    delta = spark.createDataFrame(rows[cut:], "k long, v double")
    full = spark.createDataFrame(rows, "k long, v double")
    merged = sorted(map(tuple, merge_rollup(
        rollup_state(base, ["k"], aggs), delta, ["k"], aggs).collect()))
    recomputed = sorted(map(tuple, rollup_state(full, ["k"], aggs).collect()))
    assert merged == recomputed
