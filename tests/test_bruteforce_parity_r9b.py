"""Brute-force parity sweeps for the round-9 second-wave operators —
the third verification layer (beside unit tests and the SQL oracle) for
exactly the formulations where a SQL oracle could share a blind spot:
both the Spark query and the DuckDB oracle were derived from the SAME
cleared-division algebra, so these references compute straight from the
mathematical DEFINITION instead (pair counting for AUC, o/e cells for
chi-square, a sorted CDF walk for KS, share squaring for HHI, pair
probability for Simpson), seeded random inputs, exact equality."""

import math
import random
from collections import Counter, defaultdict

import pytest

SEEDS = [3, 17]


def _rand_scored(seed, n=60, ties=True):
    rng = random.Random(seed)
    pool = [round(rng.uniform(0, 10), 1) for _ in range(12)] if ties else None
    return [
        {"s": (rng.choice(pool) if ties else rng.uniform(0, 10)),
         "l": rng.randrange(2), "id": i}
        for i in range(n)
    ]


@pytest.mark.parametrize("seed", SEEDS)
def test_auc_matches_pair_counting(spark, seed):
    # definition: P(score_pos > score_neg) + 0.5 P(=) over ALL pairs
    from docetl_spark.functions.stats import auc_rank

    rows = _rand_scored(seed)
    df = spark.createDataFrame(rows)
    got = auc_rank(df, "s", "l").collect()[0]
    pos = [r["s"] for r in rows if r["l"] == 1]
    neg = [r["s"] for r in rows if r["l"] == 0]
    wins2 = sum(2 if p > q else 1 if p == q else 0 for p in pos for q in neg)
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert got["auc_bp"] == wins2 * 10000 // (2 * len(pos) * len(neg))


@pytest.mark.parametrize("seed", SEEDS)
def test_chi2_matches_observed_expected_cells(spark, seed):
    from docetl_spark.functions.stats import chi_square_bp

    rng = random.Random(seed)
    rows = [{"a": f"a{rng.randrange(4)}", "b": f"b{rng.randrange(3)}"}
            for _ in range(80)]
    df = spark.createDataFrame(rows)
    got = chi_square_bp(df, "a", "b").collect()[0]
    obs = Counter((r["a"], r["b"]) for r in rows)
    ra = Counter(r["a"] for r in rows)
    cb = Counter(r["b"] for r in rows)
    n = len(rows)
    # per-cell integer term over the FULL grid, zero-observed included
    chi2 = sum(
        ((obs.get((a, b), 0) * n - ra[a] * cb[b]) ** 2 * 10000)
        // (ra[a] * cb[b] * n)
        for a in ra for b in cb
    )
    assert got["chi2_bp"] == chi2
    assert got["n_cells"] == len(ra) * len(cb)
    assert got["dof"] == (len(ra) - 1) * (len(cb) - 1)


@pytest.mark.parametrize("seed", SEEDS)
def test_ks_matches_cdf_walk(spark, seed):
    from docetl_spark.functions.stats import ks_statistic

    rng = random.Random(seed)
    rows = [{"v": round(rng.gauss(5 if rng.random() < 0.5 else 6, 2), 1),
             "g": rng.choice(["a", "b"])} for _ in range(70)]
    df = spark.createDataFrame(rows)
    got = ks_statistic(df, "v", "g", group_a="a", group_b="b").collect()[0]
    a = sorted(r["v"] for r in rows if r["g"] == "a")
    b = sorted(r["v"] for r in rows if r["g"] == "b")
    best = 0
    for x in sorted(set(a) | set(b)):
        ca = sum(1 for v in a if v <= x)
        cb2 = sum(1 for v in b if v <= x)
        best = max(best, abs(ca * len(b) - cb2 * len(a)))
    assert got["ks_num"] == best
    assert got["ks_bp"] == best * 10000 // (len(a) * len(b))


@pytest.mark.parametrize("seed", SEEDS)
def test_hhi_matches_share_squares(spark, seed):
    from docetl_spark.functions.stats import concentration_hhi

    rng = random.Random(seed)
    rows = [{"e": f"e{rng.randrange(6)}", "v": round(rng.uniform(0, 50), 2)}
            for _ in range(50)]
    df = spark.createDataFrame(rows)
    got = concentration_hhi(df, "v", "e").collect()[0]
    tot = defaultdict(int)
    for r in rows:
        tot[r["e"]] += int(math.floor(r["v"] * 100 + 0.5))
    t = sum(tot.values())
    assert got["total_cents"] == t
    assert got["hhi_bp"] == sum(x * x for x in tot.values()) * 10000 // (t * t)
    assert got["top_share_bp"] == max(tot.values()) * 10000 // t


@pytest.mark.parametrize("seed", SEEDS)
def test_simpson_matches_pair_probability(spark, seed):
    from docetl_spark.functions.stats import diversity_simpson

    rng = random.Random(seed)
    rows = [{"c": f"c{rng.randrange(5)}"} for _ in range(45)]
    df = spark.createDataFrame(rows)
    got = diversity_simpson(df, "c").collect()[0]
    counts = Counter(r["c"] for r in rows)
    n = len(rows)
    same = sum(c * (c - 1) for c in counts.values())
    assert got["simpson_bp"] == (n * (n - 1) - same) * 10000 // (n * (n - 1))


@pytest.mark.parametrize("seed", SEEDS)
def test_lift_table_matches_sorted_walk(spark, seed):
    from docetl_spark.functions.stats import lift_table

    rows = _rand_scored(seed, n=37)  # deliberately not divisible by 10
    df = spark.createDataFrame(rows)
    got = {r["bucket"]: r for r in lift_table(
        df, "s", "l", buckets=10, tiebreak=["id"]).collect()}
    ordered = sorted(rows, key=lambda r: (-r["s"], r["id"]))
    n = len(ordered)
    # NTILE from the definition: first n%k buckets take n//k+1 rows
    q, rem = divmod(n, 10)
    cut = rem * (q + 1)
    buckets = defaultdict(list)
    for i, r in enumerate(ordered):
        b = i // (q + 1) + 1 if i < cut else rem + (i - cut) // q + 1
        buckets[b].append(r["l"])
    tp = sum(r["l"] for r in rows)
    cn = cp = 0
    for b in sorted(buckets):
        labs = buckets[b]
        cn += len(labs)
        cp += sum(labs)
        assert got[b]["n"] == len(labs)
        assert got[b]["n_pos"] == sum(labs)
        assert got[b]["rate_bp"] == sum(labs) * 10000 // len(labs)
        assert got[b]["cum_rate_bp"] == cp * 10000 // cn
        assert got[b]["lift_bp"] == cp * n * 10000 // (cn * tp)


@pytest.mark.parametrize("seed", SEEDS)
def test_bursts_matches_quadratic_window_scan(spark, seed):
    from docetl_spark.functions.timeseries import bursts

    rng = random.Random(seed)
    rows = [{"k": rng.randrange(3), "ts": rng.randrange(0, 500)}
            for _ in range(60)]
    df = spark.createDataFrame(rows)
    W = 50
    got = {r["k"]: r for r in bursts(
        df, keys=["k"], ts_col="ts", window_ns=W).collect()}
    by_k = defaultdict(list)
    for r in rows:
        by_k[r["k"]].append(r["ts"])
    for k, times in by_k.items():
        best_n, best_t = 0, None
        for t0 in sorted(times):
            n = sum(1 for t in times if t0 <= t <= t0 + W - 1)
            if n > best_n:
                best_n, best_t = n, t0
        assert (got[k]["peak_n"], got[k]["peak_start_ns"]) == (best_n, best_t)


@pytest.mark.parametrize("seed", SEEDS)
def test_transition_probs_matches_sequential_walk(spark, seed):
    from docetl_spark.functions.timeseries import transition_probs

    rng = random.Random(seed)
    rows = [{"k": rng.randrange(4), "ts": i, "s": f"s{rng.randrange(3)}"}
            for i in range(80)]
    df = spark.createDataFrame(rows)
    got = {(r["from_state"], r["to_state"]): r for r in transition_probs(
        df, keys=["k"], ts_col="ts", state_col="s").collect()}
    pairs = Counter()
    by_k = defaultdict(list)
    for r in sorted(rows, key=lambda r: r["ts"]):
        by_k[r["k"]].append(r["s"])
    for seq in by_k.values():
        for a, b in zip(seq, seq[1:]):
            pairs[(a, b)] += 1
    from_tot = Counter()
    for (a, _), n in pairs.items():
        from_tot[a] += n
    assert set(got) == set(pairs)
    for key, n in pairs.items():
        assert got[key]["n"] == n
        assert got[key]["from_total"] == from_tot[key[0]]
        assert got[key]["prob_bp"] == n * 10000 // from_tot[key[0]]


@pytest.mark.parametrize("seed", SEEDS)
def test_pareto_coverage_matches_cumulative_walk(spark, seed):
    from docetl_spark.functions.stats import pareto_coverage

    rng = random.Random(seed)
    rows = [(f"e{rng.randrange(12)}", round(rng.uniform(0, 80), 2))
            for _ in range(50)]
    df = spark.createDataFrame(rows, "e string, v double")
    ts = (2500, 5000, 9000)
    got = {r["threshold_bp"]: (r["k"], r["share_bp"]) for r in
           pareto_coverage(df, "v", "e", thresholds_bp=ts).collect()}
    tot = defaultdict(int)
    for e, v in rows:
        tot[e] += int(math.floor(v * 100 + 0.5))
    ordered = sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))
    T = sum(tot.values())
    for t in ts:
        cum = 0
        for k, (e, x) in enumerate(ordered, start=1):
            cum += x
            if cum * 10000 >= t * T:
                assert got[t] == (k, cum * 10000 // T)
                break


@pytest.mark.parametrize("seed", SEEDS)
def test_correlation_r2_matches_integer_sums(spark, seed):
    from docetl_spark.functions.stats import correlation_r2

    rng = random.Random(seed)
    rows = [(round(rng.uniform(0, 50), 2),
             round(rng.uniform(0, 50), 2)) for _ in range(40)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = correlation_r2(df, "x", "y").collect()[0]
    xs = [int(math.floor(x * 100 + 0.5)) for x, _ in rows]
    ys = [int(math.floor(y * 100 + 0.5)) for _, y in rows]
    n = len(rows)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    num = n * sxy - sx * sy
    dx, dy = n * sxx - sx * sx, n * syy - sy * sy
    assert got["n"] == n
    assert got["sign"] == (1 if num > 0 else -1 if num < 0 else 0)
    assert got["r2_bp"] == num * num * 10000 // (dx * dy)


@pytest.mark.parametrize("seed", SEEDS)
def test_sequence_ngrams_matches_sliding_windows(spark, seed):
    from docetl_spark.functions.timeseries import sequence_ngrams

    rng = random.Random(seed)
    rows = [{"k": rng.randrange(5), "ts": i, "s": f"s{rng.randrange(3)}"}
            for i in range(90)]
    df = spark.createDataFrame(rows, "k int, ts long, s string")
    got = {(r["state_1"], r["state_2"], r["state_3"]): r["support"]
           for r in sequence_ngrams(df, keys=["k"], ts_col="ts",
                                    state_col="s", n=3).collect()}
    by_k = defaultdict(list)
    for r in sorted(rows, key=lambda r: r["ts"]):
        by_k[r["k"]].append(r["s"])
    ref = Counter()
    for seq in by_k.values():
        for i in range(len(seq) - 2):
            ref[tuple(seq[i:i + 3])] += 1
    assert got == dict(ref)
