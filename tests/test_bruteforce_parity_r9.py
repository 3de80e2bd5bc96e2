"""Brute-force parity sweeps for the round-9 operators — the third
verification layer (beside unit tests and the SQL oracle) for exactly
the formulations where a SQL oracle could share a blind spot: seeded
random inputs, naive O(n²)/O(n log n) Python references, exact equality.
"""

import math
import random

import pytest

SEEDS = [3, 17]


def _rand_rows(seed, n=40, groups=3):
    rng = random.Random(seed)
    return [
        {"g": f"g{rng.randrange(groups)}", "ts": rng.randrange(0, 10_000),
         "v": round(rng.uniform(0, 200), 2), "id": i}
        for i in range(n)
    ]


@pytest.mark.parametrize("seed", SEEDS)
def test_weighted_quantiles_matches_naive(spark, seed):
    from docetl_spark.functions.stats import weighted_quantiles

    rows = _rand_rows(seed)
    df = spark.createDataFrame(rows)
    qs = [2500, 5000, 7500, 10000]
    got = {(r["g"], r["q_bp"]): r["value"] for r in
           weighted_quantiles(df, "v", "v", qs_bp=qs, by=["g"]).collect()}
    # naive: cumulative fixed-point weights over sorted distinct values
    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], {}).setdefault(r["v"], 0)
        by_g[r["g"]][r["v"]] += int(math.floor(r["v"] * 100 + 0.5))
    for g, wmap in by_g.items():
        vals = sorted(wmap)
        tot = sum(wmap.values())
        for q in qs:
            cum = 0
            for v in vals:
                cum += wmap[v]
                if cum * 10000 >= q * tot:
                    assert got[(g, q)] == v, (g, q)
                    break


@pytest.mark.parametrize("seed", SEEDS)
def test_interval_union_matches_naive(spark, seed):
    from docetl_spark.functions.timeseries import interval_union

    rng = random.Random(seed)
    rows = [{"g": f"g{rng.randrange(3)}", "s": (s := rng.randrange(0, 500)),
             "e": s + rng.randrange(0, 80)} for _ in range(60)]
    df = spark.createDataFrame(rows)
    got = {r["g"]: r for r in
           interval_union(df, keys=["g"], start_col="s", end_col="e").collect()}
    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], []).append((r["s"], r["e"]))
    for g, ivs in by_g.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        assert got[g]["n_merged"] == len(merged)
        assert got[g]["covered_ns"] == sum(e - s for s, e in merged)
        assert got[g]["span_ns"] == max(e for _, e in ivs) - min(s for s, _ in ivs)


@pytest.mark.parametrize("seed", SEEDS)
def test_gini_matches_naive(spark, seed):
    from docetl_spark.functions.stats import gini_bp

    rows = _rand_rows(seed)
    df = spark.createDataFrame(rows)
    got = {r["g"]: r["gini_bp"] for r in gini_bp(df, "v", by=["g"]).collect()}
    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], []).append(int(math.floor(r["v"] * 100 + 0.5)))
    for g, xs in by_g.items():
        xs.sort()
        n, sx = len(xs), sum(xs)
        srx = sum((i + 1) * x for i, x in enumerate(xs))
        num, den = (2 * srx - (n + 1) * sx) * 10000, n * sx
        want = abs(num) // abs(den) * (1 if (num >= 0) == (den >= 0) else -1)
        assert got[g] == want, g


@pytest.mark.parametrize("seed", SEEDS)
def test_skyline_matches_naive_dominance(spark, seed):
    from docetl_spark.functions.stats import skyline_2d

    rng = random.Random(seed)
    rows = [{"x": rng.randrange(0, 30), "y": rng.randrange(0, 30), "id": i}
            for i in range(50)]
    df = spark.createDataFrame(rows)
    got = {(r["x"], r["y"]) for r in
           skyline_2d(df, "x", "y", tiebreak=["id"]).collect()}
    # naive O(n^2) dominance (minimize x, maximize y); dedupe exact points
    pts = {(r["x"], r["y"]) for r in rows}
    want = {
        (x, y) for (x, y) in pts
        if not any((ox <= x and oy >= y and (ox < x or oy > y)) for ox, oy in pts)
    }
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_basket_pairs_matches_naive(spark, seed):
    from docetl_spark.functions.stats import basket_pairs

    rng = random.Random(seed)
    rows = [{"bk": rng.randrange(0, 12), "it": f"i{rng.randrange(5)}"}
            for _ in range(80)]
    df = spark.createDataFrame(rows)
    got = {(r["item_a"], r["item_b"]): r for r in basket_pairs(df, "bk", "it").collect()}
    baskets = {}
    for r in rows:
        baskets.setdefault(r["bk"], set()).add(r["it"])
    nb = len(baskets)
    item_n = {}
    pair_n = {}
    for items in baskets.values():
        for it in items:
            item_n[it] = item_n.get(it, 0) + 1
        s = sorted(items)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                pair_n[(s[i], s[j])] = pair_n.get((s[i], s[j]), 0) + 1
    assert set(got) == set(pair_n)
    for (a, b), pn in pair_n.items():
        r = got[(a, b)]
        assert r["pair_n"] == pn and r["n_a"] == item_n[a] and r["n_b"] == item_n[b]
        assert r["support_bp"] == pn * 10000 // nb
        assert r["lift_micro"] == pn * nb * 1_000_000 // (item_n[a] * item_n[b])


@pytest.mark.parametrize("seed", SEEDS)
def test_edit_distance_pairs_matches_naive(spark, seed):
    from docetl_spark.functions.dedup import edit_distance_pairs

    rng = random.Random(seed)
    vocab = ["red gear", "red gears", "blue gear", "red bear", "red g",
             "red gearbox", "red  gear", "RED GEAR  "]
    rows = [{"id": i, "t": rng.choice(vocab) + ("" if rng.random() < 0.7 else "x")}
            for i in range(25)]
    df = spark.createDataFrame(rows)
    got = {(r["id_a"], r["id_b"]): r["distance"] for r in
           edit_distance_pairs(df, "id", "t", max_distance=2, prefix_len=3).collect()}

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    norm = {r["id"]: r["t"].strip().lower() for r in rows}
    want = {}
    ids = sorted(norm)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = norm[ids[i]], norm[ids[j]]
            if a[:3] == b[:3] and abs(len(a) - len(b)) <= 2 and lev(a, b) <= 2:
                want[(ids[i], ids[j])] = lev(a, b)
    assert got == want
