"""Round-11 wave-5: Kruskal-Wallis / mutual information / one-way
ANOVA (exact-integer or bm25-disciplined-double formulations) and the
graph analytics module (degree-ordered triangle counting, fixed-
iteration integer PageRank, components) — brute-force parity plus
frame-verb/YAML drivability."""

import collections
import math
import random

import pytest
from pyspark.sql import functions as F

from docetl_spark import FakeBackend, SemanticFrame
from docetl_spark.functions.graphs import (
    canonical_edges, degree_table, graph_components, pagerank,
    triangle_count)
from docetl_spark.functions.mlstats import (
    anova_f_by, kruskal_wallis_by, mutual_info_by)

SEEDS = [5, 23]


# --------------------------------------------------- kruskal-wallis

def _py_kw(pairs):
    """(group, value) rows -> (H, H_tie_corrected or None)."""
    vals = sorted(v for _, v in pairs)
    n = len(vals)
    rank, i = {}, 0
    while i < n:
        j = i
        while j < n and vals[j] == vals[i]:
            j += 1
        rank[vals[i]] = (i + 1 + j) / 2
        i = j
    groups = collections.defaultdict(list)
    for g, v in pairs:
        groups[g].append(rank[v])
    h = (12 / (n * (n + 1))
         * sum(sum(r) ** 2 / len(r) for r in groups.values())) - 3 * (n + 1)
    t = sum(c ** 3 - c for c in collections.Counter(vals).values())
    c = 1 - t / (n ** 3 - n)
    return h, (h / c if c > 0 else None)


def test_kruskal_hand_checked(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 3.0),
            ("b", 5.0), ("c", 4.0), ("c", 4.0), ("c", 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis_by(df, "v", "g").collect()[0]
    h, hc = _py_kw(rows)
    assert (r["n"], r["n_groups"]) == (9, 3)
    assert abs(r["h_bp"] / 10000 - h) < 1e-3
    assert abs(r["h_tie_bp"] / 10000 - hc) < 1e-3


@pytest.mark.parametrize("seed", SEEDS)
def test_kruskal_matches_bruteforce_grouped(spark, seed):
    rng = random.Random(seed)
    rows = [(f"c{i % 2}", rng.choice("xyz"), float(rng.randint(0, 8)))
            for i in range(150)]
    df = spark.createDataFrame(rows, "cell string, g string, v double")
    got = {r["cell"]: r
           for r in kruskal_wallis_by(df, "v", "g", by=["cell"]).collect()}
    for cell in ("c0", "c1"):
        sub = [(g, v) for c, g, v in rows if c == cell]
        h, hc = _py_kw(sub)
        assert abs(got[cell]["h_bp"] / 10000 - h) < 1e-3
        assert abs(got[cell]["h_tie_bp"] / 10000 - hc) < 1e-3


def test_kruskal_nulls_degenerate_reserved(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), (None, 2.0), ("b", 2.0)],
        "g string, v double")
    r = kruskal_wallis_by(df, "v", "g").collect()[0]
    assert r["n"] == 2  # NULL value and NULL group both drop
    # all values tie -> C = 0 -> tie-corrected H is NULL
    tie = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0)], "g string, v double")
    rt = kruskal_wallis_by(tie, "v", "g").collect()[0]
    assert rt["h_tie_bp"] is None and rt["h_bp"] == 0
    # one group -> H undefined
    one = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    assert kruskal_wallis_by(one, "v", "g").collect()[0]["h_bp"] is None
    with pytest.raises(ValueError, match="reserves"):
        kruskal_wallis_by(df.withColumnRenamed("g", "n"), "v", "n", by=["n"])


# ---------------------------------------------------- mutual info

@pytest.mark.parametrize("seed", SEEDS)
def test_mutual_info_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    rows = [(rng.choice("ab"), rng.choice("pqr")) for _ in range(200)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_info_by(df, "a", "b").collect()[0]
    n = len(rows)
    ca = collections.Counter(a for a, _ in rows)
    cb = collections.Counter(b for _, b in rows)
    cab = collections.Counter(rows)
    want = sum(c / n * math.log(c * n / (ca[a] * cb[b]))
               for (a, b), c in cab.items())
    assert abs(r["mi"] - want) < 1e-5
    assert r["n"] == n and r["n_cells"] == len(cab)


def test_mutual_info_independent_and_determined(spark):
    # independent uniform -> MI = 0 exactly (every cell c*n == ca*cb)
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(5)]
    df = spark.createDataFrame(rows, "a string, b string")
    assert mutual_info_by(df, "a", "b").collect()[0]["mi"] == 0.0
    # b determined by a -> MI = H(a) = ln 2 for a uniform binary a
    det = spark.createDataFrame(
        [("x", "u")] * 5 + [("y", "v")] * 5, "a string, b string")
    r = mutual_info_by(det, "a", "b").collect()[0]
    assert abs(r["mi"] - math.log(2)) < 1e-6
    # NULLs drop
    nl = spark.createDataFrame(
        [("x", "u"), ("x", None), (None, "v")], "a string, b string")
    assert mutual_info_by(nl, "a", "b").collect()[0]["n"] == 1


# -------------------------------------------------------- anova

def _py_anova(pairs, scale=100):
    groups = collections.defaultdict(list)
    for g, v in pairs:
        groups[g].append(math.floor(v * scale + 0.5))
    allv = [x for r in groups.values() for x in r]
    n, k = len(allv), len(groups)
    gm = sum(allv) / n
    ssb = sum(len(r) * (sum(r) / len(r) - gm) ** 2 for r in groups.values())
    ssw = sum((x - sum(r) / len(r)) ** 2
              for r in groups.values() for x in r)
    f = (ssb / (k - 1)) / (ssw / (n - k)) if ssw > 0 and n > k else None
    eta = ssb / (ssb + ssw) if ssb + ssw > 0 else None
    return f, eta


@pytest.mark.parametrize("seed", SEEDS)
def test_anova_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    rows = [(rng.choice("abc"), round(rng.uniform(0, 50), 2))
            for _ in range(120)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_f_by(df, "v", "g").collect()[0]
    f, eta = _py_anova(rows)
    assert abs(r["f_bp"] / 10000 - f) < 2e-3
    assert abs(r["eta2_bp"] / 10000 - eta) < 2e-3


def test_anova_degenerate(spark):
    # zero within-group variance -> F undefined (NULL), eta2 = 1
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)],
        "g string, v double")
    r = anova_f_by(df, "v", "g").collect()[0]
    assert r["f_bp"] is None and r["eta2_bp"] == 10000
    # constant everything -> SST = 0 -> both NULL
    c = spark.createDataFrame([("a", 3.0), ("b", 3.0)], "g string, v double")
    rc = anova_f_by(c, "v", "g").collect()[0]
    assert rc["f_bp"] is None and rc["eta2_bp"] is None


# -------------------------------------------------------- graphs

def test_canonical_and_degree(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (3, 3), (None, 1), (2, 3)],
        "u bigint, v bigint")
    e = canonical_edges(df, "u", "v")
    assert sorted((r["src"], r["dst"]) for r in e.collect()) == [(1, 2), (2, 3)]
    deg = {r["node"]: r["degree"] for r in degree_table(e).collect()}
    assert deg == {1: 1, 2: 2, 3: 1}
    dd = {r["node"]: (r["out_degree"], r["in_degree"])
          for r in degree_table(e, directed=True).collect()}
    assert dd == {1: (1, 0), 2: (1, 1), 3: (0, 1)}


def test_triangle_count_k4_pendant(spark):
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (6, 7)]
    df = spark.createDataFrame(edges, "u bigint, v bigint")
    tc = {r["node"]: (r["degree"], r["triangles"], r["cc_bp"])
          for r in triangle_count(df, "u", "v").collect()}
    assert tc[1] == (3, 3, 10000) and tc[2] == (3, 3, 10000)
    assert tc[3] == (3, 3, 10000)
    assert tc[4] == (4, 3, 5000)  # 2*3/(4*3) = 0.5
    assert tc[5] == (1, 0, None) and tc[6] == (1, 0, None)


@pytest.mark.parametrize("seed", SEEDS)
def test_triangle_count_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    edges = {tuple(sorted(rng.sample(range(12), 2))) for _ in range(30)}
    df = spark.createDataFrame(sorted(edges), "u bigint, v bigint")
    got = {r["node"]: r["triangles"]
           for r in triangle_count(df, "u", "v").collect()}
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b), adj[b].add(a)
    for node, nb in adj.items():
        want = sum(1 for x in nb for y in nb
                   if x < y and y in adj[x]) // 1
        assert got[node] == want, (node, got[node], want)


def test_pagerank_integer_sim_parity(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (5, 1)]
    df = spark.createDataFrame(edges, "u bigint, v bigint")
    got = {r["node"]: r["rank_e12"]
           for r in pagerank(df, "u", "v", iters=4).collect()}
    nodes = sorted({x for e in edges for x in e})
    n, sc, d = len(nodes), 10 ** 12, 8500
    od = collections.Counter(a for a, _ in edges)
    base = ((10000 - d) * (sc // n)) // 10000
    r = {x: sc // n for x in nodes}
    for _ in range(4):
        inc = collections.defaultdict(int)
        for a, b in edges:
            inc[b] += r[a] // od[a]
        r = {x: base + (d * inc[x]) // 10000 for x in nodes}
    assert got == r
    # mass conservation-ish: total <= initial mass (floors only lose)
    assert sum(got.values()) <= sc


def test_pagerank_undirected_symmetric(spark):
    # a path 1-2-3: undirected ranks symmetric in 1 and 3
    df = spark.createDataFrame([(1, 2), (2, 3)], "u bigint, v bigint")
    got = {r["node"]: r["rank_e12"]
           for r in pagerank(df, "u", "v", iters=3, directed=False).collect()}
    assert got[1] == got[3] and got[2] > got[1]
    with pytest.raises(ValueError, match="iters"):
        pagerank(df, "u", "v", iters=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, "u", "v", damping_bp=10001)


def test_graph_components_matches_unionfind(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (6, 6), (7, 8), (8, 9), (9, 7)],
        "u bigint, v bigint")
    comp = {r["node"]: r["component"]
            for r in graph_components(df, "u", "v").collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 7: 7, 8: 7, 9: 7}


# --------------------------------------------- verbs + YAML surface

def test_wave5_frame_verbs(spark):
    df = spark.createDataFrame(
        [("a", "x", 1.0, 1, 2), ("a", "y", 2.0, 2, 3), ("b", "x", 3.0, 3, 1),
         ("b", "y", 4.0, 1, 3)],
        "g string, c string, v double, s bigint, d bigint")
    sf = SemanticFrame(df, backend=FakeBackend())
    assert sf.kruskal_wallis("v", "g").df.columns == [
        "n", "n_groups", "h_bp", "h_tie_bp"]
    assert sf.mutual_info("g", "c").df.columns == ["n", "n_cells", "mi"]
    assert sf.anova_f("v", "g").df.columns == ["n", "n_groups", "f_bp",
                                               "eta2_bp"]
    assert sf.triangle_count("s", "d").df.columns == [
        "node", "degree", "triangles", "cc_bp"]
    assert sf.pagerank("s", "d", iters=1).df.columns == ["node", "rank_e12"]
    assert sf.graph_components("s", "d").df.columns == ["node", "component"]


def test_wave5_ops_drive_through_yaml(spark):
    from docetl_spark.plans.compiler import run_pipeline

    cfg = {
        "datasets": {"d": {"type": "memory", "data": [
            {"g": "a", "c": "x", "v": 1.0, "s": 1, "t": 2},
            {"g": "a", "c": "y", "v": 2.5, "s": 2, "t": 3},
            {"g": "b", "c": "x", "v": 3.0, "s": 3, "t": 1},
            {"g": "b", "c": "y", "v": 4.5, "s": 1, "t": 3},
        ]}},
        "operations": [
            {"name": "kw", "type": "kruskal_wallis", "value_col": "v",
             "group_col": "g"},
            {"name": "mi", "type": "mutual_info", "a_col": "g", "b_col": "c"},
            {"name": "av", "type": "anova_f", "value_col": "v",
             "group_col": "g"},
            {"name": "tri", "type": "triangle_count", "src": "s", "dst": "t"},
            {"name": "pr", "type": "pagerank", "src": "s", "dst": "t",
             "iters": 2},
            {"name": "cc", "type": "graph_components", "src": "s",
             "dst": "t"},
        ],
        "pipeline": {"steps": [
            {"name": "s1", "input": "d", "operations": ["kw"]},
            {"name": "s2", "input": "d", "operations": ["mi"]},
            {"name": "s3", "input": "d", "operations": ["av"]},
            {"name": "s4", "input": "d", "operations": ["tri"]},
            {"name": "s5", "input": "d", "operations": ["pr"]},
            {"name": "s6", "input": "d", "operations": ["cc"]},
        ]},
    }
    run_pipeline(spark, cfg, backend=FakeBackend())
    assert spark.sql("SELECT * FROM s1").collect()[0]["n"] == 4
    assert spark.sql("SELECT * FROM s2").collect()[0]["n_cells"] == 4
    assert spark.sql("SELECT * FROM s3").collect()[0]["n_groups"] == 2
    # triangle 1-2-3 present
    tri = {r["node"]: r["triangles"]
           for r in spark.sql("SELECT * FROM s4").collect()}
    assert tri == {1: 1, 2: 1, 3: 1}
    assert spark.sql("SELECT * FROM s5").count() == 3
    assert spark.sql("SELECT * FROM s6").count() == 3


# -------------------------------------- jaccard / label propagation

@pytest.mark.parametrize("seed", SEEDS)
def test_jaccard_neighbors_matches_bruteforce(spark, seed):
    import itertools
    rng = random.Random(seed)
    edges = {tuple(sorted(rng.sample(range(10), 2))) for _ in range(18)}
    df = spark.createDataFrame(sorted(edges), "u bigint, v bigint")
    from docetl_spark.functions.graphs import jaccard_neighbors
    got = {(r["node_a"], r["node_b"]):
           (r["common"], r["degree_a"], r["degree_b"], r["jaccard_bp"])
           for r in jaccard_neighbors(df, "u", "v").collect()}
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b), adj[b].add(a)
    want = {}
    for a, b in itertools.combinations(sorted(adj), 2):
        c = len(adj[a] & adj[b])
        if c >= 1:
            want[(a, b)] = (c, len(adj[a]), len(adj[b]),
                            c * 10000 // (len(adj[a]) + len(adj[b]) - c))
    assert got == want


def test_jaccard_hub_cut_and_min_common(spark):
    # star: hub 0 connected to 1..5; leaves share only the hub
    df = spark.createDataFrame([(0, i) for i in range(1, 6)],
                               "u bigint, v bigint")
    from docetl_spark.functions.graphs import jaccard_neighbors
    full = jaccard_neighbors(df, "u", "v").collect()
    assert len(full) == 10  # C(5,2) leaf pairs, each sharing the hub
    assert all(r["jaccard_bp"] == 10000 for r in full)  # 1/(1+1-1)
    # hub excluded from the pivot role -> no pairs survive
    cut = jaccard_neighbors(df, "u", "v", max_pivot_degree=4).collect()
    assert cut == []
    # min_common filters
    assert jaccard_neighbors(df, "u", "v", min_common=2).count() == 0
    with pytest.raises(ValueError, match="min_common"):
        jaccard_neighbors(df, "u", "v", min_common=0)


def test_label_propagation_sim_parity(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (2, 6), (7, 8)]
    df = spark.createDataFrame(edges, "u bigint, v bigint")
    seeds = spark.createDataFrame([(1, "x"), (6, "y"), (99, "z")],
                                  "node bigint, label string")
    from docetl_spark.functions.graphs import label_propagation
    got = {r["node"]: (r["label"], r["is_seed"])
           for r in label_propagation(df, seeds, "u", "v", iters=2).collect()}
    # python synchronous sim with (count desc, label asc) tie-break
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b), adj[b].add(a)
    fixed = {1: "x", 6: "y"}  # 99 is not an endpoint -> dropped
    cur = dict(fixed)
    for _ in range(2):
        new = dict(cur)
        for n in adj:
            if n in fixed:
                continue
            votes = collections.Counter(
                cur[nb] for nb in adj[n] if nb in cur)
            if votes:
                new[n] = sorted(votes.items(),
                                key=lambda kv: (-kv[1], kv[0]))[0][0]
        cur = new
    for n in adj:
        assert got[n] == (cur.get(n), n in fixed), (n, got[n])
    assert 99 not in got  # seeds outside the graph are not rows
    assert got[7] == (None, False)  # unreachable stays unlabeled
    with pytest.raises(ValueError, match="iters"):
        label_propagation(df, seeds, "u", "v", iters=0)


def test_graph2_yaml_surface(spark):
    from docetl_spark.plans.compiler import run_pipeline

    cfg = {
        "datasets": {
            "g": {"type": "memory", "data": [
                {"s": 1, "t": 2}, {"s": 2, "t": 3}, {"s": 1, "t": 3},
                {"s": 3, "t": 4}]},
            "lab": {"type": "memory", "data": [{"node": 1, "label": "A"}]},
        },
        "operations": [
            {"name": "jn", "type": "jaccard_neighbors", "src": "s",
             "dst": "t"},
            {"name": "lp", "type": "label_propagation", "seeds": "lab",
             "src": "s", "dst": "t", "iters": 2},
        ],
        "pipeline": {"steps": [
            {"name": "s1", "input": "g", "operations": ["jn"]},
            {"name": "s2", "input": "g", "operations": ["lp"]},
        ]},
    }
    run_pipeline(spark, cfg, backend=FakeBackend())
    assert spark.sql("SELECT * FROM s1").count() >= 1
    lp = {r["node"]: r["label"] for r in spark.sql("SELECT * FROM s2").collect()}
    assert lp[1] == "A" and lp[2] == "A" and lp[3] == "A" and lp[4] == "A"


# ------------------------------------------------ named guard raises

def test_anova_level_sum_guard_raises_named(spark):
    # one level with a 10^15-dollar row -> 10^17 cents: 17 digits > 16
    # -> the named raise, never a silent/ANSI overflow
    df = spark.createDataFrame(
        [("a", 1e15), ("a", 1e15), ("b", 1.0), ("b", 2.0)],
        "g string, v double")
    with pytest.raises(Exception, match="anova_f_by: level moments"):
        anova_f_by(df, "v", "g").collect()


def test_anova_f_quotient_guard_raises_named(spark):
    # huge between-group spread over a near-zero (but nonzero) SSW:
    # the F quotient exceeds BIGINT -> named raise (the SSW -> 0 hazard)
    rows = ([("a", 0.0)] * 10 + [("b", 1e7)] * 9 + [("b", 1e7 + 0.01)])
    df = spark.createDataFrame(rows, "g string, v double")
    with pytest.raises(Exception, match="anova_f_by: level moments"):
        anova_f_by(df, "v", "g").collect()


def test_anova_near_guard_boundary_still_exact(spark):
    # 10^11-cent values stay inside every guard and match the float
    # ref (billion-dollar magnitudes with modest spread — the F
    # quotient fits BIGINT)
    rows = [("a", 1e9), ("a", 1e9 + 10), ("b", 1e9 + 20), ("b", 1e9 + 30)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_f_by(df, "v", "g").collect()[0]
    f, eta = _py_anova(rows)
    assert r["f_bp"] is not None
    assert abs(r["f_bp"] / 10000 - f) / max(f, 1) < 1e-6
    assert abs(r["eta2_bp"] / 10000 - eta) < 2e-3


# ---------------------------------------------- poisson bootstrap

def test_bootstrap_ci_exact_python_replica(spark):
    import hashlib
    from docetl_spark.functions.mlstats import _POIS_T, bootstrap_ci

    rows = [(i, "g%d" % (i % 2), 10.0 + (i % 7)) for i in range(120)]
    df = spark.createDataFrame(rows, "id bigint, g string, v double")
    got = {r["g"]: r for r in bootstrap_ci(
        df, "v", id_col="id", by=["g"], n_boot=40, seed=7).collect()}

    def u24(rid, b):
        h = hashlib.md5(f"7|{rid}".encode()).hexdigest()
        h1, h2 = int(h[:8], 16), int(h[8:16], 16)
        return (h1 + b * (h2 | 1)) % 16777216

    def w_of(u):
        for k, t in enumerate(_POIS_T):
            if u < t:
                return k
        return 9

    for g in ("g0", "g1"):
        sub = [(i, v) for i, gg, v in rows if gg == g]
        cents = {i: math.floor(v * 100 + 0.5) for i, v in sub}
        means = []
        for b in range(40):
            sw = sum(w_of(u24(i, b)) for i, _ in sub)
            swv = sum(w_of(u24(i, b)) * cents[i] for i, _ in sub)
            if sw > 0:
                means.append((swv // sw, b))
        means.sort()
        beff = len(means)
        klo = 500 * (beff - 1) // 20000
        assert got[g]["n"] == len(sub)
        assert got[g]["mean_cents"] == sum(cents.values()) // len(sub)
        assert got[g]["ci_lo_cents"] == means[klo][0]
        assert got[g]["ci_hi_cents"] == means[beff - 1 - klo][0]
        assert got[g]["n_boot"] == beff


def test_bootstrap_ci_properties(spark):
    from docetl_spark.functions.mlstats import bootstrap_ci

    df = spark.createDataFrame(
        [(i, float(i % 13)) for i in range(300)], "id bigint, v double")
    r = bootstrap_ci(df, "v", id_col="id", n_boot=60, seed=3).collect()[0]
    assert r["ci_lo_cents"] <= r["mean_cents"] <= r["ci_hi_cents"]
    # a wider level -> a narrower interval
    r80 = bootstrap_ci(df, "v", id_col="id", n_boot=60, seed=3,
                       level_bp=8000).collect()[0]
    assert (r80["ci_hi_cents"] - r80["ci_lo_cents"]
            <= r["ci_hi_cents"] - r["ci_lo_cents"])
    # same seed -> identical result; different seed -> (almost surely)
    # different interval
    again = bootstrap_ci(df, "v", id_col="id", n_boot=60, seed=3).collect()[0]
    assert again == r
    other = bootstrap_ci(df, "v", id_col="id", n_boot=60, seed=4).collect()[0]
    assert (other["ci_lo_cents"], other["ci_hi_cents"]) != (
        r["ci_lo_cents"], r["ci_hi_cents"])
    with pytest.raises(ValueError, match="n_boot"):
        bootstrap_ci(df, "v", id_col="id", n_boot=0)
    with pytest.raises(ValueError, match="level_bp"):
        bootstrap_ci(df, "v", id_col="id", level_bp=10000)


def test_bootstrap_ci_yaml(spark):
    from docetl_spark.plans.compiler import run_pipeline

    cfg = {
        "datasets": {"d": {"type": "memory", "data": [
            {"id": i, "v": float(i)} for i in range(30)]}},
        "operations": [
            {"name": "ci", "type": "bootstrap_ci", "value_col": "v",
             "id_col": "id", "n_boot": 20, "seed": 1}],
        "pipeline": {"steps": [
            {"name": "s1", "input": "d", "operations": ["ci"]}]},
    }
    out = run_pipeline(spark, cfg, backend=FakeBackend())
    r = out.df.collect()[0]
    assert r["n"] == 30 and r["n_boot"] <= 20
    assert r["ci_lo_cents"] <= r["ci_hi_cents"]
