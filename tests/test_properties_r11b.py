"""Property-based invariants for the wave-5 graph module: the
degree-ordered triangle count and every-pivot Jaccard must match their
brute-force definitions on ANY random graph (skewed, disconnected,
multi-edge), and fixed-iteration PageRank must match an integer
reference simulation exactly — the fixed-testdata oracle pins only one
graph shape; these pin the algorithms."""

from __future__ import annotations

import collections
import itertools
import sys
from pathlib import Path

from hypothesis import HealthCheck, given, settings, strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SPARK_SETTINGS = dict(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edge_lists = st.lists(
    st.tuples(st.integers(min_value=0, max_value=11),
              st.integers(min_value=0, max_value=11)),
    min_size=1, max_size=40)


@given(edges=edge_lists)
@settings(**SPARK_SETTINGS)
def test_triangles_match_bruteforce_any_graph(spark, edges):
    from docetl_spark.functions.graphs import triangle_count

    df = spark.createDataFrame(edges, "u bigint, v bigint")
    got = {r["node"]: (r["degree"], r["triangles"])
           for r in triangle_count(df, "u", "v").collect()}
    adj = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b), adj[b].add(a)
    want = {
        n: (len(nb), sum(1 for x, y in itertools.combinations(sorted(nb), 2)
                         if y in adj[x]))
        for n, nb in adj.items()}
    assert got == want


@given(edges=edge_lists)
@settings(**SPARK_SETTINGS)
def test_jaccard_matches_bruteforce_any_graph(spark, edges):
    from docetl_spark.functions.graphs import jaccard_neighbors

    df = spark.createDataFrame(edges, "u bigint, v bigint")
    got = {(r["node_a"], r["node_b"]): (r["common"], r["jaccard_bp"])
           for r in jaccard_neighbors(df, "u", "v").collect()}
    adj = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b), adj[b].add(a)
    want = {}
    for a, b in itertools.combinations(sorted(adj), 2):
        c = len(adj[a] & adj[b])
        if c >= 1:
            want[(a, b)] = (
                c, c * 10000 // (len(adj[a]) + len(adj[b]) - c))
    assert got == want


@given(edges=edge_lists,
       iters=st.integers(min_value=1, max_value=3),
       damping=st.integers(min_value=0, max_value=10000))
@settings(**SPARK_SETTINGS)
def test_pagerank_matches_integer_sim_any_graph(spark, edges, iters, damping):
    from docetl_spark.functions.graphs import pagerank

    clean = sorted({(a, b) for a, b in edges if a != b})
    if not clean:
        return
    df = spark.createDataFrame(clean, "u bigint, v bigint")
    got = {r["node"]: r["rank_e12"]
           for r in pagerank(df, "u", "v", iters=iters,
                             damping_bp=damping).collect()}
    nodes = sorted({x for e in clean for x in e})
    n, sc = len(nodes), 10 ** 12
    od = collections.Counter(a for a, _ in clean)
    base = ((10000 - damping) * (sc // n)) // 10000
    r = {x: sc // n for x in nodes}
    for _ in range(iters):
        inc = collections.defaultdict(int)
        for a, b in clean:
            inc[b] += r[a] // od[a]
        r = {x: base + (damping * inc[x]) // 10000 for x in nodes}
    assert got == r


@given(edges=edge_lists)
@settings(**SPARK_SETTINGS)
def test_assume_canonical_matches_default_on_canonical_input(spark, edges):
    """flag-on == flag-off when the input IS canonical (the contract
    the registry queries rely on)."""
    from docetl_spark.functions.graphs import (
        canonical_edges, graph_components, jaccard_neighbors, pagerank,
        triangle_count)

    raw = spark.createDataFrame(edges, "u bigint, v bigint")
    canon = canonical_edges(raw, "u", "v").cache()
    if canon.count() == 0:
        return
    for fn, kw_off, kw_on in [
        (triangle_count, {}, {"assume_canonical": True}),
        (jaccard_neighbors, {}, {"assume_canonical": True}),
        (graph_components, {}, {"assume_canonical": True}),
        (pagerank, {"iters": 2, "directed": False}, {
            "iters": 2, "directed": False, "dedup": False}),
    ]:
        a = sorted(tuple(r) for r in fn(canon, "src", "dst", **kw_off).collect())
        b = sorted(tuple(r) for r in fn(canon, "src", "dst", **kw_on).collect())
        assert a == b, fn.__name__
    canon.unpersist()
