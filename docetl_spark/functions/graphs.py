"""Distributed graph analytics over plain edge DataFrames — the
round-11 wave-5 home. No reference analogue (the reference engine
(docetl) has no graph layer); these extend the training-data-pipeline
surface: dedup-cluster shape audits (degree/component profiles),
co-occurrence graph structure (triangles / clustering coefficient as a
community-density signal), and influence scores (PageRank over
citation / co-edit / retrieval graphs) for curriculum weighting.

Contract matches functions/stats.py: decision figures are integer
arithmetic (basis points / fixed 10¹² rank mass — never a double near
a comparison), no bare global windows, no all-pairs joins (triangle
counting rides the degree-ordered orientation that bounds wedge work
at O(m^1.5) regardless of skew), and every op replays bit-for-bit in
the DuckDB oracle (same integral divisions, same orientation order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .stats import broadcast_scalar_join  # noqa: F401 — public re-export surface


def canonical_edges(
    df: DataFrame,
    src: str,
    dst: str,
) -> DataFrame:
    """Undirected edge canonicalization: (least, greatest) endpoint
    pair, self-loops and NULL endpoints dropped, exact distinct.
    Output columns ``src``/``dst`` with src < dst. One hash shuffle on
    the canonical pair (the exact-dedup plan); everything downstream
    keys on this grain."""
    return (
        df.filter(F.col(src).isNotNull() & F.col(dst).isNotNull()
                  & (F.col(src) != F.col(dst)))
        .select(F.least(F.col(src), F.col(dst)).alias("src"),
                F.greatest(F.col(src), F.col(dst)).alias("dst"))
        .distinct()
    )


def degree_table(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    directed: bool = False,
) -> DataFrame:
    """Per-node degree. Undirected (default): ``(node, degree)`` over
    the union of both endpoints — callers pass canonical_edges output.
    Directed: ``(node, out_degree, in_degree, degree)`` with degree =
    out + in. ONE map-side-combinable aggregation over the endpoint
    union; no joins."""
    if not directed:
        ends = edges.select(F.col(src).alias("node")).unionByName(
            edges.select(F.col(dst).alias("node")))
        return ends.groupBy("node").agg(
            F.count(F.lit(1)).cast("long").alias("degree"))
    ends = edges.select(
        F.col(src).alias("node"), F.lit(1).alias("_out"), F.lit(0).alias("_in")
    ).unionByName(edges.select(
        F.col(dst).alias("node"), F.lit(0).alias("_out"), F.lit(1).alias("_in")))
    return ends.groupBy("node").agg(
        F.sum("_out").cast("long").alias("out_degree"),
        F.sum("_in").cast("long").alias("in_degree"),
        F.count(F.lit(1)).cast("long").alias("degree"),
    )


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    assume_canonical: bool = False,
) -> DataFrame:
    """Per-node triangle participation + local clustering coefficient
    over an UNDIRECTED graph (edges are canonicalized here; callers
    may pass any (src, dst) pair table).

    The Suri–Vassilvitskii degree-ordered orientation: each undirected
    edge is directed from the endpoint that is SMALLER in the total
    order (degree, node) to the larger, so every node's oriented
    out-degree is O(√m) no matter how skewed the raw degrees are —
    intersecting the two endpoints' out-neighbor sets per edge then
    does O(m^1.5) work total instead of Σdeg² (which a star graph
    drives quadratic). Each triangle {a,b,c} is found EXACTLY once,
    as a common out-neighbor at its order-minimal edge.

    Output: ``(node, degree, triangles, cc_bp)`` for every node of the
    graph, where cc_bp = 2·triangles·10⁴ DIV (degree·(degree−1)) —
    floored basis points, NULL for degree < 2. Isolated vertices are
    not rows (no edges ⇒ not in the edge table).

    Plan: canonical shuffle → degree agg → orientation stamp → ONE
    collect_list aggregation (out-neighbor array per node, bounded by
    the O(√m) oriented out-degree) → two node-keyed joins attaching
    both endpoints' arrays to each oriented edge → per-edge
    array_intersect → explode only the actual triangle corners → count.
    """
    # cache: deg feeds the stamp AND the final output join, and the
    # oriented edge set is referenced three times (the neighbor-array
    # aggregation + both sides of the intersection join) — unpersisted,
    # the whole upstream edge pipeline would replay for each (release
    # handle on the result, the dedup/semdedup idiom)
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         if assume_canonical else canonical_edges(edges, src, dst))
    deg = degree_table(e).cache()
    # stamp both endpoints with their (degree, node) order key
    d1 = deg.select(F.col("node").alias("src"), F.col("degree").alias("_ds"))
    d2 = deg.select(F.col("node").alias("dst"), F.col("degree").alias("_dd"))
    stamped = e.join(d1, "src").join(d2, "dst")
    lo_first = (F.col("_ds") < F.col("_dd")) | (
        (F.col("_ds") == F.col("_dd")) & (F.col("src") < F.col("dst")))
    oriented = stamped.select(
        F.when(lo_first, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(lo_first, F.col("dst")).otherwise(F.col("src")).alias("hi"),
    ).cache()
    # r11 optimization (guide §2.3/§3.1, second pass): the former plan
    # MATERIALIZED the wedge set — Σ out-deg² rows (41M at sf0.1)
    # exploded from per-pivot neighbor arrays, then probed against the
    # edge table (broadcast under a gate, SortMergeJoin above it). The
    # same count falls out of per-EDGE set intersection: triangle
    # {x,y,z} with x<y<z in the (degree, node) order appears EXACTLY
    # once as z ∈ N_out(x) ∩ N_out(y) at its minimal oriented edge
    # (x,y) — z is a common out-neighbor of both endpoints, and at the
    # other two edges the third corner precedes an endpoint in the
    # order, so it sits in no out-list. Joining each oriented edge to
    # both endpoints' out-neighbor arrays (node-keyed joins of m rows
    # against the node-sized array table — never a Σd²-row shuffle) and
    # intersecting does the same O(Σd²) element work INSIDE a codegen'd
    # array op, materializes zero wedge rows, and explodes only the 3
    # corners of actual triangles. The broadcast gate now guards the
    # array-table side (total payload = m array elements, the same
    # bound the old edge-probe broadcast relied on).
    nb = oriented.groupBy(F.col("lo").alias("node")).agg(
        F.collect_list("hi").alias("_ns"))
    n1 = nb.select(F.col("node").alias("lo"), F.col("_ns").alias("_nlo"))
    n2 = nb.select(F.col("node").alias("hi"), F.col("_ns").alias("_nhi"))
    try:
        limit = int(edges.sparkSession.conf.get(
            "docetl.graphs.broadcastEdgeLimit", "4000000"))
    except Exception:
        limit = 4_000_000
    if limit > 0 and oriented.count() <= limit:
        n1, n2 = F.broadcast(n1), F.broadcast(n2)
    else:
        # r12 (guide §3.1): above the broadcast gate the planner picked
        # sort-merge, which SORTS the m-row oriented table twice and
        # the wide neighbor-array side once each — shuffled-hash builds
        # the node-sized array table per partition instead (its per-
        # partition build is bounded by the same O(m) total payload the
        # old broadcast relied on, now split across the shuffle).
        n1, n2 = n1.hint("shuffle_hash"), n2.hint("shuffle_hash")
    tri = (
        oriented.join(n1, "lo").join(n2, "hi", "left")
        .select("lo", "hi", F.expr(
            "array_intersect(_nlo, coalesce(_nhi, array()))").alias("_i"))
    )
    corners = tri.filter(F.size("_i") > 0).select(
        F.explode(F.expr(
            "concat(_i, array_repeat(lo, size(_i)),"
            " array_repeat(hi, size(_i)))")).alias("node"))
    per_node = corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("triangles"))
    out = deg.join(per_node, "node", "left").select(
        "node", "degree",
        F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
        F.when(
            F.col("degree") >= 2,
            F.expr("CAST(2 * CAST(coalesce(triangles, 0) AS DECIMAL(38,0))"
                   " * 10000 DIV (CAST(degree AS DECIMAL(38,0))"
                   " * (degree - 1)) AS BIGINT)"),
        ).alias("cc_bp"),
    )
    # release handles (list form, r12): both pinned frames
    out._docetl_cached_input = [oriented, deg]
    return out


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iters: int = 3,
    damping_bp: int = 8500,
    directed: bool = True,
    dedup: bool = True,
) -> DataFrame:
    """PageRank with a FIXED iteration count, exact in integer rank
    mass so it replays bit-for-bit cross-engine: total mass 10¹² is
    spread uniformly (rank₀ = 10¹² DIV n per node), and each iteration
    computes rank' = base + d·Σ_in (rank DIV outdeg) DIV 10⁴ with
    base = (10⁴ − damping_bp)·(10¹² DIV n) DIV 10⁴ — every division an
    integral DIV both engines floor identically. Mass lost to flooring
    and to dangling nodes (out-degree 0) is NOT redistributed — the
    documented variant: ranks are a lower bound on the limit ranks,
    and their ORDER (the decision output) matches the standard variant
    on graphs whose dangling mass is small; pass a strongly-connected
    edge set when absolute values matter. Undirected mode mirrors each
    edge first.

    Output: ``(node, rank_e12)`` — rank in 10⁻¹² units of total mass
    (BIGINT; Σ ≤ 10¹²). Fixed ``iters`` keeps the unrolled plan
    Catalyst-sized (each iteration is one src-join + one dst-agg);
    production graphs at 100 TB run iters ≤ ~10 with a localCheckpoint
    every few rounds to cut lineage — beyond that, sum-convergence
    should gate instead (out of scope for an exact-replay op).

    Plan: nodes/out-degrees aggregate once; per iteration ONE shuffle
    joining ranks to edges on src and ONE aggregation on dst (AQE
    re-plans skewed hubs); the uniform base rides a broadcast scalar,
    never a crossJoin.
    """
    if iters < 1:
        raise ValueError("pagerank: iters must be >= 1")
    if not (0 <= int(damping_bp) <= 10000):
        raise ValueError("pagerank: damping_bp must be in [0, 10000]")
    e = edges.filter(
        F.col(src).isNotNull() & F.col(dst).isNotNull()
        & (F.col(src) != F.col(dst))
    ).select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if dedup:
        e = e.distinct()
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        # r12 optimization (guide §2.4): hash-partition the mirrored
        # adjacency by src ONCE before caching. The out-degree/node
        # aggregation AND (on the symmetric edge set) every iteration's
        # contribution aggregation key on src, so they all reuse this
        # one exchange instead of re-shuffling the edge table per round
        # (explicit partition count = the session's shuffle parallelism,
        # so AQE cannot coalesce the cached layout out from under the
        # downstream distribution requirement).
        e = e.repartition(
            int(e.sparkSession.conf.get("spark.sql.shuffle.partitions")), "src")
    # cache: referenced once per iteration plus the node/out-degree
    # aggregations — unpersisted, the upstream edge pipeline replays
    # 2 + iters times (release handle on the result)
    e = e.cache()
    # r11 optimization (guide §2.4): on the UNDIRECTED (mirrored) path
    # every node appears as a src, so the node set IS the out-degree
    # table's key set — one aggregation replaces the separate
    # endpoint-union distinct shuffle AND the rank-init left join.
    # Directed graphs keep the union (dangling nodes never appear as
    # src but still hold rank).
    if directed:
        nodes = (e.select(F.col("src").alias("node"))
                 .unionByName(e.select(F.col("dst").alias("node"))).distinct()
                 .cache())
        outdeg = e.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).cast("long").alias("_od"))
    else:
        nodes = e.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).cast("long").alias("_od")).cache()
    # r11 optimization: n is needed only as a scalar in the closed-form
    # uniform base — count it on the driver (materializing the node
    # cache every downstream job reuses) and inline the EXACT python-int
    # arithmetic as literals. The former one-row aggregate +
    # broadcast_scalar_join attached the same numbers at runtime while
    # duplicating the distinct-node subtree in the plan.
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node", F.lit(None).cast("long").alias("rank_e12"))
    r0 = 10**12 // n
    base_lit = (10000 - int(damping_bp)) * r0 // 10000
    if directed:
        state = nodes.select(
            "node",
            F.lit(r0).cast("long").alias("_r0"),
            F.lit(base_lit).cast("long").alias("_base"),
        ).join(outdeg, "node", "left")
    else:
        state = nodes.select(
            "node",
            F.lit(r0).cast("long").alias("_r0"),
            F.lit(base_lit).cast("long").alias("_base"),
            F.col("_od"),
        )
    rank = state.select("node", F.col("_r0").alias("rank"), "_base", "_od")
    _iter_caches: list = []
    # r12 (guide §3.1): the rank table is node-sized; when the driver-
    # known node count clears the gate, broadcast it into the per-
    # iteration join so the (partitioned, cached) edge table is never
    # re-shuffled — above the gate the planner's strategy stands (a
    # 100 TB graph's rank table must shuffle). On the SYMMETRIC
    # undirected edge set, contrib[n] = Σ_{(n,m)∈E} rank[m] DIV od[m],
    # so the join can key on dst (contributor) and the aggregation on
    # src (receiver) — the key e was partitioned by: zero exchanges per
    # iteration under the gate. The directed path keeps src-join/
    # dst-agg (no symmetry to exploit).
    try:
        _node_limit = int(edges.sparkSession.conf.get(
            "docetl.graphs.broadcastNodeLimit", "4000000"))
    except Exception:
        _node_limit = 4_000_000
    _bcast = _node_limit > 0 and n <= _node_limit
    join_key, agg_key = ("src", "dst") if directed else ("dst", "src")
    for _ in range(int(iters)):
        contributors = rank.filter(F.col("_od").isNotNull()).select(
            F.col("node").alias(join_key),
            F.expr("CAST(rank DIV _od AS BIGINT)").alias("_c"))
        if _bcast:
            contributors = F.broadcast(contributors)
        contrib = (
            e.join(contributors, join_key)
            .groupBy(F.col(agg_key).alias("node"))
            .agg(F.sum("_c").alias("_in"))
        )
        if _bcast:
            # node-sized under the gate: the carry-over left join would
            # otherwise sort-merge two node tables (the planner can't
            # size the cached chains)
            contrib = F.broadcast(contrib)
        rank = rank.join(contrib, "node", "left").select(
            "node",
            F.expr(f"CAST(_base + {int(damping_bp)} * coalesce(_in, 0)"
                   " DIV 10000 AS BIGINT)").alias("rank"),
            "_base", "_od",
        ).cache()
        _iter_caches.append(rank)
        # r11 optimization (the label_propagation precedent): rank is
        # referenced TWICE next iteration (the contribution join and
        # the rank carry-over) — uncached, each iteration's lineage
        # re-executes the previous one, doubling work per round. The
        # cached frame is node-sized; caches release with the session's
        # clearCache / storage eviction.
    out = rank.select("node", F.col("rank").alias("rank_e12"))
    # release handles (list form, r12): the edge cache, the node/
    # out-degree cache, and every iteration's rank cache
    out._docetl_cached_input = [e, nodes] + _iter_caches
    return out


def graph_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 20,
    local_edge_gate: int = 2_000_000,
    assume_canonical: bool = False,
) -> DataFrame:
    """Connected components of the undirected graph — the public verb
    over dedup.connected_components (component id = min member id;
    driver union-find under ``local_edge_gate`` edges, distributed
    min-label propagation beyond — the fuzzy-dedup machinery).
    Output: ``(node, component)`` for every edge endpoint."""
    # cached: the union-find gate probe collects the edge sample AND
    # the vertex enumeration reads it — unpersisted, the upstream edge
    # pipeline replays twice (release handle on the result)
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         if assume_canonical else canonical_edges(edges, src, dst)).select(
        F.col("src").alias("id_a"), F.col("dst").alias("id_b")).cache()
    from .dedup import connected_components

    verts = (e.select(F.col("id_a").alias("node"))
             .unionByName(e.select(F.col("id_b").alias("node"))).distinct())
    out = connected_components(
        e, verts, "node", max_iter=max_iter, local_edge_gate=local_edge_gate)
    out = out.select("node", "component")
    out._docetl_cached_input = e  # release: .unpersist() when done
    return out


def jaccard_neighbors(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    min_common: int = 1,
    max_pivot_degree: int | None = 10_000,
    assume_canonical: bool = False,
) -> DataFrame:
    """Neighborhood Jaccard similarity for every node pair sharing at
    least ``min_common`` neighbors in the UNDIRECTED graph — the
    structural analogue of MinHash near-dup: two entities are similar
    because they co-occur with the same third parties (co-purchase,
    co-citation, shared-session), no text or embedding needed.

    jaccard_bp = 10⁴·|N(a)∩N(b)| DIV (deg(a) + deg(b) − |N(a)∩N(b)|)
    — one integral division of exact integers (a and b adjacent or
    not, their own edge is not a shared neighbor; this is the pure
    common-neighbor Jaccard).

    Common-neighbor counting must see EVERY pivot (unlike triangle
    counting, where the degree orientation counts each triangle once
    at its minimal corner), so the wedge join here is Σ deg(p)² work —
    quadratic in hub degree. ``max_pivot_degree`` (default 10⁴) drops
    hub pivots above the threshold from the pivot role with a loud
    plan consequence documented here instead of an OOM: a node of
    degree d contributes d² wedge rows but its neighbors' pairwise
    Jaccard numerators each gain only 1 from it, so excluding extreme
    hubs biases scores DOWN by at most (hubs shared)/(union) — the
    standard practical cut (set ``None`` to disable on graphs known
    hub-free). The cut is on a deterministic degree threshold, so the
    oracle replays it exactly.

    Output: ``(node_a, node_b, common, degree_a, degree_b,
    jaccard_bp)`` with node_a < node_b, only pairs with common ≥
    ``min_common``.

    Plan: canonical shuffle → degree agg → adjacency mirrored once →
    (optionally hub-cut) wedge self-join on the pivot → one count
    aggregation on the pair → two broadcast-free degree joins. AQE
    handles residual pivot skew under the cap.
    """
    if min_common < 1:
        raise ValueError("jaccard_neighbors: min_common must be >= 1")
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         if assume_canonical else canonical_edges(edges, src, dst))
    # mirrored adjacency: pivot -> neighbor. Cached: the wedge
    # self-join, the degree aggregation, and the hub cut all read it —
    # unpersisted, the upstream edge pipeline replays 4x (release
    # handle on the result, the dedup/semdedup idiom)
    # r12 optimization (guide §2.4): hash-partition the mirrored
    # adjacency by the pivot ONCE before caching — the degree
    # aggregation, the hub cut, and the neighbor-list aggregation all
    # key on _p and reuse this single exchange (explicit partition
    # count so AQE can't coalesce the cached layout below the
    # downstream distribution requirements).
    adj = e.select(F.col("src").alias("_p"), F.col("dst").alias("_nb")) \
        .unionByName(
            e.select(F.col("dst").alias("_p"), F.col("src").alias("_nb"))) \
        .repartition(
            int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions")),
            "_p") \
        .cache()
    deg = adj.groupBy(F.col("_p").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree"))
    piv = adj
    if max_pivot_degree is not None:
        # r12 (the _fp_pairs precedent, guide §2.3): the hub cut is a
        # count window over the SAME _p partitioning the adjacency
        # already has — the former degree-aggregate + join-back pair
        # re-shuffled the adjacency; a hub's rows met one exchange on
        # _p either way, so skew exposure is unchanged. Same degrees,
        # same surviving pivots.
        from pyspark.sql import Window as W

        piv = adj.withColumn(
            "_pd", F.count(F.lit(1)).over(W.partitionBy("_p"))
        ).filter(F.col("_pd") <= int(max_pivot_degree)).drop("_pd")
    # r11 optimization (guide §2.4): the former a⋈b self-join on the
    # pivot shuffled the adjacency twice and generated d² rows per
    # pivot before the _a < _b filter; collecting each (hub-capped, so
    # array ≤ max_pivot_degree — memory-bounded by construction)
    # pivot's sorted neighbor list in ONE aggregation and exploding
    # only the i<j pairs via a JVM higher-order function halves the
    # generated rows and drops the join machinery outright. Same pair
    # multiset: (p, nb) is unique in the mirrored adjacency, so
    # collect_list needs no dedup and sort_array gives _a < _b.
    nbrs = piv.groupBy("_p").agg(
        F.sort_array(F.collect_list("_nb")).alias("_ns"))
    pairs = (
        nbrs.select(F.explode(F.expr(
            "flatten(transform(_ns, (x, i) -> "
            "transform(slice(_ns, i + 2, size(_ns) - i - 1), "
            "y -> struct(x AS a, y AS b))))"
        )).alias("_w"))
        .groupBy(F.col("_w.a").alias("node_a"), F.col("_w.b").alias("node_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
        .filter(F.col("common") >= int(min_common))
    )
    da = deg.select(F.col("node").alias("node_a"),
                    F.col("degree").alias("degree_a"))
    db = deg.select(F.col("node").alias("node_b"),
                    F.col("degree").alias("degree_b"))
    out = pairs.join(da, "node_a").join(db, "node_b").select(
        "node_a", "node_b", "common", "degree_a", "degree_b",
        F.expr("CAST(common * 10000"
               " DIV (degree_a + degree_b - common) AS BIGINT)")
        .alias("jaccard_bp"),
    )
    out._docetl_cached_input = adj  # release: .unpersist() when done
    return out


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    node_col: str = "node",
    label_col: str = "label",
    iters: int = 2,
    assume_canonical: bool = False,
) -> DataFrame:
    """Semi-supervised label spreading over the undirected graph with a
    FIXED iteration count and a total deterministic tie-break — the
    dedup-pipeline use: propagate scarce human quality/topic labels
    across a similarity graph (near-dup edges, co-occurrence edges) to
    the unlabeled majority.

    Synchronous update: each round, every node currently unlabeled OR
    non-seed takes the most frequent label among its labeled
    neighbors, ties broken by the SMALLEST label string; seed nodes
    never change (clamped). Nodes with no labeled neighbor stay
    unlabeled that round. ``iters`` rounds reach every node within
    ``iters`` hops of a seed — fixed, so the plan is Catalyst-sized
    and the figure replays exactly (asynchronous/convergence LPA is
    run-order-dependent by construction and can't be an oracle-paired
    op).

    Output: ``(node, label, is_seed)`` for every edge endpoint; label
    NULL where no seed is within reach.

    Plan per round: ONE join of current labels onto the mirrored
    adjacency + one (node, label) count aggregation + one
    row_number(count DESC, label ASC) window riding the node shuffle —
    O(m) per round, hub-safe (a hub aggregates its neighbor labels,
    never materializes pairs).
    """
    if iters < 1:
        raise ValueError("label_propagation: iters must be >= 1")
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         if assume_canonical else canonical_edges(edges, src, dst))
    # cached: one vote join per round plus the node enumeration —
    # unpersisted, the upstream edge pipeline replays iters + 1 times
    # (release handle on the result)
    # r12 optimization (guide §2.4): hash-partition the mirrored
    # adjacency by the receiving node ONCE before caching — each
    # round's vote aggregation (groupBy(_n, _nl): hash(_n) clusters it)
    # and tie-break window (partitionBy(_n)) then reuse this exchange
    # instead of shuffling twice per round. Explicit partition count so
    # AQE can't coalesce the cached layout below the requirement.
    adj = e.select(F.col("src").alias("_n"), F.col("dst").alias("_nb")) \
        .unionByName(
            e.select(F.col("dst").alias("_n"), F.col("src").alias("_nb"))) \
        .repartition(
            int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions")),
            "_n") \
        .cache()
    nodes = adj.select("_n").distinct()
    seed = seeds.filter(
        F.col(node_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(F.col(node_col).alias("_n"),
             F.col(label_col).cast("string").alias("_seed")).distinct()
    cur = nodes.join(seed, "_n", "left").select(
        "_n", F.col("_seed"), F.col("_seed").alias("_lbl"))
    from pyspark.sql import Window as W

    # r12 (guide §3.1): the label table is node-sized — under the gate,
    # broadcast it into each round's vote join so the partitioned cached
    # adjacency is never re-shuffled on _nb (the planner cannot know a
    # cached-chain's size and may pick a sort-merge join that would
    # destroy the layout). Above the gate the planner decides — a
    # 100 TB graph's label table must shuffle. The node count is a
    # driver count over the cached adjacency's key set, the pagerank
    # precedent; it materializes the cache every later round reuses.
    try:
        _node_limit = int(edges.sparkSession.conf.get(
            "docetl.graphs.broadcastNodeLimit", "4000000"))
    except Exception:
        _node_limit = 4_000_000
    _bcast = _node_limit > 0 and nodes.count() <= _node_limit
    _round_caches: list = []

    for _ in range(int(iters)):
        labeled = cur.select(F.col("_n").alias("_nb"),
                             F.col("_lbl").alias("_nl"))
        if _bcast:
            labeled = F.broadcast(labeled)
        votes = (
            adj.join(labeled, "_nb")
            .filter(F.col("_nl").isNotNull())
            .groupBy("_n", "_nl")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        best = votes.withColumn(
            "_rk", F.row_number().over(
                W.partitionBy("_n").orderBy(F.col("_c").desc(),
                                            F.col("_nl").asc()))
        ).filter(F.col("_rk") == 1).select("_n", F.col("_nl").alias("_best"))
        if _bcast:
            # node-sized under the gate: the carry-over left join would
            # otherwise sort-merge two node tables
            best = F.broadcast(best)
        cur = cur.join(best, "_n", "left").select(
            "_n", "_seed",
            F.coalesce(F.col("_seed"), F.col("_best"), F.col("_lbl"))
            .alias("_lbl"),
        ).cache()
        _round_caches.append(cur)
        # r11 optimization: cur is referenced TWICE next round (the
        # vote join and the label carry-over) — uncached, each round's
        # lineage re-executes the previous round's vote join, doubling
        # work per iteration. The cached frame is node-sized (tiny next
        # to the adjacency); caches release with the session's
        # clearCache / storage eviction.
    out = cur.select(
        F.col("_n").alias("node"), F.col("_lbl").alias("label"),
        F.col("_seed").isNotNull().alias("is_seed"))
    # release handles (list form, r12): the adjacency plus every
    # round's label cache
    out._docetl_cached_input = [adj] + _round_caches
    return out


# assume_canonical / dedup contract note (triangle_count, pagerank,
# jaccard_neighbors, graph_components, label_propagation): the flags
# skip the canonicalization shuffle when the CALLER guarantees the
# edge table is already (src < dst, distinct, no self-loops/NULLs) —
# e.g. the output of canonical_edges or a pair-mining aggregation.
# Passing an unclean table with the flag set silently double-counts:
# the flag is a physical-plan promise, not a hint. Property test
# test_properties_r11b pins flag-on == flag-off on canonical inputs.
