"""Cluster operator: agglomerative clustering over embeddings with
LLM summaries along the tree path.

Reference semantics: /root/reference/docetl/operations/cluster.py:14-310
- sklearn AgglomerativeClustering over item embeddings (162-185) builds
  a binary merge tree; optional quantile collapse (187-234);
- an LLM summary per internal node (236+);
- each row annotated with the path of summaries root->leaf in
  ``output_key``.

Spark realization: embeddings are computed distributed (backend UDF).
The linkage itself is inherently O(n^2) single-node in the reference
too, so we gate it: up to ``max_local_size`` rows the merge tree is
built driver-side in numpy (average linkage); beyond that, callers
should pre-partition (e.g. LSH buckets) and cluster per bucket. Node
summaries run through the backend; row annotation is a broadcast join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F, types as T

from ..backend import ModelBackend
from .resolve import embed_column
from .semantic import render_prompt


def _agglomerative(vectors: np.ndarray) -> list[tuple[int, int]]:
    """Centroid-linkage agglomerative merge order over row vectors.
    Returns merges [(i, j), ...] of cluster ids; new cluster k = n +
    merge_index (scipy/sklearn convention).

    Vectorized nearest-neighbor-array algorithm: a full distance matrix
    plus per-slot nearest-neighbor caches give ~O(n^2) expected work in
    numpy (vs the naive O(n^3) Python scan). O(n^2) memory — gated by
    the caller's ``max_local_size``."""
    n = len(vectors)
    if n <= 1:
        return []
    cent = np.array(vectors, dtype=float, copy=True)
    size = np.ones(n)
    cluster_id = np.arange(n)
    active = np.ones(n, dtype=bool)
    sq = np.einsum("ij,ij->i", cent, cent)
    D = np.sqrt(np.maximum(sq[:, None] + sq[None, :] - 2.0 * cent @ cent.T, 0.0))
    np.fill_diagonal(D, np.inf)
    rng = np.arange(n)
    nn_idx = D.argmin(axis=1)
    nn_dist = D[rng, nn_idx]
    merges: list[tuple[int, int]] = []
    next_id = n
    for _ in range(n - 1):
        i = int(np.argmin(nn_dist))
        j = int(nn_idx[i])
        a, b = int(cluster_id[i]), int(cluster_id[j])
        merges.append((min(a, b), max(a, b)))
        if j < i:
            i, j = j, i  # keep the lower slot for the merged cluster
        new = (cent[i] * size[i] + cent[j] * size[j]) / (size[i] + size[j])
        cent[i] = new
        size[i] += size[j]
        active[j] = False
        cluster_id[i] = next_id
        next_id += 1
        idx_active = np.flatnonzero(active)
        diff = cent[idx_active] - new
        d = np.sqrt(np.einsum("ij,ij->i", diff, diff))
        D[i, idx_active] = d
        D[idx_active, i] = d
        D[i, i] = np.inf
        D[j, :] = np.inf
        D[:, j] = np.inf
        nn_dist[j] = np.inf
        # rows that pointed at a merged slot re-scan; everyone else only
        # checks whether the merged centroid is now closer
        stale = idx_active[(nn_idx[idx_active] == i) | (nn_idx[idx_active] == j)]
        for r in stale:
            nn_idx[r] = int(np.argmin(D[r]))
            nn_dist[r] = D[r, nn_idx[r]]
        better = idx_active[D[i, idx_active] < nn_dist[idx_active]]
        nn_idx[better] = i
        nn_dist[better] = D[better, i]
        nn_idx[i] = int(np.argmin(D[i]))
        nn_dist[i] = D[i, nn_idx[i]]
    return merges


def _tree_paths(
    n: int,
    merges: list[tuple[int, int]],
    summarize,
    label_nodes: set[int] | None = None,
) -> list[list[str]]:
    """Root->leaf ancestor-summary path per leaf of a merge tree.
    ``summarize(node, leaf_indices)`` labels an internal node; only nodes
    in ``label_nodes`` (default: all internal nodes) are summarized and
    appear in paths. All walks are iterative — a degenerate chain tree is
    n deep (> recursion limit)."""
    children: dict[int, tuple[int, int]] = {n + k: m for k, m in enumerate(merges)}

    def leaves_of(node: int) -> list[int]:
        out, stack = [], [node]
        while stack:
            cur = stack.pop()
            if cur < n:
                out.append(cur)
            else:
                a, b = children[cur]
                stack.append(b)
                stack.append(a)
        return out

    summaries: dict[int, str] = {}
    for node in sorted(children):
        if label_nodes is not None and node not in label_nodes:
            continue
        summaries[node] = summarize(node, leaves_of(node))

    paths: list[list[str]] = [[] for _ in range(n)]
    if children:  # walk root down; root = last merge node
        stack: list[tuple[int, list[str]]] = [(max(children), [])]
        while stack:
            node, path = stack.pop()
            if node < n:
                paths[node] = path
                continue
            p = path + [summaries[node]] if node in summaries else path
            a, b = children[node]
            stack.append((b, p))
            stack.append((a, p))
    return paths


def cluster(
    df: DataFrame,
    backend: ModelBackend,
    *,
    id_col: str,
    embedding_keys: list[str] | None = None,
    embedding_col: str | None = None,
    summary_prompt: str | None = None,
    output_key: str = "clusters",
    max_levels: int | None = None,
    max_local_size: int = 10_000,
) -> DataFrame:
    """Annotate each row with its root->leaf path of cluster summaries.
    ``embedding_col`` uses a precomputed vector column instead of
    embedding ``embedding_keys`` through the backend."""
    owned_cache = None
    if embedding_col:
        emb = df.withColumn("_emb", F.col(embedding_col).cast(T.ArrayType(T.DoubleType())))
    elif embedding_keys:
        # persist: the gate count and the fetch below would otherwise
        # each run the embed MODEL stage — double the backend calls for
        # the same rows (same class as the minhash CC double-evaluation)
        emb = embed_column(df, embedding_keys, backend, out_col="_emb").persist()
        owned_cache = emb
    else:
        raise ValueError("cluster: provide embedding_keys or embedding_col")
    # gate BEFORE the fetch; limit(n+1) lets the count stop early, so the
    # gate costs O(max_local_size) rows (an ungated collect of an
    # over-sized input would OOM the driver before the check fires).
    # try/finally: a failing gate, collect, or embed UDF must not leave
    # the cached embeddings pinned for the session's lifetime
    try:
        n_rows = emb.limit(max_local_size + 1).count()
        if n_rows > max_local_size:
            raise ValueError(
                f"cluster: {n_rows} rows exceeds max_local_size={max_local_size}; "
                "use cluster_distributed, or pre-partition (e.g. LSH buckets) and cluster per group"
            )
        rows = emb.select(id_col, "_emb").orderBy(id_col).collect()
    finally:
        if owned_cache is not None:
            owned_cache.unpersist()  # everything is driver-side from here
    ids = [r[id_col] for r in rows]
    vecs = np.array([r["_emb"] for r in rows])
    merges = _agglomerative(vecs) if len(ids) > 1 else []
    n = len(ids)

    label_nodes: set[int] | None = None
    if max_levels is not None and merges:
        label_nodes = set(sorted(n + k for k in range(len(merges)))[-max_levels * 2:])

    def summarize(node: int, leaf_idx: list[int]) -> str:
        leaf_ids = [ids[i] for i in leaf_idx]
        if summary_prompt:
            items = [{"id": i} for i in leaf_ids]
            rendered = render_prompt(summary_prompt, {"inputs": items})
            return str(backend.complete(rendered, {"summary": "str"}, items).get("summary"))
        return f"cluster[{len(leaf_ids)}]"

    paths = _tree_paths(n, merges, summarize, label_nodes)

    spark = df.sparkSession
    schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType, True),
        T.StructField(output_key, T.ArrayType(T.StringType()), True),
    ])
    rows = [{id_col: ids[i], output_key: paths[i]} for i in range(n)]
    # Arrow literal frame (JVM LocalRelation) — the pickled-RDD path
    # pays a Python-worker round trip per downstream action (r11
    # ann_ivf_persisted finding). Gated on flat atomic non-temporal id
    # types (r12, ADVICE r11: temporal values can Arrow-convert to
    # different values silently); otherwise the portable pickled path.
    from ..session import arrow_literal_ok

    path_df = None
    if arrow_literal_ok(schema):
        try:
            import pyarrow as pa
            from pyspark.sql.pandas.types import to_arrow_schema

            path_df = spark.createDataFrame(
                pa.Table.from_pylist(rows, schema=to_arrow_schema(schema)),
                schema=schema)
        except Exception:
            path_df = None
    if path_df is None:
        path_df = spark.createDataFrame(
            [(ids[i], paths[i]) for i in range(n)], schema=schema)
    return df.join(F.broadcast(path_df), id_col, "left")


def cluster_distributed(
    df: DataFrame,
    backend: ModelBackend | None = None,
    *,
    id_col: str,
    embedding_keys: list[str] | None = None,
    embedding_col: str | None = None,
    summary_prompt: str | None = None,
    output_key: str = "clusters",
    n_buckets: int | None = None,
    max_local_size: int = 10_000,
    seed: int = 42,
) -> DataFrame:
    """Scale path for :func:`cluster`: two-level hierarchical clustering
    that never materializes the corpus on the driver.

    1. Coarse k-means buckets via :func:`~docetl_spark.functions.
       similarity.ivf_index` — the fit sees a bounded sample (default
       16k rows), assignment streams executor-side against broadcast
       centroids.
    2. Per-bucket agglomerative linkage inside ``applyInPandas`` (one
       bucket = one pandas group; rows sorted by id for determinism), so
       the O(bucket^2) linkage runs in parallel across executors.
    3. A driver-side merge tree over the (tiny, <= n_buckets) bucket
       centroids stitches the buckets into one global hierarchy; each
       row's path = top-tree ancestor labels ++ bucket-local path.

    Deterministic labels are ``cluster[n_leaves]`` exactly like
    :func:`cluster`, so the global root label is ``cluster[total_rows]``.
    With ``summary_prompt``, bucket-local internal nodes summarize their
    leaf items (backend is pickled into the UDF — per-executor calls),
    while top-tree nodes summarize their child buckets' ROOT summaries
    (hierarchical roll-up; the driver only ever sees one summary string
    per bucket). Reference semantics: cluster.py:162-234; the two-level
    decomposition is the documented deviation that makes it distributed.
    """
    from ..functions.similarity import ivf_index

    owned_cache = None
    if embedding_col:
        emb = df.withColumn("_emb", F.col(embedding_col).cast(T.ArrayType(T.DoubleType())))
    elif embedding_keys:
        if backend is None:
            raise ValueError("cluster_distributed: embedding_keys needs a backend")
        # persist: the total count, the IVF sample fit and the list-
        # assignment pass each consume this lineage — unpersisted, the
        # embed MODEL stage would re-bill the backend up to 3x for the
        # same rows (same class as the minhash CC double-evaluation)
        emb = embed_column(df, embedding_keys, backend, out_col="_emb").persist()
        owned_cache = emb
    else:
        raise ValueError("cluster_distributed: provide embedding_keys or embedding_col")

    # try/finally: a failing count, IVF fit, or per-bucket linkage must
    # not leave the cached embeddings pinned for the session's lifetime.
    # The finally runs after the stats collect has materialized the
    # persisted `local`, so nothing downstream re-reads the embed lineage.
    try:
        total = emb.count()
        if total == 0:
            return df.withColumn(output_key, F.lit(None).cast(T.ArrayType(T.StringType())))
        if n_buckets is None:
            n_buckets = max(1, -(-total // max(1, max_local_size // 2)))  # ceil-div

        indexed, _cents = ivf_index(emb, "_emb", n_lists=n_buckets, seed=seed)

        id_type = df.schema[id_col].dataType
        local_schema = T.StructType([
            T.StructField("_bucket", T.LongType(), True),
            T.StructField(id_col, id_type, True),
            T.StructField("_local_path", T.ArrayType(T.StringType()), True),
            T.StructField("_bucket_centroid", T.ArrayType(T.DoubleType()), True),
        ])
        prompt = summary_prompt
        be = backend if summary_prompt else None  # only pickle the backend when needed

        def per_bucket(pdf: "pd.DataFrame") -> "pd.DataFrame":
            import pandas as pd  # noqa: F811 — executor-side import

            pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
            ids = pdf[id_col].tolist()
            vecs = np.array(pdf["_emb"].tolist(), dtype=float)
            merges = _agglomerative(vecs) if len(ids) > 1 else []

            def summarize(node: int, leaf_idx: list[int]) -> str:
                if prompt and be is not None:
                    items = [{"id": ids[i]} for i in leaf_idx]
                    rendered = render_prompt(prompt, {"inputs": items})
                    return str(be.complete(rendered, {"summary": "str"}, items).get("summary"))
                return f"cluster[{len(leaf_idx)}]"

            paths = _tree_paths(len(ids), merges, summarize)
            centroid = vecs.mean(axis=0).tolist()
            return pd.DataFrame({
                "_bucket": pdf["_ivf_list"],
                id_col: ids,
                "_local_path": paths,
                "_bucket_centroid": [centroid] * len(ids),
            })

        # Project to the 3 needed columns BEFORE the pandas barrier (column
        # pruning stops at applyInPandas), and persist: `local` is consumed
        # twice (bucket stats collect + the path join) and each recompute
        # would re-run the linkage and any LLM summary calls.
        local = (
            indexed.select(id_col, "_emb", "_ivf_list")
            .groupBy("_ivf_list")
            .applyInPandas(per_bucket, schema=local_schema)
            .persist()
        )
        # Tiny per-bucket stats for the top tree: <= n_buckets rows. The
        # bucket's root label is _local_path[0] of any member (paths are
        # uniform at depth 1 within a bucket); size-1 buckets have an
        # empty local path — their label is cluster[1] by construction.
        stats = (
            local.groupBy("_bucket")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.first("_bucket_centroid").alias("_centroid"),
                # try_: a size-1 bucket has an empty local path (ANSI element_at throws)
                F.first(F.try_element_at("_local_path", F.lit(1))).alias("_root_summary"),
            )
            .orderBy("_bucket")
            .collect()
        )
    finally:
        if owned_cache is not None:
            owned_cache.unpersist()
    buckets = [r["_bucket"] for r in stats]
    sizes = [r["_n"] for r in stats]
    roots = [r["_root_summary"] if r["_root_summary"] is not None else "cluster[1]" for r in stats]
    cents = np.array([r["_centroid"] for r in stats], dtype=float)
    top_merges = _agglomerative(cents) if len(buckets) > 1 else []

    def summarize_top(node: int, leaf_idx: list[int]) -> str:
        if prompt and backend is not None:
            items = [{"summary": roots[i]} for i in leaf_idx]
            rendered = render_prompt(prompt, {"inputs": items})
            return str(backend.complete(rendered, {"summary": "str"}, items).get("summary"))
        return f"cluster[{sum(sizes[i] for i in leaf_idx)}]"

    top_paths = _tree_paths(len(buckets), top_merges, summarize_top)

    spark = df.sparkSession
    # r11 optimization (guide §4/§6, the ann_ivf_persisted finding): a
    # list-of-tuples createDataFrame takes the pickled-RDD path and
    # every action reading it pays a Python-worker round trip (~1.5 s
    # measured per action on local[32]); a pyarrow.Table becomes a JVM
    # LocalRelation (~0.2 s).
    import pyarrow as pa

    prefix_schema = T.StructType([
        T.StructField("_bucket", T.LongType(), True),
        T.StructField("_top_path", T.ArrayType(T.StringType()), True),
    ])
    prefix_df = spark.createDataFrame(
        pa.Table.from_arrays(
            [pa.array([int(b) for b in buckets], type=pa.int64()),
             pa.array(top_paths, type=pa.list_(pa.string()))],
            names=["_bucket", "_top_path"],
        ),
        schema=prefix_schema,
    )
    path_df = (
        local.join(F.broadcast(prefix_df), "_bucket")
        .select(
            id_col,
            F.concat("_top_path", "_local_path").alias(output_key),
        )
    )
    # materialize the (id, path) table eagerly so the bucket stage's cache
    # — embeddings + per-bucket centroids, and any LLM summary work — can
    # be released instead of staying pinned for the session; the
    # checkpointed table is two narrow columns and is freed with the
    # returned DataFrame
    path_df = path_df.localCheckpoint(eager=True)
    local.unpersist()
    return df.join(path_df, id_col, "left")
