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
    if embedding_col:
        emb = df.withColumn("_emb", F.col(embedding_col).cast(T.ArrayType(T.DoubleType())))
    elif embedding_keys:
        emb = embed_column(df, embedding_keys, backend, out_col="_emb")
    else:
        raise ValueError("cluster: provide embedding_keys or embedding_col")
    rows = emb.select(id_col, "_emb").orderBy(id_col).collect()
    if len(rows) > max_local_size:
        raise ValueError(
            f"cluster: {len(rows)} rows exceeds max_local_size={max_local_size}; "
            "pre-partition (e.g. LSH buckets) and cluster per group"
        )
    ids = [r[id_col] for r in rows]
    vecs = np.array([r["_emb"] for r in rows])
    merges = _agglomerative(vecs) if len(ids) > 1 else []

    n = len(ids)
    children: dict[int, tuple[int, int]] = {n + k: m for k, m in enumerate(merges)}

    def leaves_of(node: int) -> list[int]:
        # iterative: a degenerate chain tree is n deep (> recursion limit)
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

    # summaries bottom-up (internal nodes only), path per leaf
    summaries: dict[int, str] = {}
    order = sorted(children)
    if max_levels is not None and len(order) > 0:
        order = order[-max_levels * 2:]  # coarse cap on summarized nodes
    for node in order:
        leaf_ids = [ids[i] for i in leaves_of(node)]
        if summary_prompt:
            items = [{"id": i} for i in leaf_ids]
            rendered = render_prompt(summary_prompt, {"inputs": items})
            summaries[node] = str(backend.complete(rendered, {"summary": "str"}, items).get("summary"))
        else:
            summaries[node] = f"cluster[{len(leaf_ids)}]"

    paths: dict[int, list[str]] = {i: [] for i in range(n)}
    # walk from root down (iterative, see leaves_of): root = last merge node
    if children:
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

    spark = df.sparkSession
    path_df = spark.createDataFrame(
        [(ids[i], paths[i]) for i in range(n)],
        schema=T.StructType([
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField(output_key, T.ArrayType(T.StringType()), True),
        ]),
    )
    return df.join(F.broadcast(path_df), id_col, "left")
