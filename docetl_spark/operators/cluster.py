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
    """Average-linkage agglomerative merge order over row vectors.
    Returns merges [(i, j), ...]; new cluster k = n + merge_index
    (scipy/sklearn convention). O(n^2) memory — gated by caller."""
    n = len(vectors)
    active = {i: vectors[i].astype(float) for i in range(n)}
    sizes = {i: 1 for i in range(n)}
    merges = []
    next_id = n
    while len(active) > 1:
        ids = sorted(active)
        best = None
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                i, j = ids[ai], ids[bi]
                d = float(np.linalg.norm(active[i] - active[j]))
                if best is None or d < best[0] or (d == best[0] and (i, j) < best[1:]):
                    best = (d, i, j)
        _, i, j = best
        merged = (active[i] * sizes[i] + active[j] * sizes[j]) / (sizes[i] + sizes[j])
        merges.append((i, j))
        active[next_id] = merged
        sizes[next_id] = sizes[i] + sizes[j]
        del active[i], active[j]
        next_id += 1
    return merges


def cluster(
    df: DataFrame,
    backend: ModelBackend,
    *,
    id_col: str,
    embedding_keys: list[str],
    summary_prompt: str | None = None,
    output_key: str = "clusters",
    max_levels: int | None = None,
    max_local_size: int = 10_000,
) -> DataFrame:
    """Annotate each row with its root->leaf path of cluster summaries."""
    emb = embed_column(df, embedding_keys, backend, out_col="_emb")
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
        if node < n:
            return [node]
        a, b = children[node]
        return leaves_of(a) + leaves_of(b)

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
    # walk from root down: root is the last merge node
    def assign(node: int, path: list[str]):
        if node < n:
            paths[node] = path
            return
        p = path + [summaries[node]] if node in summaries else path
        a, b = children[node]
        assign(a, p)
        assign(b, p)

    if children:
        assign(max(children), [])

    spark = df.sparkSession
    path_df = spark.createDataFrame(
        [(ids[i], paths[i]) for i in range(n)],
        schema=T.StructType([
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField(output_key, T.ArrayType(T.StringType()), True),
        ]),
    )
    return df.join(F.broadcast(path_df), id_col, "left")
