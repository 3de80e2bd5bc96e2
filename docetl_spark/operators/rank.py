"""Rank operator: whole-dataset ordering by natural-language criteria.

Reference semantics: /root/reference/docetl/operations/rank.py:14-1109 —
initial ordering from an ``embedding`` rating (309), per-item ``likert``
LLM rating (523), or ``calibrated_embedding`` (1013-1109); optional
sliding-window LLM refinement under a ``rerank_call_budget`` (696-910);
output annotated with 1-based ``_rank`` (899-910), ``direction``
asc|desc.

Spark realization: scoring is distributed (embedding cosine as JVM
expressions / likert ratings via an Arrow-batched backend UDF); the
global ordering is a sort on the score; ``_rank`` = row_number. The
window-refinement loop is driver-coordinated over the head rows only
(it is inherently sequential and budget-bounded in the reference too —
rank.py:696-910), gated by ``refine_head_size``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F, types as T

from ..backend import ModelBackend
from ..operators.sample import cosine_sim
from .resolve import embed_column
from .semantic import render_prompt


def _likert_scores(
    df: DataFrame, prompt: str, backend: ModelBackend, *, out_col: str = "_score"
) -> DataFrame:
    """Per-item 1-7 likert rating from the backend (rank.py:523)."""
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField(out_col, T.DoubleType(), True)])
    names = out_schema.fieldNames()

    def run(batches):
        for pdf in batches:
            rows = pdf.to_dict("records")
            scores = []
            for row in rows:
                rendered = render_prompt(prompt, {"input": row})
                ans = backend.complete(rendered, {"rating": "float"}, row)
                scores.append(float(ans.get("rating") or 0.0))
            pdf = pdf.copy()
            pdf[out_col] = scores
            yield pdf[names]

    return df.mapInPandas(run, schema=out_schema)


def _global_row_number(df: DataFrame, order: list, rank_col: str) -> DataFrame:
    """Distributed global 1-based rank. ``W.orderBy(...)`` without a
    partition key moves every row into ONE partition — fine at test
    scale, fatal at 100 TB. Instead: range-repartition on the sort key
    (Spark samples boundaries), sort within partitions, then rank =
    per-partition row_number + the cumulative count of earlier
    partitions (tiny driver-side offset map). Requires a total order
    (callers pass tiebreak columns), so output is deterministic."""
    parts = df.sparkSession.sparkContext.defaultParallelism or 8
    s = (
        df.repartitionByRange(parts, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    counts = {r["_pid"]: r["n"] for r in s.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    omap = F.create_map(*[F.lit(x) for pid in offsets for x in (pid, offsets[pid])])
    w = W.partitionBy("_pid").orderBy(*order)
    return s.withColumn(
        rank_col, (F.row_number().over(w) + F.coalesce(omap[F.col("_pid")], F.lit(0))).cast("long")
    ).drop("_pid")


def _calibrated_embedding_rank(
    df: DataFrame,
    backend: ModelBackend,
    *,
    prompt: str,
    embedding_keys: list[str],
    tiebreak: list[str] | None,
    rank_col: str,
    sample_size: int = 20,
) -> DataFrame:
    """calibrated_embedding ordering (rank.py:1013-1109): all-pairs
    LLM-vote (comparison-QURK) over a small sample -> sorted anchors;
    every row is assigned its most-similar anchor (broadcast anchor
    matrix + numpy per Arrow batch — never a crossJoin) and ordered by
    (anchor index asc, similarity desc)."""
    import numpy as np

    sample = [r.asDict(recursive=True) for r in df.limit(sample_size).collect()]
    if len(sample) <= 1:
        order = [F.col(c).asc() for c in (tiebreak or df.columns)]
        return _global_row_number(df, order, rank_col)

    # comparison-QURK: all-pairs votes, order anchors by wins (rank.py:195-307)
    wins = [0] * len(sample)
    for i in range(len(sample)):
        for j in range(i + 1, len(sample)):
            rendered = render_prompt(prompt, {"input1": sample[i], "input2": sample[j]})
            ans = backend.complete(rendered, {"prefer_second": "bool"}, (sample[i], sample[j]))
            if ans.get("prefer_second"):
                wins[j] += 1
            else:
                wins[i] += 1
    anchor_order = sorted(range(len(sample)), key=lambda k: (-wins[k], k))

    def _content(row: dict) -> str:
        return " ".join(str(row.get(k, "")) for k in embedding_keys)

    anchors = np.array(backend.embed([_content(sample[k]) for k in anchor_order]), dtype=float)
    anchors /= np.maximum(np.linalg.norm(anchors, axis=1, keepdims=True), 1e-12)
    bc = df.sparkSession.sparkContext.broadcast(anchors)

    emb = embed_column(df, embedding_keys, backend, out_col="_emb")
    out_schema = T.StructType(list(emb.schema.fields) + [
        T.StructField("_anchor_idx", T.LongType(), True),
        T.StructField("_anchor_sim", T.DoubleType(), True),
    ])
    names = out_schema.fieldNames()

    def assign(batches):
        A = bc.value
        for pdf in batches:
            if not len(pdf):
                yield pdf.reindex(columns=names)
                continue
            M = np.array(pdf["_emb"].tolist(), dtype=float)
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            sims = M @ A.T
            pdf = pdf.copy()
            pdf["_anchor_idx"] = sims.argmax(axis=1).astype("int64")
            pdf["_anchor_sim"] = sims.max(axis=1)
            yield pdf[names]

    assigned = emb.mapInPandas(assign, schema=out_schema)
    order = [F.col("_anchor_idx").asc(), F.col("_anchor_sim").desc()]
    order += [F.col(c).asc() for c in (tiebreak or [])]
    ranked = _global_row_number(assigned, order, rank_col)
    return ranked.drop("_emb", "_anchor_idx", "_anchor_sim")


def rank(
    df: DataFrame,
    backend: ModelBackend,
    *,
    method: str = "embedding",
    prompt: str | None = None,
    criteria_query: str | None = None,
    embedding_keys: list[str] | None = None,
    direction: str = "desc",
    tiebreak: list[str] | None = None,
    rank_col: str = "_rank",
    refine_head_size: int = 0,
    rerank_call_budget: int = 0,
    calibration_sample: int = 20,
) -> DataFrame:
    """Order the whole dataset; annotate 1-based ``rank_col``.

    method='embedding': score = cosine(item embedding, criteria_query
    embedding). method='likert': per-item LLM rating via ``prompt``.
    method='calibrated_embedding': pairwise-LLM-sort a small sample into
    anchors, then order every row by (nearest anchor, similarity)
    (rank.py:1013-1109).
    """
    if method == "embedding":
        if not criteria_query or not embedding_keys:
            raise ValueError("embedding rank needs criteria_query + embedding_keys")
        scored = embed_column(df, embedding_keys, backend, out_col="_emb")
        qvec = backend.embed([criteria_query])[0]
        score = cosine_sim(F.col("_emb"), F.lit([float(x) for x in qvec]).cast("array<double>"))
        scored = scored.withColumn("_score", score).drop("_emb")
    elif method == "likert":
        if not prompt:
            raise ValueError("likert rank needs a prompt")
        scored = _likert_scores(df, prompt, backend)
    elif method == "calibrated_embedding":
        if not prompt or not embedding_keys:
            raise ValueError("calibrated_embedding rank needs prompt + embedding_keys")
        return _calibrated_embedding_rank(
            df, backend, prompt=prompt, embedding_keys=embedding_keys,
            tiebreak=tiebreak, rank_col=rank_col, sample_size=calibration_sample,
        )
    else:
        raise ValueError(f"unknown rank method {method!r}")

    order = [F.col("_score").desc() if direction == "desc" else F.col("_score").asc()]
    order += [F.col(c).asc() for c in (tiebreak or [])]
    ranked = _global_row_number(scored, order, rank_col).drop("_score")

    if refine_head_size and rerank_call_budget and prompt:
        # driver-coordinated picky-window refinement over the head only
        # (rank.py:696-910): re-order the top rows with pairwise prompts.
        head = [r.asDict() for r in ranked.filter(F.col(rank_col) <= refine_head_size).collect()]
        budget = rerank_call_budget
        changed = True
        while changed and budget > 0:
            changed = False
            for i in range(len(head) - 1):
                if budget <= 0:
                    break
                a, b = head[i], head[i + 1]
                rendered = render_prompt(prompt, {"input1": a, "input2": b})
                ans = backend.complete(rendered, {"prefer_second": "bool"}, (a, b))
                budget -= 1
                if ans.get("prefer_second"):
                    head[i], head[i + 1] = b, a
                    changed = True
        spark = df.sparkSession
        id_like = [c for c in df.columns]
        new_ranks = spark.createDataFrame(
            [{**{k: r[k] for k in id_like}, rank_col: i + 1} for i, r in enumerate(head)],
            schema=ranked.schema,
        )
        tail = ranked.filter(F.col(rank_col) > refine_head_size)
        ranked = new_ranks.unionByName(tail)
    return ranked
