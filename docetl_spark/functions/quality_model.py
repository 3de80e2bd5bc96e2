"""Model-based quality classification — the fastText-style classifier
step of a pretraining-data pipeline (CCNet / LLaMA-style "looks like a
reference page" filtering), re-expressed Spark-first.

Design:
- features are md5-hashed unigram counts (log1p-damped), the same
  deterministic bucket scheme as DSIR/lm_score — so SCORING is pure JVM
  expressions (explode -> broadcast-join the weight table -> sum ->
  sigmoid) and a SQL oracle replays it exactly;
- FITTING is batch gradient descent where each iteration is one
  DataFrame join + aggregation: the executors compute per-bucket
  gradient contributions, the driver holds only the weight vector
  (``buckets`` floats — KBs). No MLlib dependency, no per-row Python.

Scale posture: real pipelines fit the classifier on a labeled SAMPLE
(10^5-10^6 docs) and score the full corpus; ``fit_quality_classifier``
caches the featurized sample so the per-iteration cost is one shuffle
of (doc, bucket) counts, and ``score_quality`` runs one corpus pass
with a broadcast weight table. Nothing here materializes corpus-sized
data on the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .training import _hash_bucket, _lower_tokens


def _weight_table(spark, weights: dict[int, float]) -> DataFrame:
    """Tiny (bucket, w) literal frame as a pyarrow.Table — a JVM
    LocalRelation. r11 optimization (the ann_ivf_persisted finding):
    the list-of-tuples createDataFrame takes the pickled-RDD path and
    pays a Python-worker round trip on EVERY action that reads it
    (~1.5 s per action on local[32]); fit_quality_classifier reads one
    per GD iteration."""
    import pyarrow as pa

    items = sorted(weights.items()) or [(0, 0.0)]
    return spark.createDataFrame(
        pa.Table.from_arrays(
            [pa.array([int(k) for k, _ in items], type=pa.int64()),
             pa.array([float(v) for _, v in items], type=pa.float64())],
            names=["bucket", "w"]),
        schema="bucket long, w double")


def hashed_features(
    df: DataFrame, *, text_col: str, id_col: str, buckets: int, salt: str = "qm"
) -> DataFrame:
    """(id, bucket, x) rows: x = ln(1 + count of tokens in the bucket).
    Log damping keeps long docs from dominating the margin, matching
    the usual tf scaling for linear text classifiers."""
    return (
        df.select(F.col(id_col), F.explode(_lower_tokens(F.col(text_col))).alias("_tok"))
        .groupBy(id_col, _hash_bucket(F.col("_tok"), buckets, salt).alias("bucket"))
        .agg(F.log(F.lit(1.0) + F.count("*")).alias("x"))
    )


def score_quality(
    df: DataFrame,
    weights: dict[int, float],
    *,
    text_col: str,
    id_col: str,
    bias: float = 0.0,
    buckets: int = 1 << 15,
    salt: str = "qm",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Sigmoid(w . x + b) per doc. ``weights`` is the bucket->weight
    map from ``fit_quality_classifier`` (or any injected vector);
    broadcast as a tiny table, docs with no tokens score sigmoid(b)."""
    spark = df.sparkSession
    wtab = _weight_table(spark, weights)
    feats = hashed_features(df, text_col=text_col, id_col=id_col, buckets=buckets, salt=salt)
    margins = (
        feats.join(F.broadcast(wtab), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("x") * F.col("w")).alias("_m"))
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.coalesce(F.col("_m"), F.lit(0.0)) + F.lit(bias))))
    return df.select(id_col).join(margins, id_col, "left").select(
        id_col, prob.alias(out_col)
    )


def fit_quality_classifier(
    df: DataFrame,
    *,
    label_col: str,
    text_col: str,
    id_col: str,
    buckets: int = 1 << 15,
    iters: int = 30,
    lr: float = 0.5,
    l2: float = 1e-4,
    salt: str = "qm",
) -> tuple[dict[int, float], float]:
    """Batch-GD logistic regression on hashed unigram features.
    Returns (weights dict, bias).

    Each iteration: per-doc margin (join current weights, broadcast) ->
    residual (sigmoid(m) - y) -> per-bucket gradient (join + agg at
    bucket cardinality) -> driver update of the KB-sized vector. The
    featurized input and the label table are cached once; fit on a
    labeled sample, not the whole corpus (see module docstring).
    """
    spark = df.sparkSession
    feats = hashed_features(df, text_col=text_col, id_col=id_col, buckets=buckets, salt=salt).cache()
    labels = df.select(F.col(id_col), F.col(label_col).cast("double").alias("_y")).cache()
    n = labels.count()  # materializes both caches' shared scan
    if n == 0:
        raise ValueError("fit_quality_classifier: empty input")
    w: dict[int, float] = {}
    bias = 0.0
    for _ in range(iters):
        wtab = _weight_table(spark, w)
        margins = (
            feats.join(F.broadcast(wtab), "bucket", "left")
            .groupBy(id_col)
            .agg(F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0.0))).alias("_m"))
        )
        resid = (
            labels.join(margins, id_col, "left")
            .select(
                F.col(id_col),
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.coalesce(F.col("_m"), F.lit(0.0)) + F.lit(bias))))
                    - F.col("_y")
                ).alias("_r"),
            )
        )
        grad_rows = (
            feats.join(resid, id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("x") * F.col("_r")).alias("g"))
            .collect()
        )
        bias_grad = resid.agg(F.sum("_r")).collect()[0][0] or 0.0
        for row in grad_rows:
            b = int(row["bucket"])
            g = row["g"] / n + l2 * w.get(b, 0.0)
            w[b] = w.get(b, 0.0) - lr * g
        bias -= lr * (bias_grad / n)
    feats.unpersist()
    labels.unpersist()
    return w, bias


def quality_auc(scored: DataFrame, *, label_col: str, score_col: str) -> float:
    """AUC via the rank-sum (Mann-Whitney) identity — delegates to
    stats.auc_rank, the distributed midrank formulation (global
    cumulative counts through the range-partitioned prefix sum). The
    pre-r10 inline version ranked through a bare partitionless window —
    dragging the whole eval set into ONE task — and broke score ties by
    label order, overstating AUC on tied scores; midranks are the
    correct Mann-Whitney treatment. Diagnostic for the fitted
    classifier; NaN when either class is absent or the input is empty,
    resolution 1 bp (auc_bp / 10000)."""
    from .stats import auc_rank

    rows = auc_rank(scored, score_col, label_col).collect()
    if not rows or rows[0]["auc_bp"] is None:
        return float("nan")
    return rows[0]["auc_bp"] / 10000.0


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
