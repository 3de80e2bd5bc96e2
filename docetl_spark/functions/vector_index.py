"""Persistent vector-index artifacts: IVF and PQ indexes as parquet +
manifest, reloadable across sessions, with delta-only maintenance.

Reference parity: the reference's LanceDB retriever persists its vector
index on disk and reuses it across runs (/root/reference/docetl/
retrievers/lancedb.py — ``ensure_index`` opens the existing dataset and
only [re]builds when asked); the repo's in-memory ivf_index/pq_index
(functions/similarity.py:381,588) re-embedded and re-indexed every
session. At 100 TB, re-embedding the corpus per pipeline run IS the
cost driver — the artifact makes the embed+fit pass a one-time cost and
appends deltas against the FROZEN centroids/codebooks (the
incremental_dedup pattern from functions/passages.py: new data joins an
on-disk state table, old data is never recomputed).

Artifact layout (plain parquet — readable by any engine, no sidecar
library):

    <path>/manifest.json            kind/version/params/schema contract
    <path>/centroids.parquet        IVF: (list_id, centroid array<double>)
    <path>/codebooks.parquet        PQ:  (subspace, code, centroid array<double>)
    <path>/assignments/             (id, embedding, _ivf_list | _pq_code)
                                    — parquet dir, delta appends land here

Assignments are PARTITIONED BY the list id for IVF, so an n_probe query
prunes partitions at the scan (the point of IVF at scale: the probe
filter never touches the other lists' files).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .similarity import ivf_topk as _ivf_topk, pq_encode, pq_topk as _pq_topk

_VERSION = 1


def _write_manifest(path: str, meta: dict) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)


def _read_manifest(path: str) -> dict:
    with open(os.path.join(path, "manifest.json")) as f:
        return json.load(f)


def save_ivf_index(
    indexed: DataFrame,
    centroids: "np.ndarray",
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Persist an ``ivf_index`` result: centroids to a tiny parquet,
    assignments (id + vector + list id) partitioned by ``_ivf_list``.
    Returns the manifest dict. Overwrites an existing artifact at
    ``path`` (rebuild semantics; use :func:`ivf_append` for deltas)."""
    spark = indexed.sparkSession
    cents = np.asarray(centroids, dtype=np.float64)
    meta = {
        "kind": "ivf", "version": _VERSION, "id_col": id_col,
        "vec_col": vec_col, "n_lists": int(cents.shape[0]),
        "dim": int(cents.shape[1]),
    }
    # Arrow-table construction (the streaming drained_df idiom): the
    # list-of-tuples createDataFrame takes the pickled-RDD path, whose
    # WRITE job pays a Python-worker round trip — measured 6-8 s for
    # these 8 rows on local[32]; the pyarrow.Table form becomes a JVM
    # LocalRelation and writes in ~0.2 s (r11 optimization, guide §4).
    import pyarrow as pa

    table = pa.Table.from_arrays(
        [
            pa.array(range(len(cents)), type=pa.int64()),
            pa.array([[float(x) for x in c] for c in cents],
                     type=pa.list_(pa.float64())),
        ],
        names=["list_id", "centroid"],
    )
    cdf = spark.createDataFrame(table, schema="list_id long, centroid array<double>")
    cdf.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "centroids.parquet"))
    (
        indexed.select(id_col, vec_col, "_ivf_list")
        # repartition ON the partition column first: without it every
        # input partition writes a file into every list directory
        # (n_partitions x n_lists small files — the classic partitioned-
        # write explosion); with it, one file per list
        .repartition("_ivf_list")
        .write.mode("overwrite").partitionBy("_ivf_list")
        .parquet(os.path.join(path, "assignments"))
    )
    _write_manifest(path, meta)
    return meta


def load_ivf_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, "np.ndarray", dict]:
    """Reload (assignments df, centroids array, manifest). The df has
    the same shape ``ivf_index`` returns — feed it straight to
    ``ivf_topk`` with the centroids. ZERO embed/fit work: the scan is
    the only cost, and an ``n_probe`` query's list filter prunes the
    assignment partitions."""
    meta = _read_manifest(path)
    if meta.get("kind") != "ivf":
        raise ValueError(f"{path}: not an IVF index artifact ({meta.get('kind')!r})")
    rows = (
        spark.read.parquet(os.path.join(path, "centroids.parquet"))
        .orderBy("list_id").collect()
    )
    cents = np.array([r["centroid"] for r in rows], dtype=np.float64)
    df = spark.read.parquet(os.path.join(path, "assignments"))
    return df, cents, meta


def ivf_append(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    *,
    vec_col: str | None = None,
) -> dict:
    """Delta-only maintenance: assign NEW vectors to the artifact's
    FROZEN centroids (one broadcast numpy pass — no refit, nothing
    existing is read or rewritten) and append them to the partitioned
    assignments dir. The incremental_dedup posture: growth costs
    O(delta), never O(corpus). Returns the manifest."""
    meta = _read_manifest(path)
    if meta.get("kind") != "ivf":
        raise ValueError(f"{path}: not an IVF index artifact ({meta.get('kind')!r})")
    vc = vec_col or meta["vec_col"]
    rows = (
        spark.read.parquet(os.path.join(path, "centroids.parquet"))
        .orderBy("list_id").collect()
    )
    cents = np.array([r["centroid"] for r in rows], dtype=np.float64)
    b = spark.sparkContext.broadcast(cents)

    @F.pandas_udf(T.LongType())
    def nearest_list(s: pd.Series) -> pd.Series:
        from .similarity import _nearest_centroid

        c = b.value
        m = np.array(s.tolist(), dtype=np.float64)
        # BLAS-form argmin (see similarity._nearest_centroid) — the
        # persisted index's oracle probes all lists (exact brute-force),
        # so list assignment is not result-pinned
        return pd.Series(_nearest_centroid(m, c).astype(np.int64))

    assigned = delta.select(
        F.col(meta["id_col"]),
        F.col(vc).cast("array<double>").alias(meta["vec_col"]),
    ).withColumn("_ivf_list", nearest_list(F.col(meta["vec_col"])))
    (
        assigned.repartition("_ivf_list")
        .write.mode("append").partitionBy("_ivf_list")
        .parquet(os.path.join(path, "assignments"))
    )
    return meta


def ivf_query(
    spark: SparkSession,
    path: str,
    query_vector: list[float],
    k: int,
    *,
    n_probe: int = 4,
    round_score: int | None = 6,
) -> DataFrame:
    """Top-k over a persisted IVF artifact: load (no embed, no fit),
    probe ``n_probe`` lists — a partition-pruned scan — exact cosine
    within the candidates (similarity.ivf_topk)."""
    df, cents, meta = load_ivf_index(spark, path)
    return _ivf_topk(
        df, cents, query_vector, k,
        id_col=meta["id_col"], vec_col=meta["vec_col"],
        n_probe=n_probe, round_score=round_score,
    )


def save_pq_index(
    indexed: DataFrame,
    codebooks: "np.ndarray",
    path: str,
    *,
    id_col: str = "vec_id",
    code_col: str = "_pq_code",
) -> dict:
    """Persist a ``pq_index`` result: codebooks to parquet (one row per
    (subspace, code)), the m-byte codes WITHOUT the raw vectors — the
    artifact is the compressed corpus (the pq_index 100-TB story: scans
    never read the original embeddings)."""
    spark = indexed.sparkSession
    books = np.asarray(codebooks, dtype=np.float64)
    m, kk, dsub = books.shape
    meta = {
        "kind": "pq", "version": _VERSION, "id_col": id_col,
        "code_col": code_col, "m": int(m), "k": int(kk), "dsub": int(dsub),
    }
    rows = [
        (int(j), int(c), [float(x) for x in books[j, c]])
        for j in range(m) for c in range(kk)
    ]
    spark.createDataFrame(
        rows, "subspace long, code long, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "codebooks.parquet"))
    indexed.select(id_col, code_col).write.mode("overwrite").parquet(
        os.path.join(path, "assignments"))
    _write_manifest(path, meta)
    return meta


def load_pq_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, "np.ndarray", dict]:
    meta = _read_manifest(path)
    if meta.get("kind") != "pq":
        raise ValueError(f"{path}: not a PQ index artifact ({meta.get('kind')!r})")
    rows = (
        spark.read.parquet(os.path.join(path, "codebooks.parquet"))
        .orderBy("subspace", "code").collect()
    )
    books = np.array(
        [r["centroid"] for r in rows], dtype=np.float64
    ).reshape(meta["m"], meta["k"], meta["dsub"])
    df = spark.read.parquet(os.path.join(path, "assignments"))
    return df, books, meta


def pq_append(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    *,
    vec_col: str = "embedding",
) -> dict:
    """Delta-only PQ maintenance: encode NEW vectors against the FROZEN
    codebooks (similarity.pq_encode — the identical kernel the fit
    path uses) and append their codes."""
    df_books = load_pq_index(spark, path)
    _, books, meta = df_books
    coded = pq_encode(delta, books, vec_col)
    coded.select(meta["id_col"], meta["code_col"]).write.mode("append").parquet(
        os.path.join(path, "assignments"))
    return meta


def pq_query(
    spark: SparkSession,
    path: str,
    query_vector: list[float],
    k: int,
    *,
    round_score: int | None = 6,
) -> DataFrame:
    """ADC top-k over a persisted PQ artifact — reads only the m-byte
    codes (similarity.pq_topk)."""
    df, books, meta = load_pq_index(spark, path)
    return _pq_topk(
        df, books, query_vector, k,
        id_col=meta["id_col"], code_col=meta["code_col"],
        round_score=round_score,
    )
