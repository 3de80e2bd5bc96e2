"""Persistent IVF/PQ index artifacts (functions/vector_index.py) —
reference parity: retrievers/lancedb.py persists and reuses its index
across runs; the artifact must reload with zero embed/fit work and
support delta-only appends (the incremental_dedup posture)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from docetl_spark.functions import similarity, vector_index as vx


@pytest.fixture()
def vecs(spark):
    rows = [
        (i, [float((i * 7 + j * 3) % 11) for j in range(8)]) for i in range(40)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_save_load_query_roundtrip(spark, vecs, tmp_path):
    indexed, cents = similarity.ivf_index(vecs, n_lists=4)
    path = str(tmp_path / "ivf")
    meta = vx.save_ivf_index(indexed, cents, path)
    assert meta["kind"] == "ivf" and meta["n_lists"] == 4 and meta["dim"] == 8

    qv = [float(x) for x in vecs.filter(F.col("vec_id") == 3).first()["embedding"]]
    want = [tuple(r) for r in similarity.ivf_topk(
        indexed, cents, qv, 5, n_probe=4).collect()]
    got = [tuple(r) for r in vx.ivf_query(spark, path, qv, 5, n_probe=4).collect()]
    assert got == want
    # assignments are partitioned by list id -> probe filters prune files
    parts = [d for d in os.listdir(os.path.join(path, "assignments"))
             if d.startswith("_ivf_list=")]
    assert len(parts) >= 2


def test_ivf_reload_zero_embed_calls(spark, tmp_path):
    """The artifact's point: a reloaded index serves queries with ZERO
    embed calls (BackendMetrics accounting), while the build paid n+1."""
    from docetl_spark import FakeBackend
    from docetl_spark.operators.resolve import embed_column
    from docetl_spark.resilience import BackendMetrics, ResilientBackend

    docs = spark.createDataFrame(
        [(i, f"document number {i} about topic {i % 5}") for i in range(30)],
        "doc_id long, text string")
    metrics = BackendMetrics(spark.sparkContext)
    be = ResilientBackend(FakeBackend(), metrics=metrics, cache_size=0)
    emb = embed_column(docs, ["text"], be, out_col="embedding").select(
        "doc_id", "embedding")
    indexed, cents = similarity.ivf_index(emb, vec_col="embedding", n_lists=3)
    path = str(tmp_path / "ivf_docs")
    vx.save_ivf_index(indexed, cents, path, id_col="doc_id")
    built_calls = metrics.snapshot()["calls"]
    assert built_calls > 0  # the build really embedded

    qv = [0.1] * len(cents[0])
    out = vx.ivf_query(spark, path, qv, 3, n_probe=3).collect()
    assert len(out) == 3
    assert metrics.snapshot()["calls"] == built_calls  # zero new embeds


def test_ivf_append_delta_only(spark, vecs, tmp_path):
    indexed, cents = similarity.ivf_index(vecs, n_lists=4)
    path = str(tmp_path / "ivf_delta")
    vx.save_ivf_index(indexed, cents, path)
    n0 = spark.read.parquet(os.path.join(path, "assignments")).count()

    delta = spark.createDataFrame(
        [(100 + i, [float(i + j) for j in range(8)]) for i in range(5)],
        "vec_id long, embedding array<double>")
    vx.ivf_append(spark, path, delta)
    df, cents2, meta = vx.load_ivf_index(spark, path)
    assert df.count() == n0 + 5
    assert np.allclose(cents2, cents)  # centroids FROZEN
    # appended rows are assigned to their true nearest frozen centroid
    row = df.filter(F.col("vec_id") == 100).first()
    d = ((cents - np.array(row["embedding"])[None, :]) ** 2).sum(axis=1)
    assert row["_ivf_list"] == int(d.argmin())
    # a query can now retrieve an appended vector
    qv = [float(j) for j in range(8)]  # == delta row 100
    got = vx.ivf_query(spark, path, qv, 1, n_probe=4).collect()
    assert got[0]["vec_id"] == 100


def test_pq_save_load_query_and_append(spark, vecs, tmp_path):
    indexed, books = similarity.pq_index(vecs, m=4, nbits=4)
    path = str(tmp_path / "pq")
    meta = vx.save_pq_index(indexed, books, path)
    assert (meta["m"], meta["k"], meta["dsub"]) == (4, 16, 2)

    qv = [float(x) for x in vecs.filter(F.col("vec_id") == 7).first()["embedding"]]
    want = [tuple(r) for r in similarity.pq_topk(indexed, books, qv, 5).collect()]
    got = [tuple(r) for r in vx.pq_query(spark, path, qv, 5).collect()]
    assert got == want
    # the artifact stores only (id, code) — no raw vectors on disk
    df, books2, _ = vx.load_pq_index(spark, path)
    assert set(df.columns) == {"vec_id", "_pq_code"}
    assert np.allclose(books2, books)

    delta = spark.createDataFrame(
        [(200, [100.0] * 8)], "vec_id long, embedding array<double>")
    vx.pq_append(spark, path, delta)
    assert vx.load_pq_index(spark, path)[0].count() == 41


def test_kind_mismatch_raises(spark, vecs, tmp_path):
    indexed, cents = similarity.ivf_index(vecs, n_lists=2)
    path = str(tmp_path / "ivf_kind")
    vx.save_ivf_index(indexed, cents, path)
    with pytest.raises(ValueError, match="not a PQ index"):
        vx.load_pq_index(spark, path)
