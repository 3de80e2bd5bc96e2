"""Gather parity: the JVM window fast path must render byte-identically
to the general python renderer for every eligible config."""

import pandas as pd
import pytest
from pyspark.sql import types as T

from docetl_spark.operators import gather as g


@pytest.fixture()
def chunk_df(spark):
    rows = []
    for doc in range(4):
        for i in range(1, doc + 2):  # docs of 1..5 chunks
            rows.append({"doc": doc, "rn": i, "content": f"d{doc} chunk {i} body" * (i + 1)})
    return spark.createDataFrame(rows)


def _python_path(df, p, n):
    """Force the general applyInPandas renderer regardless of config shape."""
    peripheral = {"previous": {"tail": {"count": p}}, "next": {"head": {"count": n}}}
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField("content_rendered", T.StringType(), True)])
    names = out_schema.fieldNames()

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn", kind="mergesort").reset_index(drop=True)
        chunks = pdf.to_dict("records")
        pdf["content_rendered"] = [
            g.render_chunk(chunks, i, peripheral, "content", "rn",
                           "--- Begin Main Chunk ---", "--- End Main Chunk ---")
            for i in range(len(chunks))
        ]
        return pdf[names]

    return df.groupBy("doc").applyInPandas(per_doc, schema=out_schema)


@pytest.mark.parametrize("p,n", [(1, 1), (2, 1), (0, 2), (2, 0), (3, 3)])
def test_window_fast_path_matches_python(chunk_df, p, n):
    peripheral = {"previous": {"tail": {"count": p}}, "next": {"head": {"count": n}}}
    fast = g.gather(chunk_df, "content", "doc", "rn", peripheral_chunks=peripheral)
    slow = _python_path(chunk_df, p, n)
    f = {(r["doc"], r["rn"]): r["content_rendered"] for r in fast.collect()}
    s = {(r["doc"], r["rn"]): r["content_rendered"] for r in slow.collect()}
    assert f == s


def test_fast_path_detection():
    assert g._window_fast_path_counts({"previous": {"tail": {"count": 1}}, "next": {"head": {"count": 1}}}) == (1, 1)
    assert g._window_fast_path_counts({"previous": {"middle": {}}}) is None
    assert g._window_fast_path_counts({"previous": {"tail": {"count": 1, "content_key": "summary"}}}) is None
    assert g._window_fast_path_counts({}) is None


def test_empty_peripheral_renders_content(chunk_df):
    out = g.gather(chunk_df, "content", "doc", "rn").collect()
    assert all(r["content_rendered"] == r["content"] for r in out)
