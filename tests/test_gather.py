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


def test_hierarchy_headers_breadcrumb():
    """doc_header_key renders the section breadcrumb: levels above the
    current chunk's highest header, deeper levels cleared whenever a
    higher-level header appears (reference gather.py:294-363)."""
    chunks = [
        {"rn": 1, "content": "a", "hdrs": [{"header": "Intro", "level": 1}]},
        {"rn": 2, "content": "b", "hdrs": [{"header": "Setup", "level": 2}]},
        {"rn": 3, "content": "c", "hdrs": []},
        {"rn": 4, "content": "d", "hdrs": [{"header": "Results", "level": 2}]},
        {"rn": 5, "content": "e", "hdrs": [{"header": "Appendix", "level": 1}]},
        {"rn": 6, "content": "f", "hdrs": [{"header": "Tables", "level": 2}]},
    ]
    # chunk 2 (level 2): breadcrumb shows the level-1 section
    assert g.render_hierarchy_headers(chunks[1], chunks[:2], "hdrs") == "_Current Section:_ # Intro"
    # chunk 3 has no headers of its own: nothing rendered
    assert g.render_hierarchy_headers(chunks[2], chunks[:3], "hdrs") == ""
    # chunk 4 (level 2) still under Intro
    assert g.render_hierarchy_headers(chunks[3], chunks[:4], "hdrs") == "_Current Section:_ # Intro"
    # chunk 5 opens a NEW level-1 section: its own level is 1 -> no
    # breadcrumb above it
    assert g.render_hierarchy_headers(chunks[4], chunks[:5], "hdrs") == ""
    # chunk 6 (level 2): the level-1 slot was replaced by Appendix, and the
    # old level-2 header was cleared when Appendix appeared
    assert g.render_hierarchy_headers(chunks[5], chunks[:6], "hdrs") == "_Current Section:_ # Appendix"


def test_gather_with_doc_header_key_end_to_end(spark):
    rows = []
    for i in range(1, 5):
        rows.append({
            "doc": 1, "rn": i, "content": f"chunk {i}",
            "hdrs": [{"header": f"H{i}", "level": 1 if i % 3 == 1 else 2}],
        })
    schema = T.StructType([
        T.StructField("doc", T.LongType()),
        T.StructField("rn", T.LongType()),
        T.StructField("content", T.StringType()),
        T.StructField("hdrs", T.ArrayType(T.StructType([
            T.StructField("header", T.StringType()),
            T.StructField("level", T.LongType()),
        ]))),
    ])
    df = spark.createDataFrame(rows, schema=schema)
    out = g.gather(df, "content", "doc", "rn",
                   peripheral_chunks={"previous": {"tail": {"count": 1}}},
                   doc_header_key="hdrs")
    by_rn = {r["rn"]: r["content_rendered"] for r in out.collect()}
    # rn=2 is level 2 under H1; the breadcrumb sits between the context
    # block and the main chunk markers
    assert "_Current Section:_ # H1" in by_rn[2]
    assert by_rn[2].index("--- End Previous Context ---") < by_rn[2].index("_Current Section:_")
    assert by_rn[2].index("_Current Section:_") < by_rn[2].index("--- Begin Main Chunk ---")
    # rn=4 is level 1 (4 % 3 == 1): no breadcrumb
    assert "_Current Section:_" not in by_rn[4]


def test_null_suffix_chunks_render_zero_skip_marker(spark):
    """Chunks beyond the shown window whose content is NULL: the python
    renderer counts len(None or '') = 0 and emits '[... 0 characters
    skipped ...]'. The O(n) total-minus-prefix rewrite matches it (the
    old unboundedFollowing sum returned NULL over an all-NULL frame and
    wrongly omitted the marker)."""
    rows = [
        {"doc": 0, "rn": 1, "content": "head"},
        {"doc": 0, "rn": 2, "content": "shown"},
        {"doc": 0, "rn": 3, "content": None},
        {"doc": 0, "rn": 4, "content": None},
    ]
    schema = T.StructType([
        T.StructField("doc", T.LongType()),
        T.StructField("rn", T.LongType()),
        T.StructField("content", T.StringType()),
    ])
    df = spark.createDataFrame(rows, schema)
    peripheral = {"previous": {"tail": {"count": 1}}, "next": {"head": {"count": 1}}}
    fast = g.gather(df, "content", "doc", "rn", peripheral_chunks=peripheral)
    got = {r["rn"]: r["content_rendered"] for r in fast.collect()}
    # row 1 shows chunk 2 and skips the two NULL chunks -> 0-char marker
    assert "[... 0 characters skipped ...]" in got[1], got[1]
    # python renderer agrees on that row
    chunks = sorted(rows, key=lambda r: r["rn"])
    py = g.render_chunk(chunks, 0, peripheral, "content", "rn",
                        "--- Begin Main Chunk ---", "--- End Main Chunk ---")
    assert "[... 0 characters skipped ...]" in py
