from docetl_spark import SemanticFrame
from docetl_spark.operators import code_ops


def test_code_map_merges_and_drops(docs):
    out = code_ops.code_map(
        docs,
        lambda row: {"n_words": len(row["text"].split())},
        {"n_words": "int"},
        drop_keys=["to_be_dropped"],
    )
    rows = {r["id"]: r.asDict() for r in out.collect()}
    assert len(rows) == 5  # 1:1 cardinality
    assert rows[0]["n_words"] == 8
    assert "to_be_dropped" not in rows[0]
    assert rows[0]["category"] == "review"  # passthrough


def test_code_filter_callable_and_expr(docs):
    out = code_ops.code_filter(docs, lambda row: "good" in row["text"])
    assert [r["id"] for r in out.collect()] == [0]
    out2 = code_ops.code_filter(docs, "category = 'review'")
    assert sorted(r["id"] for r in out2.collect()) == [0, 3]
    out3 = code_ops.code_filter(docs, "id >= 0", limit=2)
    assert out3.count() == 2


def test_code_reduce_groups(docs):
    out = code_ops.code_reduce(
        docs,
        "category",
        lambda items: {"total_words": sum(len(i["text"].split()) for i in items)},
        {"total_words": "int"},
        name="wc",
    )
    rows = {r["category"]: r.asDict() for r in out.collect()}
    assert set(rows) == {"review", "ticket", "news"}
    assert rows["news"]["_counts_prereduce_wc"] == 1
    assert rows["review"]["_counts_prereduce_wc"] == 2
    assert rows["review"]["total_words"] == 8 + 4


def test_code_reduce_global_and_passthrough(docs):
    out = code_ops.code_reduce(
        docs, "_all", lambda items: {"n": len(items)}, {"n": "int"}, pass_through=True
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["n"] == 5
    assert "text" in rows[0].asDict()  # pass_through copies first-row fields


def test_frame_chaining(spark, docs):
    sf = (
        SemanticFrame.from_df(docs)
        .code_map(lambda r: {"n_words": len(r["text"].split())}, {"n_words": "int"})
        .code_filter(lambda r: r["n_words"] >= 5)
        .code_reduce("category", lambda items: {"cnt": len(items)}, {"cnt": "int"})
    )
    rows = {r["category"]: r["cnt"] for r in sf.df.collect()}
    assert rows["review"] == 1  # only id=0 survives in review
    assert sf.plan() == ["scan", "code_map", "code_filter", "code_reduce"]


def test_code_filter_source_with_leading_import(spark):
    from docetl_spark import FakeBackend, SemanticFrame

    df = spark.createDataFrame([{"x": 1}, {"x": 2}, {"x": 3}])
    src = "import math\n\ndef transform(doc):\n    return math.floor(doc['x']) >= 2\n"
    out = SemanticFrame.from_df(df, backend=FakeBackend()).code_filter(src).collect()
    assert sorted(r["x"] for r in out) == [2, 3]
