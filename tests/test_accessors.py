"""df.semantic.* accessor tests (reference pd_accessors parity)."""

from docetl_spark import FakeBackend
from docetl_spark.accessors import install
from docetl_spark.frame import SemanticFrame


def test_accessor_map_filter_agg(spark, docs):
    install(backend=FakeBackend(rules={
        "n_words": lambda row: len(row["text"].split()),
        "keep": lambda row: row["category"] == "review",
        "total": lambda items: len(items),
    }))
    mapped = docs.semantic.map("count {{ input.text }}", {"n_words": "int"})
    assert mapped.filter("n_words = 8").count() == 1

    kept = docs.semantic.filter("review? {{ input.text }}", {"keep": "bool"})
    assert kept.count() == 2

    agged = docs.semantic.agg("category", "n {{ inputs | length }}", {"total": "int"})
    assert {r["category"]: r["total"] for r in agged.collect()}["review"] == 2


def test_accessor_topk_llm_compare(spark, docs):
    be = FakeBackend(rules={"rating": lambda row: float(row["id"])})
    out = (
        SemanticFrame.from_df(docs, backend=be)
        .topk("llm_compare", 2, rank_method="likert", prompt="rate {{ input.text }}",
              direction="desc", tiebreak=["id"])
        .collect()
    )
    assert sorted(r["id"] for r in out) == [3, 4]
