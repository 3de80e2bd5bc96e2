"""The shipped example pipelines must actually run."""


def test_pretrain_corpus_example_runs(spark):
    from docetl_spark.plans.yaml_front import run_yaml

    out = run_yaml(spark, "examples/pretrain_corpus.yaml")
    rows = out.collect()
    assert rows, "pipeline produced no packed sequences"
    assert set(out.df.columns) == {
        "doc_id", "shard", "seq_id", "doc_tok_start", "doc_tok_end", "seq_off"
    }
    # step output registered as a queryable view
    assert spark.sql("SELECT * FROM curated").count() == len(rows)
    # decontamination: no surviving doc is a benchmark member
    surviving = {r["doc_id"] for r in rows}
    assert not any(d % 17 == 0 for d in surviving)
