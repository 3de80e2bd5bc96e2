"""Custom-eval surface (reference utils_evaluation.py): register_eval
loading, frontier marking, candidate evaluation over Spark results."""

import pytest
from pyspark.sql import functions as F

from docetl_spark import (
    evaluate_candidates,
    identify_pareto_frontier,
    load_custom_evaluate_func,
    register_eval,
)


def test_register_and_load_single_eval(tmp_path):
    f = tmp_path / "my_eval.py"
    f.write_text(
        "from docetl_spark import register_eval\n"
        "@register_eval\n"
        "def ev(dataset_df, results_df):\n"
        "    return {'coverage': results_df.count() / max(dataset_df.count(), 1)}\n"
    )
    fn = load_custom_evaluate_func(str(f))
    assert getattr(fn, "_docetl_eval", False)


def test_load_rejects_zero_and_multiple(tmp_path):
    none_f = tmp_path / "none.py"
    none_f.write_text("def plain(a, b):\n    return {}\n")
    with pytest.raises(ValueError, match="found none"):
        load_custom_evaluate_func(str(none_f))

    two_f = tmp_path / "two.py"
    two_f.write_text(
        "from docetl_spark import register_eval\n"
        "@register_eval\n"
        "def a(d, r):\n    return {}\n"
        "@register_eval\n"
        "def b(d, r):\n    return {}\n"
    )
    with pytest.raises(ValueError, match="multiple"):
        load_custom_evaluate_func(str(two_f))
    with pytest.raises(ValueError, match="not found"):
        load_custom_evaluate_func(str(tmp_path / "missing.py"))


def test_pareto_frontier_matches_reference_rule():
    results = [
        {"node_id": "a", "cost": 1.0, "acc": 0.9},   # frontier
        {"node_id": "b", "cost": 2.0, "acc": 0.95},  # frontier
        {"node_id": "c", "cost": 2.0, "acc": 0.90},  # dominated by b (equal cost, lower acc)
        {"node_id": "d", "cost": 3.0, "acc": 0.80},  # dominated by a
        {"node_id": "e", "cost": 0.5},               # missing metric -> off frontier, kept
    ]
    out = identify_pareto_frontier(results, "acc")
    flags = {r["node_id"]: r["on_frontier"] for r in out}
    assert flags == {"a": True, "b": True, "c": False, "d": False, "e": False}


def test_evaluate_candidates_over_spark_results(spark):
    dataset = spark.range(100).withColumnRenamed("id", "doc_id")

    class Cand:
        def __init__(self, cost, keep):
            self.cost, self.keep, self.applied = cost, keep, ()

    cands = [Cand(1.0, 80), Cand(5.0, 90), Cand(9.0, 50)]

    @register_eval
    def ev(dataset_df, results_df):
        return {"coverage": results_df.count() / dataset_df.count()}

    out = evaluate_candidates(
        cands, lambda c: dataset.limit(c.keep), ev, dataset, metric_key="coverage"
    )
    assert [r["on_frontier"] for r in out] == [True, True, False]
    assert out[0]["coverage"] == 0.8
