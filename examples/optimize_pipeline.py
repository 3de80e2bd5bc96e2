"""End-to-end MOAR optimize() loop (reference frame.py:1121-1172 +
moar/MOARSearch.py): build a semantic chain, probe whether its last map
is worth decomposing (should_optimize), dry-run the cost estimate,
run the directive search, and EXECUTE the winning plan.

Run directly (uses FakeBackend, no network):

    PYTHONPATH=/root/repo python examples/optimize_pipeline.py

or import ``main`` from a test with an injected SparkSession/backend.
"""

from __future__ import annotations


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001", backend=None,
         max_iterations: int = 6) -> dict:
    from docetl_spark import FakeBackend, SemanticFrame, get_spark
    from docetl_spark.plans import PlanStats

    own_spark = spark is None
    spark = spark or get_spark("optimize-example")
    backend = backend or FakeBackend()

    # A deliberately decomposable chain: one wide map doing two jobs
    # (classify AND summarize) followed by a filter — the shape the
    # chaining/isolating directives split.
    sf = (
        SemanticFrame.read_parquet(spark, f"{sf_dir}/documents.parquet", backend=backend)
        .map(
            "Classify the sentiment of {{ input.text }} and summarize its topic.",
            {"sentiment": "str", "summary": "str"},
        )
        .filter("Is {{ input.sentiment }} positive?", {"keep": "bool"})
    )

    # 1) one-call probe: is the last map-shaped op worth the search?
    verdict = sf.should_optimize()

    # 2) dry-run cost estimate (no model stage executes)
    stats = PlanStats(rows=500, avg_doc_tokens=80)
    cost_before = sf.estimate_cost(stats=stats)

    # 3) directive search (beam + MCTS Pareto) + replay of the winner
    optimized = sf.optimize(stats=stats, max_iterations=max_iterations,
                            agent_backend=backend)
    result = optimized.search_results

    # 4) the winning plan EXECUTES end-to-end
    rows = optimized.df.count()
    out = {
        "verdict": verdict,
        "cost_before": cost_before,
        "cost_best": result.best("cost").cost,
        "explored": result.explored,
        "winning_ops": [op for op, *_ in optimized.op_log],
        "rows": rows,
        "columns": optimized.df.columns,
    }
    if own_spark:
        print(out)
    return out


if __name__ == "__main__":
    main()
