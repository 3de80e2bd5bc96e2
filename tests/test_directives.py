"""Directive optimizer (plans/directives.py): cost model, Pareto search,
directive instantiation, and the run_pipeline `optimize` hook
(reference: moar/MOARSearch.py, moar/ParetoFrontier.py, SURVEY §4.3)."""

import pytest

from docetl_spark import FakeBackend, run_pipeline
from docetl_spark.plans import PlanStats, estimate_cost, lift, optimize_ops
from docetl_spark.plans.directives import Candidate, pareto_insert


def _ops(avg_tokens_irrelevant=True):
    return lift([
        {"type": "map", "name": "m", "prompt": "summarize {{ input.text }}",
         "output": {"schema": {"summary": "str"}}},
        {"type": "filter", "name": "f", "prompt": "keep? {{ input.summary }}",
         "output": {"schema": {"keep": "bool"}}},
        {"type": "reduce", "name": "r", "reduce_key": "lang",
         "prompt": "agg {{ inputs }}", "output": {"schema": {"n": "int"}}},
    ])


def test_cascade_lowers_cost_sampling_lowers_quality():
    stats = PlanStats(rows=1000, avg_doc_tokens=500)
    res = optimize_ops(_ops(), stats)
    base = next(c for c in res.frontier if not c.applied)
    cascaded = next(c for c in res.frontier if c.applied == (("cascade_filtering", 1),))
    assert cascaded.cost < base.cost  # proxy calls are cheaper
    assert cascaded.quality < base.quality  # ...at a small accuracy cost


def test_doc_chunking_gates_on_length():
    short = optimize_ops(_ops(), PlanStats(rows=100, avg_doc_tokens=300))
    assert not any("doc_chunking" in dict(c.applied) for c in short.frontier)
    long = optimize_ops(_ops(), PlanStats(rows=100, avg_doc_tokens=5000))
    chunked = [c for c in long.frontier if "doc_chunking" in dict(c.applied)]
    assert chunked
    types = [o.type for o in chunked[0].ops]
    i = types.index("split")
    assert types[i : i + 4] == ["split", "gather", "map", "reduce"]


def test_frontier_is_pareto():
    res = optimize_ops(_ops(), PlanStats(rows=1000, avg_doc_tokens=2500))
    f = res.frontier
    for a in f:
        for b in f:
            if a is not b:
                assert not (a.cost <= b.cost and a.quality >= b.quality
                            and (a.cost < b.cost or a.quality > b.quality))


def test_pareto_insert_drops_dominated():
    frontier = [Candidate([], 10.0, 0.5)]
    assert pareto_insert(frontier, Candidate([], 5.0, 0.6))  # dominates
    assert len(frontier) == 1 and frontier[0].cost == 5.0
    assert not pareto_insert(frontier, Candidate([], 6.0, 0.5))  # dominated
    assert pareto_insert(frontier, Candidate([], 6.0, 0.7))  # tradeoff


def test_swap_with_code_requires_confident_agent():
    confident = FakeBackend(rules={
        "python_code": lambda ctx: "def transform(doc):\n    return {'summary': doc['text'][:3]}",
        "confident": lambda ctx: True,
    })
    res = optimize_ops(_ops(), PlanStats(rows=1000, avg_doc_tokens=500), backend=confident)
    swapped = [c for c in res.frontier if "swap_with_code" in dict(c.applied)]
    assert swapped and any(o.type == "code_map" for o in swapped[0].ops)

    declined = FakeBackend(rules={"python_code": lambda ctx: "", "confident": lambda ctx: False})
    res2 = optimize_ops(_ops(), PlanStats(rows=1000, avg_doc_tokens=500), backend=declined)
    assert not any("swap_with_code" in dict(c.applied) for c in res2.frontier)


def test_estimate_cost_propagates_cardinality():
    stats = PlanStats(rows=1000, avg_doc_tokens=1000, filter_selectivity=0.5)
    ops = _ops()
    base = estimate_cost(ops, stats)
    # filter-first ordering halves what the reduce sees -> cheaper
    reordered = [ops[1], ops[0], ops[2]]
    assert estimate_cost(reordered, stats) < base


def test_run_pipeline_optimize_hook(spark):
    config = {
        "optimize": {"objective": "cost", "stats": {"rows": 10, "avg_doc_tokens": 50}},
        "datasets": {"d": {"type": "memory", "data": [
            {"id": 1, "text": "alpha fast join"},
            {"id": 2, "text": "beta slow"},
        ]}},
        "operations": [
            {"name": "keep", "type": "filter", "prompt": "contains 'join'? {{ input.text }}",
             "output": {"schema": {"keep": "bool"}}},
        ],
        "pipeline": {"steps": [{"name": "s1", "input": "d", "operations": ["keep"]}]},
    }
    out = run_pipeline(spark, config, backend=FakeBackend())
    log = dict(out.op_log).get("rewrites", {})
    assert any(r.startswith("directive:") for r in log.get("fired", []))
    assert out.df.count() >= 0  # executable end-to-end after rewriting
