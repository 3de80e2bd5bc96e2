"""Fast map-decomposition tests (reference optimizers/fast_decomposer.py
parity: candidate gating by doc size, sampled runs over the real Spark
operators, pairwise judging with a round-robin tiebreaker, original-wins
and all-failed fallbacks)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from docetl_spark import FakeBackend, SemanticFrame
from docetl_spark.plans.fast_decomposer import (
    applicable_directive_names,
    avg_doc_size,
    extract_ops_to_run,
    fast_decompose,
)
from docetl_spark.plans.ir import lift

MAP_OPS = [
    {"type": "map", "name": "summ",
     "prompt": "Summarize {{ input.text }}",
     "output": {"schema": {"summary": "str"}}},
]


def _frame(spark, texts, backend):
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    return SemanticFrame.from_list(spark, rows, backend=backend)


def test_directive_gating_by_doc_size():
    ops = lift(MAP_OPS)
    short_rows = [{"text": "tiny"}] * 3
    names = applicable_directive_names(short_rows, ops[0])
    assert names == ["chaining", "isolating_subtasks", "gleaning",
                     "clarify_instructions"]
    long_rows = [{"text": "x" * 2000}] * 3
    names = applicable_directive_names(long_rows, ops[0])
    assert names[0] == "deterministic_doc_compression"
    assert "doc_chunking" not in names  # 500 tokens << 10% of 128k
    huge_rows = [{"text": "x" * 80_000}] * 3
    names = applicable_directive_names(huge_rows, ops[0], context_limit_tokens=128_000)
    assert names[-1] == "doc_chunking"
    # avg_doc_size falls back to long string fields when the prompt
    # template names none
    blank = lift([{"type": "map", "name": "m", "prompt": "no fields",
                   "output": {"schema": {"s": "str"}}}])[0]
    chars, toks = avg_doc_size([{"body": "y" * 400, "id": 1}], blank)
    assert chars == 400 and toks == 100


def test_extract_ops_to_run_names():
    ops = lift(MAP_OPS + [{"type": "code_filter", "name": "keep", "predicate": "1=1"}])
    cand = lift([
        {"type": "code_map", "name": "summ_compress", "code": "def transform(d): return {}",
         "output": {"schema": {"text": "str"}}},
    ] + MAP_OPS + [{"type": "code_filter", "name": "keep", "predicate": "1=1"}])
    seg = extract_ops_to_run(ops, cand, "summ")
    assert [o.config.get("name") for o in seg] == ["summ_compress", "summ"]
    # unchanged candidate -> just the target op
    seg2 = extract_ops_to_run(ops, ops, "summ")
    assert [o.config.get("name") for o in seg2] == ["summ"]


def test_fast_decompose_original_wins(spark):
    be = FakeBackend(rules={"winner": lambda ctx: "A"})
    sf = _frame(spark, ["alpha beta", "gamma delta"], be)
    res = fast_decompose(sf, lift(MAP_OPS), "summ", backend=be, sample_size=2)
    assert res.winning_directive == "original"
    assert [o.config.get("name") for o in res.decomposed_ops] == ["summ"]
    assert res.candidates_evaluated >= 2
    assert len(res.original_outputs) == 2
    assert res.calls > 0  # sampled runs actually hit the backend


def test_fast_decompose_challenger_wins_with_tiebreak(spark):
    # every challenger beats the original; the round-robin tiebreaker
    # then always prefers variant B, so the LAST candidate in catalog
    # priority order wins deterministically
    be = FakeBackend(rules={"winner": lambda ctx: "B"})
    sf = _frame(spark, ["alpha beta", "gamma delta"], be)
    res = fast_decompose(sf, lift(MAP_OPS), "summ", backend=be, sample_size=2)
    assert res.winning_directive not in ("original",)
    assert res.decomposed_outputs  # winner carries its sample outputs


def test_fast_decompose_validates_target(spark):
    be = FakeBackend()
    sf = _frame(spark, ["t"], be)
    with pytest.raises(ValueError, match="not found"):
        fast_decompose(sf, lift(MAP_OPS), "nope", backend=be)
    red = lift([{"type": "reduce", "name": "r", "reduce_key": "doc_id",
                 "prompt": "p {{ input.text }}",
                 "output": {"schema": {"s": "str"}}}])
    with pytest.raises(ValueError, match="only supports 'map'"):
        fast_decompose(sf, red, "r", backend=be)


def test_run_pipeline_fast_decompose_method(spark):
    """`optimize: {method: fast_decompose}` replaces the target map in
    the executed pipeline when a challenger wins, and records the fired
    rewrite in the op_log."""
    be = FakeBackend(rules={"winner": lambda ctx: "B"})
    config = {
        "default_model": "fake",
        "datasets": {"docs": {"type": "memory", "data": [
            {"doc_id": 1, "text": "alpha beta"}, {"doc_id": 2, "text": "gamma"},
        ]}},
        "operations": MAP_OPS,
        "pipeline": {"steps": [
            {"name": "s1", "input": "docs", "operations": ["summ"]},
        ]},
        "optimize": {"method": "fast_decompose", "target": "summ", "sample_size": 2},
    }
    from docetl_spark import run_pipeline

    out = run_pipeline(spark, config, backend=be)
    assert out.df.count() == 2
    fired = dict(out.op_log).get("rewrites", {}).get("fired", [])
    assert any(f.startswith("fast_decompose:") for f in fired)
