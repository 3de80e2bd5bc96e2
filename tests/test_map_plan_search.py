"""Map plan search tests (reference map_optimizer/plan_generators.py
_generate_chunk_size_plans :48-366 + _generate_gleaning_plans :541-574
+ evaluator.py sample-run-judge flow: the chunk-size ladder expanded
through the doc_chunking rewrite, gleaning-round candidates with an
agent-written validator, candidate runs through the real operators,
pairwise-judged winner)."""

import pytest

from docetl_spark import FakeBackend, SemanticFrame
from docetl_spark.plans.ir import lift
from docetl_spark.plans.map_plan_search import (
    candidate_chunk_sizes,
    map_plan_search,
    synthesize_validator_prompt,
)

MAP = {"type": "map", "name": "summ", "prompt": "Summarize: {{ input.text }}",
       "output": {"schema": {"summary": "str"}}}


def _frame(spark, backend, n=6, words=60):
    rows = [{"doc_id": i, "text": " ".join(f"w{i}x{j}" for j in range(words))}
            for i in range(n)]
    return SemanticFrame.from_df(spark.createDataFrame(rows), backend=backend)


def test_candidate_chunk_sizes_ladder_and_gating():
    rows = [{"text": " ".join(["w"] * 100)}] * 4
    sizes = candidate_chunk_sizes(rows, "text", context_limit_tokens=200,
                                  num_chunks=4)
    # 199 chars -> ~49 tokens; limit = min(150, 49) = 49; ladder
    # 20..49; sizes >= the avg doc's token count drop — every kept
    # size genuinely splits the avg doc IN THE CHUNKER'S UNIT (tokens)
    assert sizes and sizes == sorted(set(sizes))
    assert all(20 <= s < 49 for s in sizes)
    # tiny docs: nothing splits -> empty ladder
    short = [{"text": "a b c"}] * 4
    assert candidate_chunk_sizes(short, "text") == []
    assert candidate_chunk_sizes([], "text") == []


def test_synthesize_validator_prompt_fallback():
    be = FakeBackend(rules={"validator_prompt": lambda ctx: ""})
    v = synthesize_validator_prompt(MAP, [{"text": "t"}], be)
    assert "faithfully" in v  # generic fallback, never empty
    be2 = FakeBackend(rules={"validator_prompt": lambda ctx: "Check names."})
    assert synthesize_validator_prompt(MAP, [], be2) == "Check names."


def test_map_plan_search_promotes_chunking_when_judge_prefers_it(spark):
    be = FakeBackend(rules={
        "summary": lambda ctx: "s",
        "validator_prompt": lambda ctx: "Check it.",
        "winner": lambda ctx: "B",       # the challenger always wins
        "rationale": lambda ctx: "chunked reads everything",
    })
    sf = _frame(spark, be)
    res = map_plan_search(sf, lift([MAP]), "summ", backend=be,
                          sample_size=3, context_limit_tokens=80,
                          gleaning_rounds=())
    assert res.winning_plan.startswith("chunk_")
    types = [o.type for o in res.ops]
    assert types == ["split", "gather", "map", "reduce"]
    assert res.plans_evaluated >= 2 and res.calls > 0
    assert res.rationale == "chunked reads everything"


def test_map_plan_search_gleaning_candidate(spark):
    be = FakeBackend(rules={
        "summary": lambda ctx: "s",
        "validator_prompt": lambda ctx: "Check completeness.",
        "winner": lambda ctx: "B",
        "rationale": lambda ctx: "glean wins",
    })
    sf = _frame(spark, be, words=4)  # too short to chunk: gleaning only
    res = map_plan_search(sf, lift([MAP]), "summ", backend=be,
                          sample_size=3, gleaning_rounds=(1,))
    assert res.winning_plan == "gleaning_1_rounds"
    target = next(o for o in res.ops if o.config.get("name") == "summ")
    assert target.config["gleaning"] == {
        "num_rounds": 1, "validation_prompt": "Check completeness."}


def test_map_plan_search_keeps_original_when_judge_prefers_it(spark):
    be = FakeBackend(rules={
        "summary": lambda ctx: "s",
        "validator_prompt": lambda ctx: "v",
        "winner": lambda ctx: "A",       # incumbent always wins
        "rationale": lambda ctx: "original fine",
    })
    sf = _frame(spark, be)
    res = map_plan_search(sf, lift([MAP]), "summ", backend=be,
                          sample_size=3, context_limit_tokens=80)
    assert res.winning_plan == "original"
    assert [o.type for o in res.ops] == ["map"]


def test_map_plan_search_proj_synthesis_candidate(spark):
    # r9 VERDICT ask #3: a decomposable multi-concern map must be able
    # to pick the projection-synthesis plan INSIDE the judged search,
    # not only via fast_decompose's directive loop
    be = FakeBackend(rules={
        "title": lambda ctx: "t",
        "tone": lambda ctx: "calm",
        "validator_prompt": lambda ctx: "v",
        "winner": lambda ctx: "B",       # the challenger always wins
        "rationale": lambda ctx: "isolated prompts read cleaner",
    })
    multi = {"type": "map", "name": "summ",
             "prompt": "Title and tone of: {{ input.text }}",
             "output": {"schema": {"title": "str", "tone": "str"}}}
    sf = _frame(spark, be, words=4)  # too short to chunk
    res = map_plan_search(sf, lift([multi]), "summ", backend=be,
                          sample_size=3, gleaning_rounds=())
    assert res.winning_plan == "proj_synthesis"
    assert [o.type for o in res.ops] == ["parallel_map", "map"]
    # single-field maps never get the candidate (decompose to themselves)
    be2 = FakeBackend(rules={
        "summary": lambda ctx: "s", "validator_prompt": lambda ctx: "v",
        "winner": lambda ctx: "B", "rationale": lambda ctx: "r"})
    sf2 = _frame(spark, be2, words=4)
    res2 = map_plan_search(sf2, lift([MAP]), "summ", backend=be2,
                           sample_size=3, gleaning_rounds=())
    assert res2.winning_plan == "original"


def test_pick_doc_key_prefers_longest_string_field():
    from docetl_spark.plans.map_plan_search import _pick_doc_key
    from docetl_spark.plans.ir import lift as _lift

    multi = _lift([{"type": "map", "name": "m",
                    "prompt": "For {{ input.category }} and {{ input.text }}",
                    "output": {"schema": {"s": "str"}}}])[0]
    rows = [{"category": "ads", "text": "x" * 400},
            {"category": "news", "text": "y" * 300}]
    # pre-r10 the alphabetically-first field ('category') drove the
    # chunk ladder; the document column must win instead
    assert _pick_doc_key(multi, rows) == "text"
    explicit = _lift([{"type": "map", "name": "m", "split_key": "category",
                       "prompt": "For {{ input.category }} and {{ input.text }}",
                       "output": {"schema": {"s": "str"}}}])[0]
    assert _pick_doc_key(explicit, rows) == "category"


def test_map_plan_search_validates_target(spark):
    be = FakeBackend()
    sf = _frame(spark, be)
    with pytest.raises(ValueError, match="not found"):
        map_plan_search(sf, lift([MAP]), "nope", backend=be)
    rops = lift([{"type": "reduce", "name": "r", "reduce_key": "doc_id",
                  "prompt": "p {{ inputs }}",
                  "output": {"schema": {"s": "str"}}}])
    with pytest.raises(ValueError, match="only supports 'map'"):
        map_plan_search(sf, rops, "r", backend=be)


def test_optimize_map_plans_hook(spark):
    be = FakeBackend(rules={
        "summary": lambda ctx: "s",
        "validator_prompt": lambda ctx: "v",
        "winner": lambda ctx: "B",
        "rationale": lambda ctx: "chunk wins",
    })
    from docetl_spark import run_pipeline

    cfg = {
        "optimize": {"method": "map_plans", "sample_size": 3,
                     "context_limit_tokens": 80},
        "datasets": {"d": {"type": "memory", "data": [
            {"doc_id": i, "text": " ".join(f"w{j}" for j in range(60))}
            for i in range(6)
        ]}},
        "operations": [dict(MAP)],
        "pipeline": {"steps": [{"name": "s1", "input": "d",
                                "operations": ["summ"]}]},
    }
    out = run_pipeline(spark, cfg, backend=be)
    fired = dict(out.op_log).get("rewrites", {}).get("fired", [])
    assert any(f.startswith("map_plans:") for f in fired), fired
    assert out.df.count() >= 1
