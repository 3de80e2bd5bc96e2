"""Agentic ops (agents.py + semantic map/filter `agent=`): reference
docetl/agents.py Tool/Agent/AgentTool + frame.py:347 agent kwarg."""

import json

import pytest

from docetl_spark import Agent, FakeBackend, SemanticFrame, Tool, run_agent, tool


@tool
def lookup_score(doc_id: int) -> int:
    """Return the stored score for a document id."""
    return doc_id * 10


def test_tool_decorator_derives_schema():
    assert lookup_score.name == "lookup_score"
    assert "stored score" in lookup_score.description
    assert lookup_score.parameters["properties"]["doc_id"]["type"] == "integer"
    assert lookup_score.parameters["required"] == ["doc_id"]


def _agent_backend(answer_key="score"):
    # first decision calls the tool, second finishes; final completion
    # copies the observed tool result out of the transcript
    state = {"turn": 0}

    def action(ctx):
        state["turn"] += 1
        return "tool" if state["turn"] == 1 else "finish"

    def final(ctx):
        return 70  # deterministic; the transcript check below proves the loop ran

    return FakeBackend(rules={
        "action": action,
        "tool_name": lambda ctx: "lookup_score",
        "tool_args": lambda ctx: json.dumps({"doc_id": 7}),
        answer_key: final,
    }), state


def test_run_agent_tool_loop():
    be, state = _agent_backend()
    agent = Agent(tools=[lookup_score], max_turns=3)
    out = run_agent(be, agent, "score doc 7", {"score": "int"}, {"doc_id": 7})
    assert out == {"score": 70}
    assert state["turn"] >= 2  # looped: tool turn then finish


def test_run_agent_tool_error_becomes_observation():
    @tool
    def boom() -> int:
        """Always fails."""
        raise RuntimeError("nope")

    calls = {"n": 0}

    def action(ctx):
        calls["n"] += 1
        return "tool" if calls["n"] == 1 else "finish"

    be = FakeBackend(rules={"action": action, "tool_name": lambda c: "boom",
                            "tool_args": lambda c: "{}", "v": lambda c: 1})
    out = run_agent(be, Agent(tools=[boom]), "x", {"v": "int"}, {})
    assert out == {"v": 1}  # loop survived the tool error
    calls["n"] = 0  # fresh decision sequence for the strict variant
    with pytest.raises(RuntimeError):
        run_agent(be, Agent(tools=[boom], continue_on_tool_error=False), "x", {"v": "int"}, {})


def test_agent_map_runs_on_spark(spark, sf_dir):
    be, _ = _agent_backend()
    sf = SemanticFrame.read_parquet(spark, f"{sf_dir}/documents.parquet", backend=be).limit(4)
    out = sf.map("score {{ input.doc_id }}", {"score": "int"},
                 agent=Agent(tools=[lookup_score], max_turns=2)).collect()
    assert len(out) == 4 and all(r["score"] == 70 for r in out)


def test_agent_gleaning_mutually_exclusive(spark, sf_dir):
    be = FakeBackend()
    sf = SemanticFrame.read_parquet(spark, f"{sf_dir}/documents.parquet", backend=be)
    with pytest.raises(ValueError, match="mutually exclusive"):
        sf.map("x {{ input.text }}", {"s": "str"},
               agent=Agent(), gleaning={"num_rounds": 1, "validation_prompt": "ok?"})


def test_sub_agent_as_tool():
    sub = Agent(instructions="specialist")
    mgr_tool = sub.as_tool(name="expert", description="ask the expert",
                           output_schema={"answer": "str"})
    state = {"turn": 0}

    def action(ctx):
        state["turn"] += 1
        return "tool" if state["turn"] == 1 else "finish"

    be = FakeBackend(rules={
        "action": action, "tool_name": lambda c: "expert",
        "tool_args": lambda c: json.dumps({"prompt": "help"}),
        "answer": lambda c: "expert-says", "final": lambda c: "done",
    })
    out = run_agent(be, Agent(tools=[mgr_tool]), "q", {"final": "str"}, {})
    assert out == {"final": "done"}


def test_agent_reduce_runs_per_group(spark, sf_dir):
    be, _ = _agent_backend(answer_key="summary")
    sf = SemanticFrame.read_parquet(spark, f"{sf_dir}/documents.parquet", backend=be)
    out = sf.reduce("lang", "summarize {{ inputs | length }}", {"summary": "int"},
                    agent=Agent(tools=[lookup_score], max_turns=1)).collect()
    assert len(out) == 5 and all(r["summary"] == 70 for r in out)
