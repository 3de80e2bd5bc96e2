"""Typed Pipeline API tests, mirroring the shapes in the reference's
tests/test_api.py (construction with typed op objects, from_dict
round-trip, ops_by_name / get_step_for_op accessors, dict-form equijoin
step operations, execution, and the typed<->YAML round-trip)."""

import json

import pytest

from docetl_spark import (
    CodeMapOp,
    Dataset,
    EquijoinOp,
    ExtractOp,
    FakeBackend,
    MapOp,
    Pipeline,
    PipelineOutput,
    PipelineStep,
    ReduceOp,
)


@pytest.fixture()
def temp_input_file(tmp_path):
    p = tmp_path / "input.json"
    p.write_text(json.dumps([
        {"text": "This is a positive sentence.", "group": "A"},
        {"text": "This is a negative sentence.", "group": "B"},
        {"text": "This is a neutral sentence.", "group": "A"},
    ]))
    return str(p)


def _typed_pipeline(temp_input_file, out_path=""):
    return Pipeline(
        name="test_pipeline",
        datasets={"test_input": Dataset(type="file", path=temp_input_file)},
        operations=[
            MapOp(
                name="sentiment_analysis",
                type="map",
                prompt="Analyze the sentiment of: '{{ input.text }}'",
                output={"schema": {"sentiment": "string"}},
            ),
            ReduceOp(
                name="group_summary",
                type="reduce",
                reduce_key="group",
                prompt="Summarize: {{ inputs }}",
                output={"schema": {"total": "string"}},
            ),
        ],
        steps=[
            PipelineStep(name="map_step", input="test_input",
                         operations=["sentiment_analysis"]),
            PipelineStep(name="reduce_step", input="map_step",
                         operations=["group_summary"]),
        ],
        output=PipelineOutput(type="file", path=out_path),
        default_model="fake-model",
    )


# ── construction / accessors ─────────────────────────────────────


def test_typed_construction_and_accessors(temp_input_file):
    p = _typed_pipeline(temp_input_file)
    assert p.ops_by_name["sentiment_analysis"].type == "map"
    assert p.ops_by_name["group_summary"].type == "reduce"
    assert p.get_step_for_op("sentiment_analysis").name == "map_step"
    assert p.get_step_for_op("group_summary").name == "reduce_step"
    with pytest.raises(KeyError):
        p.get_step_for_op("nope")


def test_extractop_is_exported():
    op = ExtractOp(
        name="extract_sections",
        type="extract",
        document_keys=["content"],
        prompt="Extract important parts from {{ input.content }}",
        extraction_method="line_number",
    )
    assert op.type == "extract"


def test_op_models_allow_engine_extras():
    """Engine-specific knobs (gleaning, cascade, skip_on_error) ride
    through the open models and survive a dump."""
    op = MapOp(
        name="m", prompt="p", output={"schema": {"s": "str"}},
        gleaning={"num_rounds": 1, "validation_prompt": "check"},
        skip_on_error=True,
    )
    dumped = op.model_dump(exclude_none=True)
    assert dumped["gleaning"]["num_rounds"] == 1
    assert dumped["skip_on_error"] is True


# ── dict round-trip ──────────────────────────────────────────────


def test_from_dict_round_trip(temp_input_file):
    config = {
        "default_model": "fake-model",
        "datasets": {"docs": {"type": "file", "path": temp_input_file}},
        "operations": [
            {"name": "analyze", "type": "map",
             "prompt": "Analyze: {{ input.text }}",
             "output": {"schema": {"sentiment": "string"}}},
            {"name": "summarize", "type": "reduce", "reduce_key": "group",
             "prompt": "Summarize: {{ inputs }}",
             "output": {"schema": {"summary": "string"}}},
        ],
        "pipeline": {
            "steps": [
                {"name": "step1", "input": "docs", "operations": ["analyze"]},
                {"name": "step2", "input": "step1", "operations": ["summarize"]},
            ],
            "output": {"type": "file", "path": ""},
        },
    }
    p = Pipeline.from_dict(config, name="test_rt")
    assert p.name == "test_rt"
    assert p.default_model == "fake-model"
    assert len(p.operations) == 2 and len(p.steps) == 2
    assert p.ops_by_name["analyze"].type == "map"
    assert p.ops_by_name["summarize"].type == "reduce"
    assert p.get_step_for_op("analyze").name == "step1"

    rt = p._to_dict()
    assert {op["name"] for op in rt["operations"]} == {"analyze", "summarize"}
    assert len(rt["pipeline"]["steps"]) == 2
    # caller's config not mutated by output defaulting
    assert config["pipeline"]["output"] == {"type": "file", "path": ""}


def test_from_dict_keeps_type_when_validation_fails():
    """A structurally-invalid op config must still report the right
    TYPE from typed inspection (the runtime validator reports the
    config error loudly; reference api.py:126-134)."""
    p = Pipeline.from_dict({
        "datasets": {},
        "operations": [{"name": "bad_join", "type": "equijoin",
                        "comparison_prompt": 42}],  # wrong type -> model_construct
        "pipeline": {"steps": []},
    })
    assert p.ops_by_name["bad_join"].type == "equijoin"


def test_from_dict_with_equijoin_dict_step(temp_input_file, tmp_path):
    right = tmp_path / "right.json"
    right.write_text(json.dumps([{"rid": 1, "w": "x"}, {"rid": 3, "w": "y"}]))
    left = tmp_path / "left.json"
    left.write_text(json.dumps([{"lid": 1, "v": "x"}, {"lid": 2, "v": "y"}]))
    config = {
        "datasets": {
            "l": {"type": "file", "path": str(left)},
            "r": {"type": "file", "path": str(right)},
        },
        "operations": [
            {"name": "my_join", "type": "equijoin",
             "comparison_prompt": "Compare {{ left.lid }} with {{ right.rid }}",
             "left_keys": ["lid"], "right_keys": ["rid"],
             "blocking_conditions": ["left.lid = right.rid"]},
        ],
        "pipeline": {
            "steps": [
                {"name": "join_step",
                 "operations": [{"my_join": {"left": "l", "right": "r"}}]},
            ],
            "output": {"type": "file", "path": ""},
        },
    }
    p = Pipeline.from_dict(config)
    assert p.ops_by_name["my_join"].type == "equijoin"
    step_ops = p.steps[0].operations
    assert isinstance(step_ops[0], dict) and "my_join" in step_ops[0]
    # dict-form binds at compile time: left -> step input, right -> op cfg
    rc = p._runnable_config()
    assert rc["pipeline"]["steps"][0]["input"] == "l"
    assert rc["pipeline"]["steps"][0]["operations"] == ["my_join"]
    join_cfg = {o["name"]: o for o in rc["operations"]}["my_join"]
    assert join_cfg["right"] == "r"


# ── execution ────────────────────────────────────────────────────


def test_typed_pipeline_runs(spark, temp_input_file, tmp_path):
    out = str(tmp_path / "out.json")
    p = _typed_pipeline(temp_input_file, out_path=out)
    be = FakeBackend()
    frame = p.run(spark, backend=be)
    rows = frame.collect()
    assert rows and all("total" in r for r in rows)
    # output written because path was configured (Spark JSON directory)
    written = [json.loads(line) for part in __import__("pathlib").Path(out).glob("part-*")
               for line in part.read_text().splitlines() if line.strip()]
    assert len(written) == len(rows)


def test_typed_equijoin_runs(spark, tmp_path):
    config = {
        "datasets": {
            "l": {"type": "memory", "data": [{"lid": 1, "v": "x"}, {"lid": 2, "v": "y"}]},
            "r": {"type": "memory", "data": [{"rid": 1, "w": "x"}, {"rid": 3, "w": "y"}]},
        },
        "operations": [
            {"name": "my_join", "type": "equijoin",
             "comparison_prompt": "{{ left.lid }} {{ right.rid }}",
             "left_keys": ["lid"], "right_keys": ["rid"],
             "blocking_conditions": ["left.lid = right.rid"]},
        ],
        "pipeline": {"steps": [
            {"name": "join_step", "operations": [{"my_join": {"left": "l", "right": "r"}}]},
        ]},
    }
    p = Pipeline.from_dict(config)
    be = FakeBackend(rules={"is_match": lambda ctx: True})
    rows = p.run(spark, backend=be).collect()
    assert len(rows) == 1 and rows[0]["lid"] == 1 and rows[0]["rid"] == 1


def test_run_with_stats_counts_backend_calls(spark, temp_input_file):
    p = _typed_pipeline(temp_input_file)
    got = p.run_with_stats(spark, backend=FakeBackend())
    assert got["rows"] and got["calls"] > 0


def test_syntax_check_flags_bad_config(temp_input_file):
    p = _typed_pipeline(temp_input_file)
    # break the reduce op: drop its prompt
    p.ops_by_name["group_summary"].prompt = None
    issues = p.syntax_check()
    assert any(i.level == "error" for i in issues)


# ── typed <-> YAML round-trip ────────────────────────────────────


def test_to_yaml_from_yaml_round_trip(spark, temp_input_file, tmp_path):
    yaml_path = str(tmp_path / "pipe.yaml")
    p = _typed_pipeline(temp_input_file)
    p.to_yaml(yaml_path)

    # reload through the typed surface: identical config dict
    p2 = Pipeline.from_yaml(yaml_path, name=p.name)
    assert p2._to_dict() == p._to_dict()

    # and the SAME yaml runs through the yaml front-end directly
    from docetl_spark import run_yaml

    rows_yaml = run_yaml(spark, yaml_path, backend=FakeBackend()).collect()
    rows_typed = p.run(spark, backend=FakeBackend()).collect()
    assert sorted(r["group"] for r in rows_yaml) == sorted(r["group"] for r in rows_typed)


# ── optimize ─────────────────────────────────────────────────────


def test_optimize_returns_new_pipeline(temp_input_file):
    p = _typed_pipeline(temp_input_file)
    opt = p.optimize(method="directive", objective="cost")
    assert isinstance(opt, Pipeline) and opt is not p
    assert opt.name == p.name
    assert len(opt.steps) == len(p.steps)
    # every step's operations resolve in the new op list
    names = set(opt.ops_by_name)
    for s in opt.steps:
        for ref in s.operations:
            assert (ref if isinstance(ref, str) else next(iter(ref))) in names
