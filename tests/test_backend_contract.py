"""Stubbed-litellm contract tests for LiteLLMBackend (VERDICT r4 item
#4): lock the completion/tools/structured-output/embedding request
payloads against a fake ``litellm`` module, so the production backend's
wire format is pinned even though this sandbox has no network and no
litellm install.

Reference request construction: /root/reference/docetl/operations/utils/
api.py:588-734 (call_llm output modes), 760-900 (_call_llm_with_cache:
send_output tool, strict/additionalProperties model carve-outs,
structured_output response_format), validation.py:137-171 (convert_val
type grammar), api.py:179+ (gen_embedding).
"""

import json
import sys
import types as pytypes
from types import SimpleNamespace

import pytest

from docetl_spark.backend import LiteLLMBackend


def _tool_response(payload: dict):
    call = SimpleNamespace(
        function=SimpleNamespace(name="send_output", arguments=json.dumps(payload))
    )
    msg = SimpleNamespace(content=None, tool_calls=[call])
    return SimpleNamespace(choices=[SimpleNamespace(message=msg)])


def _content_response(payload: dict):
    msg = SimpleNamespace(content=json.dumps(payload), tool_calls=None)
    return SimpleNamespace(choices=[SimpleNamespace(message=msg)])


@pytest.fixture()
def fake_litellm(monkeypatch):
    """Install a recording ``litellm`` module into sys.modules so the
    backend's lazy ``import litellm`` (the production path) resolves."""
    mod = pytypes.ModuleType("litellm")
    mod.calls = []
    mod.embed_calls = []
    mod.next_response = _tool_response({"answer": "ok"})

    def completion(**kw):
        mod.calls.append(kw)
        return mod.next_response

    def embedding(model, input):
        mod.embed_calls.append({"model": model, "input": list(input)})
        return SimpleNamespace(data=[{"embedding": [0.1, 0.2]} for _ in input])

    mod.completion = completion
    mod.embedding = embedding
    monkeypatch.setitem(sys.modules, "litellm", mod)
    return mod


SCHEMA = {
    "title": "str",
    "count": "int",
    "score": "float",
    "keep": "bool",
    "tags": "list[str]",
    "kind": "enum[a, b]",
}

EXPECT_PROPS = {
    "title": {"type": "string"},
    "count": {"type": "integer"},
    "score": {"type": "number"},
    "keep": {"type": "boolean"},
    "tags": {"type": "array", "items": {"type": "string"}},
    "kind": {"type": "string", "enum": ["a", "b"]},
}


def test_tools_mode_request_shape(fake_litellm):
    """Default output mode = tools (reference OutputMode.TOOLS): one
    send_output function tool with convert_val-typed parameters, forced
    tool_choice, strict + additionalProperties for openai-style models;
    result parsed from tool_calls[0].function.arguments."""
    fake_litellm.next_response = _tool_response({"title": "t", "count": 2})
    be = LiteLLMBackend("gpt-4o-mini")
    out = be.complete("the prompt", SCHEMA, {"id": 1})
    assert out == {"title": "t", "count": 2}

    [kw] = fake_litellm.calls
    assert kw["messages"] == [{"role": "user", "content": "the prompt"}]
    assert "response_format" not in kw
    [tool] = kw["tools"]
    assert tool["type"] == "function"
    fn = tool["function"]
    assert fn["name"] == "send_output"
    assert fn["description"] == "Send output back to the user"
    params = fn["parameters"]
    assert params["type"] == "object"
    assert params["properties"] == EXPECT_PROPS
    assert params["required"] == list(SCHEMA)
    # openai-style models get the strict/additionalProperties lockdown
    assert params["additionalProperties"] is False
    assert tool["strict"] is True and tool["additionalProperties"] is False
    assert kw["tool_choice"] == {
        "type": "function",
        "function": {"name": "send_output"},
    }


def test_tools_mode_model_carveouts(fake_litellm):
    """claude models reject strict; gemini rejects additionalProperties
    (api.py:786-838)."""
    fake_litellm.next_response = _tool_response({"x": "1"})
    LiteLLMBackend("claude-sonnet-4").complete("p", {"x": "str"}, None)
    LiteLLMBackend("gemini/gemini-2.0-flash").complete("p", {"x": "str"}, None)
    claude_kw, gemini_kw = fake_litellm.calls

    [ctool] = claude_kw["tools"]
    assert "strict" not in ctool and "additionalProperties" not in ctool
    assert "additionalProperties" not in ctool["function"]["parameters"]

    [gtool] = gemini_kw["tools"]
    assert gtool["strict"] is True  # strict stays for gemini
    assert "additionalProperties" not in gtool["function"]["parameters"]


def test_structured_output_mode_request_shape(fake_litellm):
    """output_mode='structured_output': response_format json_schema named
    structured_output with strict, no tools; parsed from content."""
    fake_litellm.next_response = _content_response({"title": "t"})
    be = LiteLLMBackend("gpt-4o-mini", output_mode="structured_output")
    out = be.complete("p", SCHEMA, None)
    assert out == {"title": "t"}

    [kw] = fake_litellm.calls
    assert "tools" not in kw and "tool_choice" not in kw
    rf = kw["response_format"]
    assert rf["type"] == "json_schema"
    js = rf["json_schema"]
    assert js["name"] == "structured_output"
    assert js["strict"] is True
    assert js["schema"]["properties"] == EXPECT_PROPS
    assert js["schema"]["required"] == list(SCHEMA)
    assert js["schema"]["additionalProperties"] is False


def test_batch_prompt_results_array_schema(fake_litellm):
    """complete_batch wraps the item schema in a results array and pads
    short answers to preserve row alignment."""
    fake_litellm.next_response = _tool_response(
        {"results": [{"s": "a"}, {"s": "b"}]}
    )
    be = LiteLLMBackend("gpt-4o-mini")
    out = be.complete_batch("batch prompt", {"s": "str"}, [{}, {}, {}])
    assert out == [{"s": "a"}, {"s": "b"}, {}]

    [kw] = fake_litellm.calls
    params = kw["tools"][0]["function"]["parameters"]
    assert params["required"] == ["results"]
    res = params["properties"]["results"]
    assert res["type"] == "array"
    assert res["items"]["properties"] == {"s": {"type": "string"}}
    assert res["items"]["additionalProperties"] is False


def test_attachments_multimodal_content_blocks(fake_litellm):
    fake_litellm.next_response = _tool_response({"s": "x"})
    be = LiteLLMBackend("gpt-4o-mini")
    be.complete_with_attachments(
        "describe", {"s": "str"}, None,
        [{"type": "pdf", "data_url": "data:application/pdf;base64,AAAA"}],
    )
    [kw] = fake_litellm.calls
    content = kw["messages"][0]["content"]
    assert content[0] == {
        "type": "image_url",
        "image_url": {"url": "data:application/pdf;base64,AAAA"},
    }
    assert content[-1] == {"type": "text", "text": "describe"}


def test_embedding_payload(fake_litellm):
    be = LiteLLMBackend("gpt-4o-mini", embedding_model="text-embedding-3-small")
    vecs = be.embed(["a", "b"])
    assert vecs == [[0.1, 0.2], [0.1, 0.2]]
    [kw] = fake_litellm.embed_calls
    assert kw == {"model": "text-embedding-3-small", "input": ["a", "b"]}


def test_fallback_chain_order_and_kwargs_ride_along(fake_litellm):
    """Router-fallback parity (runner.py:39-88): primary first, then each
    fallback; litellm_completion_kwargs ride into EVERY attempt."""
    seen = []

    def completion(**kw):
        seen.append(kw)
        if kw["model"] != "m3":
            raise ConnectionError(f"{kw['model']} down")
        return _tool_response({"x": "ok"})

    fake_litellm.completion = completion
    be = LiteLLMBackend("m1", fallback_models=["m2", "m3"], temperature=0.2)
    out = be.complete("p", {"x": "str"}, None)
    assert out == {"x": "ok"}
    assert [kw["model"] for kw in seen] == ["m1", "m2", "m3"]
    assert all(kw["temperature"] == 0.2 for kw in seen)
    # identical request otherwise (same messages + same tools) down the chain
    assert seen[0]["tools"] == seen[1]["tools"] == seen[2]["tools"]


def test_fallback_rebuilds_fragment_per_model_family(fake_litellm):
    """Cross-family fallback (gpt primary -> claude fallback): the claude
    attempt must NOT receive strict/additionalProperties, which claude
    rejects — freezing the primary's fragment would make the fallback
    fail exactly when it is needed."""
    seen = []

    def completion(**kw):
        seen.append(kw)
        if "claude" not in kw["model"]:
            raise ConnectionError(f"{kw['model']} down")
        return _tool_response({"x": "ok"})

    fake_litellm.completion = completion
    be = LiteLLMBackend("gpt-4o-mini", fallback_models=["claude-sonnet-4"])
    assert be.complete("p", {"x": "str"}, None) == {"x": "ok"}
    gpt_kw, claude_kw = seen
    [gt] = gpt_kw["tools"]
    assert gt["strict"] is True and gt["function"]["parameters"]["additionalProperties"] is False
    [ct] = claude_kw["tools"]
    assert "strict" not in ct and "additionalProperties" not in ct
    assert "additionalProperties" not in ct["function"]["parameters"]


def test_malformed_tool_arguments_are_diagnosable(fake_litellm):
    """Truncated/garbage tool_call arguments must raise a ValueError that
    carries finish_reason context, not a bare JSONDecodeError."""
    call = SimpleNamespace(
        function=SimpleNamespace(name="send_output", arguments='{"x": trunca')
    )
    msg = SimpleNamespace(content=None, tool_calls=[call])
    fake_litellm.next_response = SimpleNamespace(
        choices=[SimpleNamespace(message=msg, finish_reason="length")]
    )
    with pytest.raises(ValueError, match="length"):
        LiteLLMBackend("gpt-4o-mini").complete("p", {"x": "str"}, None)


def test_with_options_preserves_mode_and_adds_kwargs(fake_litellm):
    fake_litellm.next_response = _content_response({"x": "1"})
    be = LiteLLMBackend("gpt-4o-mini", output_mode="structured_output")
    opt = be.with_options(model="gpt-4o", timeout=30,
                          litellm_completion_kwargs={"top_p": 0.9})
    assert opt.output_mode == "structured_output"
    opt.complete("p", {"x": "str"}, None)
    [kw] = fake_litellm.calls
    assert kw["model"] == "gpt-4o"
    assert kw["timeout"] == 30 and kw["top_p"] == 0.9


def test_tools_mode_content_fallback_parse(fake_litellm):
    """A model that ignores the forced tool call and answers in content
    still parses (defensive fallback)."""
    fake_litellm.next_response = _content_response({"x": "c"})
    assert LiteLLMBackend("gpt-4o-mini").complete("p", {"x": "str"}, None) == {"x": "c"}


def test_no_tool_call_and_no_content_is_diagnosable(fake_litellm):
    """A refusal (no tool_calls, content=None) must raise a clear error,
    not TypeError from json.loads(None) inside an executor."""
    msg = SimpleNamespace(content=None, tool_calls=None)
    fake_litellm.next_response = SimpleNamespace(
        choices=[SimpleNamespace(message=msg, finish_reason="content_filter")]
    )
    with pytest.raises(ValueError, match="content_filter"):
        LiteLLMBackend("gpt-4o-mini").complete("p", {"x": "str"}, None)
    with pytest.raises(ValueError, match="no content"):
        LiteLLMBackend("gpt-4o-mini", output_mode="structured_output").complete(
            "p", {"x": "str"}, None)


def test_invalid_output_mode_rejected():
    with pytest.raises(ValueError, match="output mode"):
        LiteLLMBackend("gpt-4o-mini", output_mode="yaml")
