"""Agent + tool layer for agentic operations.

Reference: /root/reference/docetl/agents.py (Tool / Agent / AgentTool
dataclasses, signature-derived JSON-schema parameters) and the
``agent=`` kwarg on map/filter ops (frame.py:347,427; map.py:44,493).

Spark realization: the agent LOOP runs executor-side inside the same
``mapInPandas`` stage as a plain semantic map — each row gets a bounded
multi-turn tool loop through the ModelBackend protocol, so rate
limiting / retries / caching (ResilientBackend) and call-concurrency
overlap apply unchanged. Tools are plain Python callables that ride the
UDF closure; they must be picklable and executor-safe (no driver state).

The decision protocol is structured, not free-text: each turn the model
fills {action: enum[tool, finish], tool_name, tool_args(JSON)} — which
keeps the loop deterministic under FakeBackend rules and avoids parsing
model prose.
"""

from __future__ import annotations

import inspect
import json
import typing
from dataclasses import dataclass, field

_PY_TO_JSON = {int: "integer", float: "number", str: "string", bool: "boolean",
               list: "array", dict: "object"}


def _params_schema(fn) -> dict:
    """JSON-schema for a callable's parameters from its signature/type
    hints (reference agents.py _get_callable_hash/parameter derivation)."""
    hints = typing.get_type_hints(fn)
    props, required = {}, []
    for name, p in inspect.signature(fn).parameters.items():
        if p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD):
            continue
        t = hints.get(name)
        origin = typing.get_origin(t) or t
        props[name] = {"type": _PY_TO_JSON.get(origin, "string")}
        if p.default is p.empty:
            required.append(name)
    return {"type": "object", "properties": props, "required": required}


@dataclass(frozen=True)
class Tool:
    """A Python callable exposed to the agent as a structured tool."""

    function: typing.Callable
    name: str
    description: str
    parameters: dict
    timeout: float | None = None


def tool(fn=None, *, name: str | None = None, description: str | None = None,
         timeout: float | None = None):
    """Decorator/factory: ``@tool`` or ``tool(fn, name=..., ...)``."""

    def build(f) -> Tool:
        return Tool(
            function=f,
            name=name or f.__name__,
            description=description or (inspect.getdoc(f) or "").strip(),
            parameters=_params_schema(f),
            timeout=timeout,
        )

    return build(fn) if fn is not None else build


@dataclass(frozen=True)
class Agent:
    """Loop configuration for an agentic operation (agents.py:38-53)."""

    tools: list[Tool] = field(default_factory=list)
    max_turns: int = 5
    max_tool_calls: int = 20
    continue_on_tool_error: bool = True
    instructions: str | None = None

    def as_tool(self, *, name: str, description: str,
                output_schema: dict | None = None) -> "AgentTool":
        return AgentTool(agent=self, name=name, description=description,
                         output_schema=output_schema)


@dataclass(frozen=True)
class AgentTool:
    """A specialist agent exposed as a tool to a manager agent
    (agents.py:89-108). Calling it runs the sub-agent's own loop."""

    agent: Agent
    name: str
    description: str
    output_schema: dict | None = None


_DECISION_SCHEMA = {"action": "enum[tool, finish]", "tool_name": "str", "tool_args": "str"}


def _tool_block(tools: list) -> str:
    lines = []
    for t in tools:
        params = t.parameters if isinstance(t, Tool) else {"type": "object", "properties": {"prompt": {"type": "string"}}}
        lines.append(f"- {t.name}: {t.description} (parameters: {json.dumps(params)})")
    return "\n".join(lines)


def _call_tool(backend, t, args: dict, output_schema_hint: dict):
    if isinstance(t, AgentTool):
        sub_prompt = str(args.get("prompt", json.dumps(args)))
        return run_agent(backend, t.agent, sub_prompt,
                         t.output_schema or output_schema_hint, args)
    return t.function(**args)


def run_agent(backend, agent: Agent, prompt: str, output_schema: dict, context) -> dict:
    """Bounded multi-turn tool loop; returns the final structured output.

    Each turn the backend decides tool-vs-finish via _DECISION_SCHEMA;
    tool observations append to the transcript; the final completion
    produces ``output_schema``. Tool errors become observations when
    ``continue_on_tool_error`` (reference agents.py loop semantics).
    """
    by_name = {t.name: t for t in agent.tools}
    transcript: list[str] = []
    tool_calls = 0
    header = (agent.instructions + "\n\n" if agent.instructions else "") + (
        "You may call these tools before answering:\n" + _tool_block(agent.tools) + "\n\n"
        if agent.tools else ""
    )
    for _ in range(agent.max_turns):
        if not agent.tools or tool_calls >= agent.max_tool_calls:
            break
        step = (
            header + prompt
            + ("\n\nTool observations so far:\n" + "\n".join(transcript) if transcript else "")
            + "\n\nDecide: call a tool (action=tool) or finish (action=finish)."
        )
        decision = backend.complete(step, dict(_DECISION_SCHEMA), context)
        if str(decision.get("action", "finish")).lower() != "tool":
            break
        t = by_name.get(str(decision.get("tool_name", "")))
        if t is None:
            transcript.append(f"[error] unknown tool {decision.get('tool_name')!r}")
            continue
        try:
            args = json.loads(decision.get("tool_args") or "{}")
            if not isinstance(args, dict):
                args = {"value": args}
            obs = _call_tool(backend, t, args, output_schema)
        except Exception as e:  # noqa: BLE001 — observation, not crash
            if not agent.continue_on_tool_error:
                raise
            obs = f"error: {e}"
        tool_calls += 1
        transcript.append(f"{t.name}({json.dumps(args, default=str)}) -> {json.dumps(obs, default=str)}")
    final = (
        header + prompt
        + ("\n\nTool observations:\n" + "\n".join(transcript) if transcript else "")
        + "\n\nProduce the final structured output."
    )
    return backend.complete(final, output_schema, context)
