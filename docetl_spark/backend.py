"""Model backend abstraction for semantic (LLM-parameterized) operators.

The reference executes every semantic op through one LLM invocation layer
(/root/reference/docetl/operations/utils/api.py:588-734 `call_llm`, plus
`gen_embedding` api.py:179+). We re-create that layer behind a small
protocol so that:

- correctness tests / the DuckDB oracle run against a deterministic
  ``FakeBackend`` (pure function of the rendered prompt + row context);
- a real deployment plugs in an HTTP-backed implementation with
  batching, retries and caching at the executor level.

Backends are constructed on the driver and shipped to executors inside
Pandas-UDF closures, so they must be picklable and cheap to initialize;
any network client must be created lazily per-executor (see
``LiteLLMBackend._client``).
"""

from __future__ import annotations

import hashlib
import re
from typing import Any, Callable

import numpy as np


class ModelBackend:
    """Protocol: complete / embed / classify_logprob.

    ``complete`` receives the rendered prompt, the declared output schema
    (dict of key -> type spec string) and the originating row(s) as
    ``context`` (a dict for row-level ops, a list of dicts for group-level
    ops). Implementations return a dict conforming to the schema.

    ``max_concurrency`` declares how many in-flight calls one executor
    task may issue (the reference's 4×cpu thread pool per op,
    runner.py:156). Latency-bound backends (HTTP) should raise it; pure
    computations leave it at 1 and operators stay loop-serial.
    """

    max_concurrency: int = 1

    def complete(self, prompt: str, output_schema: dict, context: Any) -> dict:
        raise NotImplementedError

    def complete_batch(self, prompt: str, output_schema: dict, items: list) -> list[dict]:
        """One rendered batch prompt → one output dict per input item
        (the reference's batch_prompt path, map.py:532-560, renders
        ``{{ inputs }}`` and expects per-item results back). The default
        loops ``complete`` per item — real backends override with a
        single call returning an array, amortizing model latency."""
        return [self.complete(prompt, output_schema, item) for item in items]

    def embed(self, texts: list[str]) -> list[list[float]]:
        raise NotImplementedError

    def classify_logprob(self, prompt: str, labels: list[str], context: Any):
        raise NotImplementedError

    def with_options(self, **opts) -> "ModelBackend":
        """Per-op override hook (reference per-op ``model`` / ``timeout``
        / ``litellm_completion_kwargs`` configs, frame.py:340-357). The
        base/deterministic backends have nothing to vary — return self;
        real backends return a reconfigured copy."""
        return self

    def complete_with_attachments(
        self, prompt: str, output_schema: dict, context: Any, attachments: list
    ) -> dict:
        """Multimodal completion: ``attachments`` are
        ``{"type": "pdf"|"image", "data_url": "data:..."}`` blocks
        prepended to the prompt (the reference's pdf_url_key path,
        map.py:415-437). Deterministic/text-only backends ignore the
        attachments and answer from the prompt + context — the plumbing
        (per-row fetch, base64 data url, schema) is exercised either
        way."""
        return self.complete(prompt, output_schema, context)


_POSITIVE = ("good", "great", "excellent", "love", "happy", "wonderful")
_NEGATIVE = ("bad", "terrible", "awful", "hate", "sad", "horrible")

_norm_re = re.compile(r"[^a-z0-9]+")


def normalize_text(s: str) -> str:
    """Lowercase and collapse non-alphanumerics — the FakeBackend's notion
    of entity equality (mirrors the reference test style of asserting
    invariants rather than exact strings, SURVEY.md §5)."""
    return _norm_re.sub(" ", (s or "").lower()).strip()


class FakeBackend(ModelBackend):
    """Deterministic backend (FIXTURES.md `FakeBackend contract`).

    Default rules (each mirrorable in ANSI SQL for the DuckDB oracle):

    - ``sentiment`` keys: first positive keyword wins, then negative,
      else ``neutral`` (keywords above, checked in order).
    - boolean keys (``is_match``/``matched``/``same``/``keep``): when the
      context carries exactly two comparable strings, normalized equality;
      otherwise "does the text contain the prompt's quoted keyword".
    - ``summary`` keys: ``<n> items: `` + comma-joined sorted distinct
      normalized texts (capped at 5).
    - integer keys: count of whitespace tokens in the concatenated text.
    - anything else: sha1-derived deterministic token.

    Per-op custom rules can be injected via ``rules={key: fn(context)}``.
    """

    def __init__(self, rules: dict[str, Callable[[Any], Any]] | None = None, dim: int = 16):
        self.rules = rules or {}
        self.dim = dim

    # -- helpers -------------------------------------------------------
    @staticmethod
    def _context_text(context: Any) -> str:
        if isinstance(context, dict):
            return " ".join(str(v) for v in context.values() if isinstance(v, str))
        if isinstance(context, (list, tuple)):
            return " ".join(FakeBackend._context_text(c) for c in context)
        return str(context)

    @staticmethod
    def _quoted_keyword(prompt: str) -> str | None:
        m = re.search(r"['\"]([^'\"]+)['\"]", prompt or "")
        return m.group(1) if m else None

    # -- protocol ------------------------------------------------------
    def complete(self, prompt: str, output_schema: dict, context: Any) -> dict:
        out = {}
        for key, spec in output_schema.items():
            if key in self.rules:
                out[key] = self.rules[key](context)
                continue
            spec_l = str(spec).lower()
            text = self._context_text(context)
            low = text.lower()
            if "sentiment" in key:
                out[key] = next(
                    (lbl for words, lbl in ((_POSITIVE, "positive"), (_NEGATIVE, "negative"))
                     if any(w in low for w in words)),
                    "neutral",
                )
            elif spec_l in ("bool", "boolean"):
                if isinstance(context, (list, tuple)) and len(context) == 2:
                    out[key] = normalize_text(self._context_text(context[0])) == normalize_text(
                        self._context_text(context[1])
                    )
                else:
                    kw = self._quoted_keyword(prompt)
                    out[key] = bool(kw) and kw.lower() in low
            elif "summary" in key:
                items = sorted({normalize_text(t) for t in low.split(",") if t.strip()})[:5]
                out[key] = f"{len(items)} items: " + ", ".join(items)
            elif spec_l in ("int", "integer"):
                out[key] = len(text.split())
            elif spec_l in ("float", "number", "decimal"):
                out[key] = float(len(text.split()))
            elif spec_l.startswith("enum["):
                values = [v.strip() for v in str(spec)[5:-1].split(",")]
                idx = int(hashlib.sha1(text.encode()).hexdigest(), 16) % len(values)
                out[key] = values[idx]
            elif spec_l.startswith("list["):
                out[key] = sorted({w for w in normalize_text(text).split()})[:5]
            else:
                out[key] = "fake:" + hashlib.sha1(text.encode()).hexdigest()[:8]
        return out

    def embed(self, texts: list[str]) -> list[list[float]]:
        vecs = []
        for t in texts:
            seed = int(hashlib.md5((t or "").encode()).hexdigest()[:8], 16)
            rng = np.random.RandomState(seed)
            v = rng.standard_normal(self.dim)
            v /= np.linalg.norm(v) or 1.0
            vecs.append(v.astype(float).tolist())
        return vecs

    def classify_logprob(self, prompt: str, labels: list[str], context: Any):
        text = self._context_text(context)
        idx = int(hashlib.sha1(text.encode()).hexdigest(), 16) % len(labels)
        return labels[idx], 0.9


class LiteLLMBackend(ModelBackend):
    """Real-model backend (parity with the reference's litellm layer).

    Lazily constructs its client per executor; not exercised E2E in this
    container (no network), but the request construction matches
    api.py:588-734 / _call_llm_with_cache (api.py:760-900) and is locked
    by stubbed-litellm contract tests (tests/test_backend_contract.py):

    - ``output_mode="tools"`` (the reference default, OutputMode.TOOLS):
      one ``send_output`` function tool whose parameters are the declared
      output schema converted by the convert_val grammar
      (types.json_schema_of), ``tool_choice`` forced to that tool,
      ``strict``/``additionalProperties: false`` except for claude/gemini
      (api.py:786-838); the result is parsed from
      ``tool_calls[0].function.arguments``.
    - ``output_mode="structured_output"``: ``response_format`` =
      json_schema named ``structured_output`` with ``strict: True``
      (api.py:835-853); result parsed from ``message.content``.

    ``fallback_models`` mirrors the reference's litellm Router fallbacks
    (runner.py:39-88): when the primary model errors, the same request
    retries down the chain in order; only the last model's failure
    propagates. The raw completion callable is injectable
    (``completion_fn``) so the chain is unit-testable without network.
    """

    max_concurrency = 8  # HTTP-bound: overlap calls within a task

    def __init__(
        self,
        model: str = "gpt-4o-mini",
        *,
        fallback_models: list[str] | None = None,
        embedding_model: str = "text-embedding-3-small",
        output_mode: str = "tools",
        completion_fn=None,
        embedding_fn=None,
        **kwargs,
    ):
        if output_mode not in ("tools", "structured_output"):
            raise ValueError(
                f"Invalid output mode {output_mode!r}. Must be 'tools' or "
                "'structured_output'."
            )
        self.model = model
        self.fallback_models = list(fallback_models or [])
        self.embedding_model = embedding_model
        self.output_mode = output_mode
        self.kwargs = kwargs
        self._mod = None
        self._completion_fn = completion_fn
        self._embedding_fn = embedding_fn

    def with_options(self, *, model: str | None = None, timeout: float | None = None,
                     litellm_completion_kwargs: dict | None = None,
                     embedding_model: str | None = None, **_ignored) -> "LiteLLMBackend":
        """Reconfigured copy for one op (per-op model swap is how the
        change_model directives take effect at runtime; timeout and
        litellm kwargs ride into every completion call;
        ``embedding_model`` routes embed() — the resolve/equijoin
        per-stage override)."""
        if (model is None and timeout is None and not litellm_completion_kwargs
                and embedding_model is None):
            return self
        kw = {**self.kwargs, **(litellm_completion_kwargs or {})}
        if timeout is not None:
            kw["timeout"] = timeout
        return LiteLLMBackend(
            model or self.model,
            fallback_models=self.fallback_models,
            embedding_model=embedding_model or self.embedding_model,
            output_mode=self.output_mode,
            completion_fn=self._completion_fn,
            embedding_fn=self._embedding_fn,
            **kw,
        )

    def _client(self):
        if self._mod is None:
            try:
                import litellm  # noqa: PLC0415

                self._mod = litellm
            except ImportError as e:  # pragma: no cover
                raise RuntimeError(
                    "litellm is not installed; use FakeBackend for local runs"
                ) from e
        return self._mod

    def _completion(self, **kw):
        fn = self._completion_fn or self._client().completion
        return fn(**kw)

    def _complete_with_fallbacks(self, messages: list, props_for_model) -> Any:
        """Try the primary model, then each fallback in order (the
        reference's Router fallback chain, runner.py:39-88).

        The tools/response_format fragment is REBUILT per candidate
        model: schema quirks are model-FAMILY-specific (gemini rejects
        additionalProperties, claude rejects strict), so freezing the
        primary's fragment would make a cross-family fallback (gpt
        primary -> claude fallback) fail exactly when it is needed."""
        chain = [self.model] + self.fallback_models
        last_err: Exception | None = None
        for m in chain:
            try:
                return self._completion(
                    model=m,
                    messages=messages,
                    **self._mode_kwargs(props_for_model(m), model=m),
                    **self.kwargs,
                )
            except Exception as e:  # noqa: BLE001 — provider errors vary
                last_err = e
        raise last_err

    # -- request construction (api.py:760-900 parity) ------------------
    def _props(self, output_schema: dict, model: str | None = None) -> dict:
        from .types import json_schema_of  # noqa: PLC0415

        return {k: json_schema_of(v, model=model or self.model) for k, v in output_schema.items()}

    def _mode_kwargs(self, props: dict, model: str | None = None) -> dict:
        """tools / response_format request fragment for one object schema
        with the given properties (reference api.py:780-853), gated on
        the model ACTUALLY receiving the request (primary or fallback)."""
        model = model or self.model
        parameters = {"type": "object", "properties": props, "required": list(props)}
        if self.output_mode == "structured_output":
            return {
                "response_format": {
                    "type": "json_schema",
                    "json_schema": {
                        "name": "structured_output",
                        "schema": {**parameters, "additionalProperties": False},
                        "strict": True,
                    },
                }
            }
        # tools mode (the reference default): gemini rejects
        # additionalProperties; claude rejects strict (api.py:786-838)
        if "gemini" not in model and "claude" not in model:
            parameters["additionalProperties"] = False
        tool = {
            "type": "function",
            "function": {
                "name": "send_output",
                "description": "Send output back to the user",
                "parameters": parameters,
            },
        }
        if "claude" not in model:
            tool["additionalProperties"] = False
            tool["strict"] = True
        return {
            "tools": [tool],
            "tool_choice": {"type": "function", "function": {"name": "send_output"}},
        }

    def _parse(self, resp) -> dict:
        import json  # noqa: PLC0415

        msg = resp.choices[0].message
        if self.output_mode == "tools":
            calls = getattr(msg, "tool_calls", None) or []
            if calls:
                args = calls[0].function.arguments
                try:
                    return json.loads(args)
                except ValueError as e:
                    # malformed tool args: carry model/finish_reason so the
                    # executor-side failure is diagnosable (same treatment
                    # as the no-content refusal path below)
                    raise ValueError(
                        f"model returned unparseable tool_call arguments "
                        f"(model={getattr(resp, 'model', None)!r}, finish_reason="
                        f"{getattr(resp.choices[0], 'finish_reason', None)!r}): "
                        f"{str(args)[:200]}"
                    ) from e
            # models occasionally answer in content despite the forced
            # tool_choice — fall through to content parse
        if msg.content is None:
            # refusal / content-filter stop: surface a diagnosable error,
            # not a TypeError from json.loads(None) inside an executor
            raise ValueError(
                f"model returned no {'tool call or ' if self.output_mode == 'tools' else ''}"
                f"content (finish_reason="
                f"{getattr(resp.choices[0], 'finish_reason', None)!r})"
            )
        return json.loads(msg.content)

    def _call_object(self, messages: list, props_for_model):
        """``props_for_model``: dict of ready properties, or a callable
        (model -> properties) when the schema itself is model-dependent."""
        if not callable(props_for_model):
            fixed = props_for_model
            props_for_model = lambda _m: fixed  # noqa: E731
        return self._complete_with_fallbacks(messages, props_for_model)

    def complete_with_attachments(
        self, prompt: str, output_schema: dict, context: Any, attachments: list
    ) -> dict:
        content = [
            {"type": "image_url", "image_url": {"url": a["data_url"]}} for a in attachments
        ] + [{"type": "text", "text": prompt}]
        resp = self._call_object(
            [{"role": "user", "content": content}],
            lambda m: self._props(output_schema, model=m),
        )
        return self._parse(resp)

    def complete(self, prompt: str, output_schema: dict, context: Any) -> dict:
        resp = self._call_object(
            [{"role": "user", "content": prompt}],
            lambda m: self._props(output_schema, model=m),
        )
        return self._parse(resp)

    def complete_batch(self, prompt: str, output_schema: dict, items: list) -> list[dict]:
        def batch_props(m: str) -> dict:
            item_schema = {
                "type": "object",
                "properties": self._props(output_schema, model=m),
                "required": list(output_schema),
            }
            if "gemini" not in m:
                item_schema["additionalProperties"] = False
            return {"results": {"type": "array", "items": item_schema}}

        resp = self._call_object(
            [{"role": "user", "content": prompt}], batch_props
        )
        results = self._parse(resp).get("results", [])
        # pad/truncate to the item count so row alignment is preserved
        results = list(results)[: len(items)]
        results += [{} for _ in range(len(items) - len(results))]
        return results

    def embed(self, texts: list[str]) -> list[list[float]]:  # pragma: no cover
        fn = self._embedding_fn or self._client().embedding
        resp = fn(model=self.embedding_model, input=texts)
        return [d["embedding"] for d in resp.data]
