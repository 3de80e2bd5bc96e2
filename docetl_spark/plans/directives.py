"""Directive-based plan optimizer: cost/accuracy rewrites over op lists.

The reference's offline optimizers (SURVEY.md §4.3) search a library of
config→config rewrite directives with a Pareto frontier over
(cost, accuracy): the MOAR reasoning optimizer
(/root/reference/docetl/moar/MOARSearch.py:30-235,
moar/ParetoFrontier.py; directive catalog
reasoning_optimizer/directives/README.md) and the legacy per-op agents
(optimizers/map_optimizer, reduce_optimizer, join_optimizer).

This module ports the *mechanism* — typed directives, deterministic
applicability checks, a cost model, Pareto search — without the LLM
agent in the loop by default: each directive instantiates from explicit
config/stats, and the one agentic directive (``swap_with_code``) only
fires when a backend is supplied and returns a confident structured
answer. Directives are NOT equivalence-preserving (they trade accuracy
for cost or vice versa, exactly like the reference's); correctness-
preserving reordering lives in rewrite.py.

Cost model: estimated model-call cost in arbitrary units —
calls × model weight × prompt-size factor, with row counts propagated
through cardinality (split multiplies rows by chunks/doc, filter halves,
reduce collapses to groups). The reference's selectivity estimation
(containers.py:38-48) is the analogue; ours uses declared stats.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace

from .ir import OpSpec

# relative per-1k-token call cost (litellm-style public price ratios)
MODEL_WEIGHTS = {
    "gpt-4o": 1.0,
    "gpt-4o-mini": 0.06,
    "gpt-4.1-nano": 0.02,
}
DEFAULT_MODEL = "gpt-4o-mini"
CHEAPER = {"gpt-4o": "gpt-4o-mini", "gpt-4o-mini": "gpt-4.1-nano"}
STRONGER = {v: k for k, v in CHEAPER.items()}


@dataclass(frozen=True)
class PlanStats:
    """Input statistics the search scores against (the reference samples
    these at build time; callers pass measured values)."""

    rows: int = 1_000
    avg_doc_tokens: int = 500
    groups: int | None = None  # distinct reduce keys; None -> rows/10
    chunk_tokens: int = 500  # split target size for doc_chunking
    proxy_cost_ratio: float = 0.1  # logprob call vs full completion
    cascade_escalation: float = 0.3  # fraction of rows below threshold
    filter_selectivity: float = 0.5
    long_doc_tokens: int = 2_000  # doc_chunking applicability bar


def _model_weight(op: OpSpec) -> float:
    return MODEL_WEIGHTS.get(op.config.get("model", DEFAULT_MODEL), MODEL_WEIGHTS[DEFAULT_MODEL])


def estimate_cost(ops: list[OpSpec], stats: PlanStats) -> float:
    """Propagate row counts through the chain; sum model-call cost."""
    rows = float(stats.rows)
    tokens = float(stats.avg_doc_tokens)
    cost = 0.0
    for op in ops:
        w = _model_weight(op)
        size = tokens / 1000.0
        if op.type in ("map", "parallel_map", "extract"):
            calls = rows
            if op.config.get("batch_prompt"):
                calls = math.ceil(rows / int(op.config.get("max_batch_size", 16)))
                size *= min(rows, int(op.config.get("max_batch_size", 16)))
            glean = op.config.get("gleaning")
            mult = 1 + 2 * int(glean.get("num_rounds", 1)) if glean else 1
            cost += calls * mult * w * size
        elif op.type == "filter":
            if op.config.get("cascade"):
                proxy = MODEL_WEIGHTS[DEFAULT_MODEL] * stats.proxy_cost_ratio
                cost += rows * proxy * size + rows * stats.cascade_escalation * w * size
            else:
                cost += rows * w * size
            rows *= stats.filter_selectivity
        elif op.type in ("reduce",):
            groups = float(stats.groups or max(1, stats.rows // 10))
            vs = op.config.get("value_sampling")
            per_group = rows / groups
            if vs:
                per_group = min(per_group, float(vs.get("size", per_group)))
            cost += groups * w * size * per_group
            rows = groups
        elif op.type == "code_map":
            pass  # no model calls
        elif op.type == "split":
            chunks = max(1.0, tokens / float(op.config.get("method_kwargs", {}).get("num_tokens", stats.chunk_tokens)))
            rows *= chunks
            tokens = tokens / chunks
    return cost


def estimate_quality(ops: list[OpSpec], stats: PlanStats) -> float:
    """Heuristic accuracy proxy in [0, 1]-ish space, mirroring the
    directive catalog's stated intents (gleaning/chunking/stronger model
    raise accuracy; cascades/sampling/code-swap trade a little away)."""
    q = 0.5
    for op in ops:
        if op.config.get("gleaning"):
            q += 0.05
        if op.config.get("cascade"):
            q -= 0.02
        if op.config.get("value_sampling"):
            q -= 0.05
        if op.type == "split":
            q += 0.1 if stats.avg_doc_tokens >= stats.long_doc_tokens else -0.05
        if op.type == "code_map" and op.config.get("_swapped_from_map"):
            q -= 0.1
        w = _model_weight(op)
        if op.is_llm and w >= MODEL_WEIGHTS["gpt-4o"]:
            q += 0.08
        elif op.is_llm and w <= MODEL_WEIGHTS["gpt-4.1-nano"]:
            q -= 0.08
    return q


# --------------------------------------------------------------- directives
@dataclass(frozen=True)
class Directive:
    """One rewrite: name + applicability + instantiation (README.md:35-40
    directive contract, minus the agent — instantiation is explicit)."""

    name: str
    applies: callable
    apply: callable


def _d_cascade_filtering(ops, i, stats, backend):
    new = replace(ops[i], config={**ops[i].config, "cascade": {"proxy_threshold": 0.9}})
    return ops[:i] + [new] + ops[i + 1 :]


def _d_gleaning(ops, i, stats, backend):
    glean = {"num_rounds": 1, "validation_prompt": "Is this output complete and faithful to the input?"}
    new = replace(ops[i], config={**ops[i].config, "gleaning": glean})
    return ops[:i] + [new] + ops[i + 1 :]


def _d_take_head_tail(ops, i, stats, backend):
    new = replace(ops[i], config={**ops[i].config, "value_sampling": {"method": "first", "size": 20}})
    return ops[:i] + [new] + ops[i + 1 :]


def _d_change_model(table):
    def inner(ops, i, stats, backend):
        cur = ops[i].config.get("model", DEFAULT_MODEL)
        new = replace(ops[i], config={**ops[i].config, "model": table[cur]})
        return ops[:i] + [new] + ops[i + 1 :]

    return inner


def _d_doc_chunking(ops, i, stats, backend):
    """MapOptimizer 'chunk' plan (optimizers/map_optimizer/plan_generators.py):
    map over long docs -> split(token windows) -> gather(context) ->
    map-per-chunk -> reduce(combine per doc)."""
    m = ops[i]
    doc_key = sorted(m.fields_read() or {"text"})[0]
    name = m.config.get("name", "map")
    out_schema = m.config.get("output", {}).get("schema") or m.config.get("output_schema") or {}
    split = OpSpec("split", {
        "name": f"{name}_split", "split_key": doc_key,
        "method": "token_count", "method_kwargs": {"num_tokens": stats.chunk_tokens},
    })
    gather = OpSpec("gather", {
        "content_key": f"{doc_key}_chunk",
        "doc_id_key": f"{name}_split_id", "order_key": f"{name}_split_chunk_num",
        "peripheral_chunks": {"previous": {"tail": {"count": 1}}},
    })
    chunk_map = replace(m, config={
        **m.config,
        "prompt": m.config.get("prompt", "").replace(
            f"input.{doc_key}", f"input.{doc_key}_chunk_rendered"),
    })
    combine = OpSpec("reduce", {
        "name": f"{name}_combine", "reduce_key": f"{name}_split_id",
        "prompt": "Combine the chunk-level outputs: {{ inputs }}",
        "output": {"schema": out_schema},
    })
    return ops[:i] + [split, gather, chunk_map, combine] + ops[i + 1 :]


def _d_swap_with_code(ops, i, stats, backend):
    m = ops[i]
    ans = backend.complete(
        "Write a pure-python transform(doc) replacing this prompt if it is "
        f"mechanically expressible, else decline: {m.config.get('prompt', '')}",
        {"python_code": "str", "confident": "bool"},
        dict(m.config),
    )
    if not ans.get("confident"):
        return None  # agent declined -> directive does not fire
    out_schema = m.config.get("output", {}).get("schema") or m.config.get("output_schema") or {}
    return ops[:i] + [OpSpec("code_map", {
        "name": m.config.get("name", "map"), "code": ans["python_code"],
        "output": {"schema": out_schema}, "_swapped_from_map": True,
    })] + ops[i + 1 :]


DIRECTIVES: list[Directive] = [
    Directive(
        "cascade_filtering",
        lambda ops, i, stats, be: ops[i].type == "filter" and not ops[i].config.get("cascade"),
        _d_cascade_filtering,
    ),
    Directive(
        "gleaning",
        lambda ops, i, stats, be: ops[i].type == "map" and not ops[i].config.get("gleaning"),
        _d_gleaning,
    ),
    Directive(
        "take_head_tail",
        lambda ops, i, stats, be: ops[i].type == "reduce" and not ops[i].config.get("value_sampling"),
        _d_take_head_tail,
    ),
    Directive(
        "change_model_cost",
        lambda ops, i, stats, be: ops[i].is_llm and ops[i].config.get("model", DEFAULT_MODEL) in CHEAPER,
        _d_change_model(CHEAPER),
    ),
    Directive(
        "change_model_acc",
        lambda ops, i, stats, be: ops[i].is_llm and ops[i].config.get("model", DEFAULT_MODEL) in STRONGER,
        _d_change_model(STRONGER),
    ),
    Directive(
        "doc_chunking",
        lambda ops, i, stats, be: (
            ops[i].type == "map"
            and stats.avg_doc_tokens >= stats.long_doc_tokens
            and not any(o.type == "split" for o in ops)
        ),
        _d_doc_chunking,
    ),
    Directive(
        "swap_with_code",
        lambda ops, i, stats, be: be is not None and ops[i].type == "map",
        _d_swap_with_code,
    ),
]


# ------------------------------------------------------------------ search
@dataclass
class Candidate:
    ops: list[OpSpec]
    cost: float
    quality: float
    applied: tuple = ()


@dataclass
class OptimizeResult:
    frontier: list[Candidate] = field(default_factory=list)
    explored: int = 0

    def best(self, objective: str = "cost") -> Candidate:
        if objective == "cost":
            return min(self.frontier, key=lambda c: (c.cost, -c.quality))
        return max(self.frontier, key=lambda c: (c.quality, -c.cost))


def _dominates(a: Candidate, b: Candidate) -> bool:
    return a.cost <= b.cost and a.quality >= b.quality and (a.cost < b.cost or a.quality > b.quality)


def pareto_insert(frontier: list[Candidate], cand: Candidate) -> bool:
    """Insert if non-dominated; drop newly dominated members. Returns
    whether the candidate joined (ParetoFrontier.py semantics)."""
    for f in frontier:
        if _dominates(f, cand) or (f.cost == cand.cost and f.quality == cand.quality):
            return False
    frontier[:] = [f for f in frontier if not _dominates(cand, f)] + [cand]
    return True


def optimize_ops(
    ops: list[OpSpec],
    stats: PlanStats | None = None,
    *,
    backend=None,
    max_depth: int = 3,
    beam: int = 8,
) -> OptimizeResult:
    """Beam search over directive applications, keeping the Pareto
    frontier of (cost, quality). Deterministic: directives enumerate in
    catalog order, positions left-to-right, candidates sorted by score."""
    stats = stats or PlanStats()
    root = Candidate(list(ops), estimate_cost(ops, stats), estimate_quality(ops, stats))
    result = OptimizeResult(frontier=[root], explored=1)
    level = [root]
    for _ in range(max_depth):
        nxt: list[Candidate] = []
        for cand in level:
            for d in DIRECTIVES:
                for i in range(len(cand.ops)):
                    if (d.name, i) in cand.applied or not d.applies(cand.ops, i, stats, backend):
                        continue
                    new_ops = d.apply(cand.ops, i, stats, backend)
                    if new_ops is None:
                        continue
                    c = Candidate(
                        new_ops,
                        estimate_cost(new_ops, stats),
                        estimate_quality(new_ops, stats),
                        cand.applied + ((d.name, i),),
                    )
                    result.explored += 1
                    if pareto_insert(result.frontier, c):
                        nxt.append(c)
        nxt.sort(key=lambda c: (c.cost, -c.quality))
        level = nxt[:beam]
        if not level:
            break
    return result
