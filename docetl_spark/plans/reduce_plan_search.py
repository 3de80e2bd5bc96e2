"""Reduce plan search: the ReduceOptimizer's sample-run-evaluate loop.

Reference parity: ``docetl/optimizers/reduce_optimizer.py:1273-1370``
(``_create_reduce_plans`` — fold prompts synthesized by an agent with a
retry loop, batch sizes derived from the model's context budget) and
its surrounding optimize() flow (run each candidate plan on sampled
groups, judge the outputs, keep the winner). The winner is an updated
reduce CONFIG — ``fold_prompt`` + ``fold_batch_size`` (the incremental
plan) — which this engine executes through ``semantic_reduce``'s
fold machinery; combine with the fold-associativity probe
(``distribute_folds="auto"``) to also distribute the promoted plan.

Everything data-touching is a bounded ``limit()`` sample; candidate
executions run through the real operator so the judged outputs are what
production would produce.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from .ir import OpSpec

DEFAULT_CONTEXT_LIMIT_TOKENS = 128_000
_DEFAULT_FOLD_PROMPT = (
    "Incorporate the new items into the current accumulated output, "
    "preserving everything already established.\n"
    "Current output: {{ output }}\nNew items: {{ inputs }}"
)


@dataclass
class ReducePlanResult:
    """Winning reduce configuration + evidence."""

    config: dict  # the (possibly updated) reduce op config
    winning_plan: str  # 'original' or 'fold_bs{N}_fp{i}'
    plans_evaluated: int
    outputs: list[dict] = field(default_factory=list)
    rationale: str = ""
    calls: int = 0


def synthesize_fold_prompts(
    op_config: dict,
    sample_rows: list[dict],
    sample_output: list[dict],
    backend,
    *,
    num_prompts: int = 2,
    max_retries: int = 2,
) -> list[str]:
    """Agent-written fold prompts (reference _synthesize_fold_prompts,
    called with the same retry-until-valid loop :1408-1434): each must
    template both ``{{ inputs }}`` (the new batch) and ``{{ output }}``
    (the accumulator). Invalid answers retry; a still-invalid answer
    falls back to the generic fold template rather than aborting."""
    prompts: list[str] = []
    for i in range(num_prompts):
        cand = None
        for _attempt in range(max_retries):
            ans = backend.complete(
                "Write a FOLD prompt for incrementally updating the output "
                "of this reduce operation with a new batch of items. The "
                "fold prompt MUST reference {{ inputs }} (the new items) "
                "and {{ output }} (the current accumulated output), and "
                "should preserve the original task's intent.\n\n"
                f"Original reduce prompt:\n{str(op_config.get('prompt', ''))[:3000]}\n\n"
                f"Sample input items:\n{json.dumps(sample_rows[:3], default=str)[:1500]}\n\n"
                f"Sample output:\n{json.dumps(sample_output[:1], default=str)[:1000]}\n\n"
                f"Variant {i + 1} of {num_prompts} — vary the emphasis.",
                {"fold_prompt": "str"},
                {"variant": i},
            )
            c = str(ans.get("fold_prompt", ""))
            if "{{ inputs }}" in c and "{{ output }}" in c:
                cand = c
                break
        prompts.append(cand or _DEFAULT_FOLD_PROMPT)
    # dedupe, preserve order (reference list(set()) loses it; order is
    # part of the deterministic tiebreak here)
    seen: set[str] = set()
    out = []
    for p in prompts:
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out


def candidate_batch_sizes(
    sample_rows: list[dict],
    op_config: dict,
    *,
    context_limit_tokens: int = DEFAULT_CONTEXT_LIMIT_TOKENS,
    ratios: tuple[float, ...] = (0.1, 0.4, 0.75),
) -> list[int]:
    """Batch sizes from the context budget (reference
    _create_reduce_plans :1389-1406: max_batch = (ctx - prompt - out)
    // avg_item, then a ratio ladder). Tokens estimated at 4 chars/token
    — the repo's deterministic stand-in for a tokenizer."""
    prompt_tokens = len(str(op_config.get("prompt", ""))) // 4
    if sample_rows:
        avg_item = max(
            1, sum(len(json.dumps(r, default=str)) for r in sample_rows)
            // (4 * len(sample_rows))
        )
    else:
        avg_item = 100
    max_batch = max(1, (context_limit_tokens - prompt_tokens) // avg_item)
    sizes = sorted({max(1, int(max_batch * r)) for r in ratios})
    return sizes


def reduce_plan_search(
    sf,
    ops: list[OpSpec],
    op_name: str,
    *,
    backend=None,
    sample_groups: int = 2,
    rows_per_group: int = 8,
    num_fold_prompts: int = 2,
    context_limit_tokens: int = DEFAULT_CONTEXT_LIMIT_TOKENS,
) -> ReducePlanResult:
    """Sample-run-evaluate over fold plans for ONE reduce op of ``ops``:
    the original one-shot batch plan vs (fold_prompt x batch_size)
    candidates, each executed on the SAME sampled groups through the
    real ``semantic_reduce``, judged pairwise champion-style with the
    fast-decomposer judge. Returns the winning config (original config
    when nothing beats it)."""
    from ..frame import SemanticFrame
    from ..resilience import BackendMetrics, ResilientBackend
    from .compiler import apply_op
    from .fast_decomposer import Candidate, _judge

    target = next(
        (o for o in ops if o.config.get("name") == op_name), None
    )
    if target is None:
        raise ValueError(f"Operation '{op_name}' not found in ops")
    if target.type != "reduce":
        raise ValueError(
            f"Operation '{op_name}' is type '{target.type}', but reduce plan "
            "search only supports 'reduce' operations"
        )
    backend = backend if backend is not None else sf.backend
    metrics = BackendMetrics(sf.df.sparkSession.sparkContext)
    counted = ResilientBackend(
        backend, namespace="reduce_plan_search", bypass_cache=True, metrics=metrics
    )

    rk = target.config.get("reduce_key")
    keys = [rk] if isinstance(rk, str) else list(rk or [])
    # bounded sample: head rows, keep the `sample_groups` largest groups
    head = [r.asDict(recursive=True) for r in sf.df.limit(rows_per_group * 16).collect()]
    groups: dict[tuple, list[dict]] = {}
    for r in head:
        groups.setdefault(tuple(str(r.get(k)) for k in keys), []).append(r)
    chosen = sorted(groups.values(), key=len, reverse=True)[:sample_groups]
    sample_rows = [r for g in chosen for r in g[:rows_per_group]]
    if not sample_rows:
        return ReducePlanResult(dict(target.config), "original", 0,
                                rationale="empty sample", calls=0)
    spark = sf.df.sparkSession
    sample_df = spark.createDataFrame(sample_rows)

    def run_plan(cfg: dict) -> list[dict]:
        trial = SemanticFrame.from_df(sample_df, backend=counted)
        spec = OpSpec("reduce", cfg)
        return [r.asDict(recursive=True) for r in apply_op(trial, spec, {}).df.collect()]

    original_outputs = run_plan(dict(target.config))
    fold_prompts = synthesize_fold_prompts(
        target.config, sample_rows, original_outputs, counted,
        num_prompts=num_fold_prompts,
    )
    sizes = candidate_batch_sizes(
        sample_rows, target.config, context_limit_tokens=context_limit_tokens
    )

    champion = Candidate("original", None)
    champion.outputs = original_outputs
    champion_cfg = dict(target.config)
    evaluated = 1
    rationale = "original plan retained"
    # the SAMPLED group size, not the raw head group size — eval_bs
    # derived from an uncapped group can exceed the sample and fold
    # everything in one batch, judging identical outputs
    max_group = max(min(len(g), rows_per_group) for g in chosen) if chosen else 0
    for fi, fp in enumerate(fold_prompts):
        for bs in sizes:
            # judge the FOLD STRUCTURE on the sample: a production batch
            # size larger than the sampled groups would degenerate to one
            # batch (= the original plan, nothing to compare), so the
            # sampled run rescales the batch while the emitted config
            # carries the true budget-derived size (reference evaluates
            # on a sample sized to its batch ladder; ours is bounded)
            eval_bs = min(int(bs), max(1, max_group // 2)) if max_group else int(bs)
            cfg = {**target.config, "fold_prompt": fp, "fold_batch_size": int(bs)}
            eval_cfg = {**cfg, "fold_batch_size": eval_bs}
            cand = Candidate(f"fold_bs{bs}_fp{fi}", None)
            try:
                cand.outputs = run_plan(eval_cfg)
            except Exception as e:
                cand.outputs = []
                cand.error = str(e)
                continue
            evaluated += 1
            winner, why = _judge(
                counted, champion, cand,
                str(target.config.get("prompt", "")),
                target.config.get("output", {}).get("schema")
                or target.config.get("output_schema") or {},
            )
            if winner == cand.name:
                champion, champion_cfg, rationale = cand, cfg, why

    return ReducePlanResult(
        champion_cfg, champion.name, evaluated,
        outputs=champion.outputs, rationale=rationale,
        calls=int(metrics.snapshot()["calls"]),
    )
