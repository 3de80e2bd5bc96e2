"""Fast map-decomposition: directive candidates, sampled runs, pairwise
LLM judging (reference optimizers/fast_decomposer.py:55-926 analogue).

Instead of the full MOAR/beam optimizer flow, fast decomposition:

1. Instantiates a small, data-gated set of candidate rewrites of ONE
   target map op (reference fast_decomposer.py:183-238 — document
   compression when docs are long in characters, chunking when they
   crowd the model's context window, plus the four always-applicable
   map directives);
2. Runs every candidate's replacement ops on a small cached SAMPLE of
   the step input (reference :386-489 runs them through a throwaway
   DSLRunner; here each candidate executes through the normal Spark
   compiler on ``df.limit(sample_size)``, so the sampled run exercises
   the REAL operators — same code path as production, just tiny);
3. Judges each challenger against the original via a pairwise
   structured-output comparison (reference :492-599), with a
   round-robin tiebreaker when several challengers beat the original
   (reference :849-906);
4. Returns the winning replacement op list plus the evidence — both
   candidates' sample outputs and the judge's rationale.

Differences from the reference, by design: candidates and comparisons
run sequentially (each sampled run is already a parallel Spark job —
thread-stacking tiny local jobs only adds scheduler noise), and cost is
reported as measured backend CALLS (the repo's accumulator-backed cost
unit) rather than litellm dollars; a real deployment multiplies by its
model's price per call. The judge goes through the pluggable
``ModelBackend`` seam, so FakeBackend rules make selection
deterministic under test.

Scale note: the only Spark actions are the per-candidate sampled runs,
each over ``sample_size`` rows (default 5, reference :74) — decompose
cost is independent of corpus size, so this is safe to run against a
100 TB input; nothing here scans the full table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .directives import DIRECTIVES, PlanStats, agent_instantiate
from .ir import OpSpec

# reference fast_decomposer.py:36-51: the always-applicable map
# directives, in priority order, plus the two data-gated ones
_BASE_MAP_DIRECTIVES = (
    "chaining",
    "isolating_subtasks",
    "gleaning",
    "clarify_instructions",
)
_COMPRESSION = "deterministic_doc_compression"
_CHUNKING = "doc_chunking"

# reference fast_decomposer.py:46-51
DOC_COMPRESSION_CHAR_THRESHOLD = 1000
DOC_CHUNKING_CONTEXT_THRESHOLD = 0.10
DEFAULT_CONTEXT_LIMIT_TOKENS = 128_000  # reference :124 fallback


@dataclass
class Candidate:
    name: str
    ops: list[OpSpec] | None
    error: str | None = None
    outputs: list[dict] = field(default_factory=list)
    rationale: str = ""


@dataclass
class DecomposeResult:
    """Reference decompose() return dict (:672-683), as a dataclass."""

    decomposed_ops: list[OpSpec]
    winning_directive: str
    candidates_evaluated: int
    original_outputs: list[dict]
    decomposed_outputs: list[dict]
    comparison_rationale: str
    calls: int  # measured backend calls (reference reports $ cost)


def _directive_by_name(name: str):
    for d in DIRECTIVES:
        if d.name == name:
            return d
    raise KeyError(name)


def avg_doc_size(rows: list[dict], target: OpSpec) -> tuple[float, float]:
    """(avg_chars, avg_tokens) of the document content the target map
    reads (reference get_avg_doc_size :126-181): fields come from the
    prompt's ``{{ input.field }}`` references, falling back to long
    string values of the first row; tokens via the chars/4 heuristic
    (the reference calls tiktoken — unavailable here, and the 10%%
    context gate only needs the order of magnitude)."""
    if not rows:
        return 0.0, 0.0
    fields = sorted(target.fields_read() or set())
    if not fields:
        fields = [k for k, v in rows[0].items() if isinstance(v, str) and len(v) > 100]
    total_chars = 0
    for doc in rows:
        for f in fields:
            v = doc.get(f)
            if v is not None:
                total_chars += len(v if isinstance(v, str) else str(v))
    n = len(rows)
    return total_chars / n, total_chars / n / 4.0


def applicable_directive_names(
    rows: list[dict],
    target: OpSpec,
    *,
    context_limit_tokens: int = DEFAULT_CONTEXT_LIMIT_TOKENS,
) -> list[str]:
    """Data-gated directive list in reference priority order
    (get_applicable_directives :183-238): compression FIRST when docs
    exceed 1000 chars, then the four base map directives, then chunking
    when the average doc crowds 10% of the context window."""
    avg_chars, avg_tokens = avg_doc_size(rows, target)
    names: list[str] = []
    if avg_chars > DOC_COMPRESSION_CHAR_THRESHOLD:
        names.append(_COMPRESSION)
    names.extend(_BASE_MAP_DIRECTIVES)
    if avg_tokens > context_limit_tokens * DOC_CHUNKING_CONTEXT_THRESHOLD:
        names.append(_CHUNKING)
    return names


def extract_ops_to_run(
    original_ops: list[OpSpec], candidate_ops: list[OpSpec], op_name: str
) -> list[OpSpec]:
    """The ops that replaced the target op — new names plus the target
    itself (reference extract_ops_to_run :371-407); falls back to the
    target op alone when the directive changed nothing structural."""
    original_names = {o.config.get("name") for o in original_ops}
    new_ops = [
        o for o in candidate_ops
        if o.config.get("name") not in original_names or o.config.get("name") == op_name
    ]
    if new_ops:
        return new_ops
    return [o for o in original_ops if o.config.get("name") == op_name]


def _judge(backend, a: Candidate, b: Candidate, original_prompt: str, output_schema: dict) -> tuple[str, str]:
    """One pairwise comparison -> (winner_name, rationale). Mirrors the
    reference judge prompt (:521-556): completeness / accuracy /
    consistency / quality over each variant's first 3 sample outputs,
    strict structured output {winner: A|B, rationale}. Malformed or
    out-of-enum answers default to A (the incumbent) — never crash the
    decompose over one flaky judge call."""
    if not a.outputs:
        return b.name, "variant A produced no outputs"
    if not b.outputs:
        return a.name, "variant B produced no outputs"
    import json

    prompt = (
        "You are an expert judge comparing outputs from two data processing"
        " pipeline variants. Determine which produces BETTER outputs on"
        " completeness, accuracy, consistency, and quality.\n\n"
        f"## Original Task\nPrompt:\n{original_prompt[:2000]}\n\n"
        f"Expected output schema:\n{json.dumps(output_schema, sort_keys=True)}\n\n"
        f"## Variant A: {a.name}\nSample outputs:\n"
        f"{json.dumps(a.outputs[:3], default=str, sort_keys=True)}\n\n"
        f"## Variant B: {b.name}\nSample outputs:\n"
        f"{json.dumps(b.outputs[:3], default=str, sort_keys=True)}\n\n"
        "Which variant produces better outputs? Answer winner: A or B."
    )
    ans = backend.complete(
        prompt,
        {"winner": "enum[A,B]", "rationale": "str"},
        {"variant_a": a.name, "variant_b": b.name},
    )
    winner = a.name if str(ans.get("winner", "A")).strip().upper() != "B" else b.name
    return winner, str(ans.get("rationale", ""))


def fast_decompose(
    sf,
    ops: list[OpSpec],
    op_name: str,
    *,
    backend=None,
    datasets: dict | None = None,
    sample_size: int = 5,
    stats: PlanStats | None = None,
    agent_instantiation: bool = False,
    context_limit_tokens: int = DEFAULT_CONTEXT_LIMIT_TOKENS,
) -> DecomposeResult:
    """Decompose one map op of ``ops`` against a sample of ``sf``.

    ``sf`` is the step-input SemanticFrame; ``backend`` (defaults to the
    frame's) drives the sampled runs, the judge, and — with
    ``agent_instantiation=True`` — per-candidate config specialization
    through :func:`agent_instantiate`. Raises ValueError when the target
    is missing or is not a map, like the reference (:636-647).
    """
    from ..frame import SemanticFrame
    from ..resilience import BackendMetrics, ResilientBackend

    stats = stats or PlanStats()
    datasets = datasets or {}
    backend = backend if backend is not None else sf.backend

    target_idx = next(
        (i for i, o in enumerate(ops) if o.config.get("name") == op_name), None
    )
    if target_idx is None:
        raise ValueError(f"Operation '{op_name}' not found in ops")
    target = ops[target_idx]
    if target.type != "map":
        raise ValueError(
            f"Operation '{op_name}' is type '{target.type}', but fast"
            " decomposition only supports 'map' operations"
        )

    sc = sf.df.sparkSession.sparkContext
    metrics = BackendMetrics(sc)
    counted = (
        ResilientBackend(backend, namespace="fast_decompose", bypass_cache=True, metrics=metrics)
        if backend is not None
        else None
    )

    # Candidates execute only the REPLACEMENT ops, so the sample they
    # run on must be the TARGET's input, not the step's: when the target
    # sits after upstream ops that create the fields it reads, a raw
    # step-input sample would make every candidate (including the
    # original) fail or judge on the wrong schema. Run the step's
    # preceding ops over the sample first — the reference's throwaway
    # runner feeds its candidates the same way. Sampling BEFORE the
    # prefix keeps any semantic prefix ops to sample_size backend calls.
    from .compiler import apply_op

    staged = SemanticFrame.from_df(sf.df.limit(sample_size), backend=counted)
    for spec in ops[:target_idx]:
        staged = apply_op(staged, spec, datasets)
    sample_df = staged.df.cache()
    sample_rows = [r.asDict(recursive=True) for r in sample_df.collect()]

    # ------------------------------------------------ candidate generation
    candidates: list[Candidate] = [Candidate("original", list(ops))]
    for dname in applicable_directive_names(
        sample_rows, target, context_limit_tokens=context_limit_tokens
    ):
        d = _directive_by_name(dname)
        try:
            if not d.applies(ops, target_idx, stats, backend):
                candidates.append(Candidate(dname, None, error="not applicable"))
                continue
            new_ops = (
                agent_instantiate(d, ops, target_idx, stats, counted)
                if (agent_instantiation and counted is not None)
                else d.apply(ops, target_idx, stats, counted)
            )
            candidates.append(Candidate(dname, new_ops))
        except Exception as e:  # directive failed — skip it (reference :356-368)
            candidates.append(Candidate(dname, None, error=str(e)))

    valid = [c for c in candidates if c.ops is not None]
    if len(valid) < 2:
        sample_df.unpersist()
        return DecomposeResult(
            ops, "original", len(valid), [], [],
            "No alternative decompositions were generated.",
            int(metrics.snapshot()["calls"]),
        )

    # ------------------------------------------------- sampled execution
    for cand in valid:
        to_run = extract_ops_to_run(ops, cand.ops, op_name)
        trial = SemanticFrame.from_df(sample_df, backend=counted)
        try:
            for spec in to_run:
                trial = apply_op(trial, spec, datasets)
            cand.outputs = [r.asDict(recursive=True) for r in trial.df.collect()]
        except Exception as e:
            cand.outputs = []
            cand.error = str(e)

    with_outputs = [c for c in valid if c.outputs]
    sample_df.unpersist()
    if not with_outputs:
        return DecomposeResult(
            ops, "original", 0, [], [],
            "All decomposition candidates failed to execute.",
            int(metrics.snapshot()["calls"]),
        )

    # --------------------------------------------------------- judging
    original = next((c for c in with_outputs if c.name == "original"), None)
    original_prompt = target.config.get("prompt", "")
    output_schema = (
        target.config.get("output", {}).get("schema")
        or target.config.get("output_schema")
        or {}
    )
    judge_be = counted if counted is not None else backend
    if len(with_outputs) == 1 or backend is None:
        winner = with_outputs[0]
    elif original is None:
        # the original failed its sampled run but several challengers
        # survived: round-robin among them (skipping the judging
        # entirely would crown catalog position, not quality)
        wins = {c.name: 0 for c in with_outputs}
        for i, a in enumerate(with_outputs):
            for b in with_outputs[i + 1:]:
                try:
                    won_name, _ = _judge(judge_be, a, b, original_prompt, output_schema)
                except Exception:
                    won_name = a.name
                wins[won_name] += 1
        best = max(wins.values())
        winner = next(c for c in with_outputs if wins[c.name] == best)
    else:
        challengers = [c for c in with_outputs if c.name != "original"]
        beat_original: list[Candidate] = []
        for ch in challengers:
            try:
                won_name, rationale = _judge(judge_be, original, ch, original_prompt, output_schema)
            except Exception:
                won_name, rationale = original.name, "judge call failed"
            if won_name == ch.name:
                ch.rationale = rationale
                beat_original.append(ch)
        if not beat_original:
            winner = original
        elif len(beat_original) == 1:
            winner = beat_original[0]
        else:
            # round-robin tiebreaker among everything that beat the
            # original (reference :849-906); ties resolve to candidate
            # order, which is the deterministic catalog priority order
            wins = {c.name: 0 for c in beat_original}
            for i, a in enumerate(beat_original):
                for b in beat_original[i + 1:]:
                    try:
                        won_name, _ = _judge(judge_be, a, b, original_prompt, output_schema)
                    except Exception:
                        won_name = a.name
                    wins[won_name] += 1
            best = max(wins.values())
            winner = next(c for c in beat_original if wins[c.name] == best)

    decomposed = extract_ops_to_run(ops, winner.ops, op_name)
    return DecomposeResult(
        decomposed_ops=decomposed,
        winning_directive=winner.name,
        candidates_evaluated=len(with_outputs),
        original_outputs=original.outputs if original else [],
        decomposed_outputs=winner.outputs,
        comparison_rationale=winner.rationale,
        calls=int(metrics.snapshot()["calls"]),
    )
