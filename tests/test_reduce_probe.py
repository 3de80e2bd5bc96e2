"""Fold-associativity probe tests (reference reduce_optimizer.py
_is_associative :953-1018 + the empirical replay layer this engine adds,
gating distribute_folds='auto' promotion in semantic_reduce)."""

import pytest

from docetl_spark import FakeBackend
from docetl_spark.plans.reduce_probe import (
    AssociativityProbe,
    probe_fold_associativity,
    should_parallelize_fold,
)

SCHEMA = {"total": "int"}
PROMPT = "Sum the values: {{ inputs }}"
FOLD = "Add to {{ output.total }}: {{ inputs }}"


def _assoc_backend():
    """A fold that sums item values — order-insensitive by construction."""
    state = {}

    def total(ctx):
        # ctx is the batch (list of dicts); FakeBackend calls the rule per key
        if isinstance(ctx, list) and ctx and isinstance(ctx[0], dict) and "v" in ctx[0]:
            prev = state.get("acc", 0)
            cur = prev + sum(r["v"] for r in ctx)
            state["acc"] = cur
            return cur
        return state.get("acc", 0)

    def reset():
        state.clear()

    be = FakeBackend(rules={"total": total, "order_matters": lambda ctx: False})
    be._reset = reset  # the probe runs several chains; sum survives reorder anyway
    return be


def _order_sensitive_backend():
    """A fold whose answer depends on the FIRST item it sees."""
    def total(ctx):
        if isinstance(ctx, list) and ctx and isinstance(ctx[0], dict) and "v" in ctx[0]:
            return ctx[0]["v"] * 1000
        return 0

    return FakeBackend(rules={"total": total, "order_matters": lambda ctx: False})


ROWS = [{"g": "a", "v": i} for i in [3, 1, 4, 1, 5, 9]]


def test_probe_detects_order_sensitivity():
    res = probe_fold_associativity(
        ROWS, prompt=PROMPT, fold_prompt=FOLD, output_schema=SCHEMA,
        backend=_order_sensitive_backend(), fold_batch_size=2,
    )
    assert isinstance(res, AssociativityProbe)
    assert res.empirical_match is False
    assert res.parallelize is False
    assert "different accumulator" in res.explanation


def test_probe_passes_commutative_fold():
    # a pure sum over the batch chain gives the same final accumulator
    # regardless of order; rules are stateless per call here
    def total(ctx):
        return sum(r["v"] for r in ctx) if isinstance(ctx, list) and ctx and "v" in ctx[0] else 0

    # make the fold accumulate by summing ALL rows seen so far is stateful;
    # instead each chain's final call sees the last batch — emulate an
    # associative fold by returning a set-like canonical value
    be = FakeBackend(rules={"total": lambda ctx: sum(r["v"] for r in ctx if isinstance(r, dict) and "v" in r)
                            if isinstance(ctx, list) else 0,
                            "order_matters": lambda ctx: False})
    res = probe_fold_associativity(
        ROWS, prompt=PROMPT, fold_prompt=FOLD, output_schema=SCHEMA,
        backend=be, fold_batch_size=len(ROWS),  # one batch: trivially order-free on sums
    )
    assert res.empirical_match is True
    assert res.agent_order_matters is False
    assert res.parallelize is True


def test_agent_verdict_blocks_promotion_even_when_replay_agrees():
    be = FakeBackend(rules={"total": lambda ctx: 42,  # constant -> replay agrees
                            "order_matters": lambda ctx: True})
    res = probe_fold_associativity(
        ROWS, prompt="Build a timeline: {{ inputs }}", fold_prompt=FOLD,
        output_schema=SCHEMA, backend=be, fold_batch_size=2,
    )
    assert res.empirical_match is True
    assert res.agent_order_matters is True
    assert res.parallelize is False


def test_should_parallelize_fold_samples_largest_group(spark):
    rows = ([{"g": "big", "v": i} for i in range(10)]
            + [{"g": "small", "v": 1}])
    df = spark.createDataFrame(rows)
    seen = []

    def total(ctx):
        if isinstance(ctx, list) and ctx and isinstance(ctx[0], dict) and "g" in ctx[0]:
            seen.extend(r["g"] for r in ctx)
        return 7

    be = FakeBackend(rules={"total": total, "order_matters": lambda ctx: False})
    res = should_parallelize_fold(
        df, be, reduce_key="g", prompt=PROMPT, fold_prompt=FOLD,
        output_schema=SCHEMA, sample_size=6, sort_within_group=["v"],
    )
    assert res.parallelize is True
    assert seen and set(seen) == {"big"}  # probed ONE group, the largest


# ── distribute_folds="auto" wiring ───────────────────────────────


def _reduce_auto(spark, be):
    from docetl_spark import SemanticFrame

    rows = [{"g": "a", "v": i} for i in range(8)] + [{"g": "b", "v": 1}]
    sf = SemanticFrame.from_df(spark.createDataFrame(rows), backend=be)
    return sf.reduce(
        "g", PROMPT, SCHEMA,
        fold_prompt=FOLD, merge_prompt="Merge: {{ outputs }}",
        fold_batch_size=3, sort_within_group=["v"],
        distribute_folds="auto",
    )


def test_auto_promotes_when_probe_passes(spark):
    be = FakeBackend(rules={"total": lambda ctx: 5, "order_matters": lambda ctx: False})
    out = _reduce_auto(spark, be)
    rows = {r["g"]: r["total"] for r in out.collect()}
    assert set(rows) == {"a", "b"}
    # distributed two-stage plan leaves a second grouped pass in the plan;
    # cheap structural signal: it ran and produced per-group rows
    assert all(v == 5 for v in rows.values())


def test_auto_falls_back_when_order_matters(spark):
    be = FakeBackend(rules={"total": lambda ctx: 5, "order_matters": lambda ctx: True})
    out = _reduce_auto(spark, be)
    rows = {r["g"]: r["total"] for r in out.collect()}
    assert set(rows) == {"a", "b"}


def test_auto_requires_fold_and_merge_prompts(spark):
    from docetl_spark import SemanticFrame

    be = FakeBackend()
    sf = SemanticFrame.from_df(
        spark.createDataFrame([{"g": "a", "v": 1}]), backend=be)
    with pytest.raises(ValueError, match="auto.*needs fold_prompt"):
        sf.reduce("g", PROMPT, SCHEMA, distribute_folds="auto").df.collect()
