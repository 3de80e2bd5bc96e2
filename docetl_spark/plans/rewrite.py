"""Equivalence-preserving plan rewrites over the op-log.

Reference semantics: /root/reference/docetl/plan/rewrite.py:95-173
(selection_pushdown + limit_pushdown, fixpoint driver 207-225).

Catalyst already performs predicate/limit pushdown for *native*
expressions, but treats our semantic UDF stages as opaque barriers —
so these rules reorder the op list BEFORE DataFrame compilation, using
the trait/field metadata in ir.py, exactly mirroring the reference's
legality conditions:

- a filter may hop below an op iff the op is 1:1, row-local,
  order-preserving, and the op's written fields do not intersect the
  filter's read fields — and the hop is only *worth it* when the chain
  contains an LLM op (cost motive, rewrite.py:95-139);
- a positional head (sample method=first) may hop below 1:1 row-local
  order-preserving ops (rewrite.py:142-173).
"""

from __future__ import annotations

from .ir import ONE_TO_ONE, OpSpec

MAX_PASSES = 20


def _hoppable(op: OpSpec) -> bool:
    return op.cardinality == ONE_TO_ONE and op.is_row_local and op.preserves_order


def _filter_can_hop(filt: OpSpec, below: OpSpec) -> bool:
    if not _hoppable(below):
        return False
    reads = filt.fields_read()
    writes = below.fields_written()
    if reads is None or writes is None:
        return False  # fail closed
    return not (reads & writes)


def selection_pushdown(ops: list[OpSpec]) -> tuple[list[OpSpec], bool]:
    """One pass: move the first eligible filter one hop earlier."""
    for i in range(1, len(ops)):
        op = ops[i]
        if op.type not in ("filter", "code_filter"):
            continue
        j = i
        while j > 0 and _filter_can_hop(op, ops[j - 1]):
            j -= 1
        if j < i and any(ops[k].is_llm for k in range(j, i)):
            out = ops[:j] + [op] + ops[j:i] + ops[i + 1 :]
            return out, True
    return ops, False


def _is_positional_head(op: OpSpec) -> bool:
    return op.type == "sample" and op.config.get("method") == "first"


def _head_can_hop(head: OpSpec, below: OpSpec) -> bool:
    """A positional head with an order_by reads those columns — hopping
    below the op that WRITES them would take the head before the ordering
    key exists (e.g. map(writes score) -> sample(first, order_by=[score])).
    Fail closed when either side is unknown."""
    if not _hoppable(below):
        return False
    if not head.config.get("order_by"):
        return True  # pure positional head: no column dependency
    reads = head.fields_read()
    writes = below.fields_written()
    if reads is None or writes is None:
        return False
    return not (reads & writes)


def limit_pushdown(ops: list[OpSpec]) -> tuple[list[OpSpec], bool]:
    for i in range(1, len(ops)):
        op = ops[i]
        if not _is_positional_head(op):
            continue
        j = i
        while j > 0 and _head_can_hop(op, ops[j - 1]):
            j -= 1
        if j < i and any(ops[k].is_llm for k in range(j, i)):
            out = ops[:j] + [op] + ops[j:i] + ops[i + 1 :]
            return out, True
    return ops, False


RULES = [selection_pushdown, limit_pushdown]


def rewrite(ops: list[OpSpec]) -> tuple[list[OpSpec], list[str]]:
    """Run all rules to fixpoint (max 20 passes, rewrite.py:207-225).
    Returns (rewritten ops, names of rules that fired)."""
    fired: list[str] = []
    for _ in range(MAX_PASSES):
        changed = False
        for rule in RULES:
            ops, did = rule(ops)
            if did:
                fired.append(rule.__name__)
                changed = True
        if not changed:
            break
    return ops, fired
