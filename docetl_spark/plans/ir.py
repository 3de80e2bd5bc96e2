"""Logical plan IR: typed op specs + optimizer-facing traits.

Reference semantics: /root/reference/docetl/plan/ir.py:28-209 (PlanNode
IR), /root/reference/docetl/operations/base.py:17-37,139-188 (cardinality
lattice + traits). Config dicts are lifted into ``OpSpec`` nodes whose
traits drive the pre-compilation rewrite rules in rewrite.py; the result
is lowered back to configs and compiled onto DataFrames (compiler.py) —
Catalyst then handles everything expressible natively.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


ONE_TO_ONE = "one_to_one"
SELECTION = "selection"
MANY_TO_ONE = "many_to_one"
ONE_TO_MANY = "one_to_many"
MANY_TO_MANY = "many_to_many"


# trait table per op type: (cardinality, is_llm, is_row_local, preserves_order)
# mirrors base.py:139-188 defaults; conservative where unknown.
_TRAITS: dict[str, tuple[str, bool, bool, bool]] = {
    "map": (ONE_TO_ONE, True, True, True),
    "parallel_map": (ONE_TO_ONE, True, True, True),
    "filter": (SELECTION, True, True, True),
    "code_map": (ONE_TO_ONE, False, True, True),
    "code_filter": (SELECTION, False, True, True),
    "code_reduce": (MANY_TO_ONE, False, False, False),
    "reduce": (MANY_TO_ONE, True, False, False),
    "resolve": (MANY_TO_MANY, True, False, False),
    "equijoin": (MANY_TO_MANY, True, False, False),
    "split": (ONE_TO_MANY, False, True, True),
    "gather": (ONE_TO_ONE, False, False, False),
    "unnest": (ONE_TO_MANY, False, True, True),
    "unnest_columns": (ONE_TO_ONE, False, True, True),
    "sample": (SELECTION, False, False, False),
    "topk": (SELECTION, False, False, False),
    "rank": (ONE_TO_ONE, True, False, False),
    "cluster": (ONE_TO_ONE, True, False, False),
    "extract": (ONE_TO_ONE, True, True, True),
    "link_resolve": (ONE_TO_ONE, True, False, True),
    "add_uuid": (ONE_TO_ONE, False, True, True),
    "web_search": (ONE_TO_ONE, False, True, True),
    "web_fetch": (ONE_TO_ONE, False, True, True),
    "scan": (ONE_TO_ONE, False, True, True),
}

# sample method=first preserves order and is a positional head (limit-like)
_JINJA_FIELD = re.compile(r"input1?\.([A-Za-z_][A-Za-z0-9_]*)|input2\.([A-Za-z_][A-Za-z0-9_]*)")


@dataclass
class OpSpec:
    """One lifted operation: ``type`` + raw ``config`` + derived traits."""

    type: str
    config: dict = field(default_factory=dict)

    # ------------------------------------------------------------ traits
    @property
    def cardinality(self) -> str:
        return _TRAITS.get(self.type, (MANY_TO_MANY,))[0]

    @property
    def is_llm(self) -> bool:
        return _TRAITS.get(self.type, (None, True))[1]

    @property
    def is_row_local(self) -> bool:
        return _TRAITS.get(self.type, (None, None, False))[2]

    @property
    def preserves_order(self) -> bool:
        return _TRAITS.get(self.type, (None, None, None, False))[3]

    # ------------------------------------------------- field read/write
    def fields_written(self) -> set[str] | None:
        """Declared output keys; None = unknown (fail closed)."""
        schema = self.config.get("output", {}).get("schema") or self.config.get("output_schema")
        written = set(schema) if schema else set()
        t = self.type
        if t in ("map", "parallel_map", "code_map"):
            return written if schema else None
        if t in ("filter", "code_filter", "sample", "topk"):
            return set()  # filter's decision key is popped from survivors
        if t == "split":
            name = self.config.get("name", "split")
            key = self.config.get("split_key", "")
            return {f"{key}_chunk", f"{name}_id", f"{name}_chunk_num"}
        if t == "add_uuid":
            return {self.config.get("id_key", "uuid_id")}
        if t == "gather":
            return {f"{self.config.get('content_key', '')}_rendered"}
        if t == "rank":
            return {self.config.get("rank_col", "_rank")}
        if t == "extract":
            suffix = self.config.get("suffix", "_extracted")
            return {f"{k}{suffix}" for k in self.config.get("document_keys", [])}
        if t == "unnest":
            return {self.config.get("unnest_key", "")}
        return None

    def fields_read(self) -> set[str] | None:
        """Fields the op's predicate/prompt reads; None = unknown."""
        t = self.type
        if t in ("map", "parallel_map", "filter", "reduce", "extract"):
            prompts = []
            if "prompt" in self.config:
                prompts.append(self.config["prompt"])
            for p in self.config.get("prompts", []):
                prompts.append(p.get("prompt", ""))
            reads = set()
            for p in prompts:
                for m in _JINJA_FIELD.finditer(p or ""):
                    reads.add(m.group(1) or m.group(2))
            return reads or None
        if t == "code_filter":
            pred = self.config.get("predicate")
            if isinstance(pred, str):
                # SQL expression: conservative token scan for identifiers
                return {w for w in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", pred)}
            return None  # python callable: fail closed (code_operations.py:14-146)
        if t == "sample":
            # positional, but order_by columns ARE read: a first-N over an
            # ordering must not hop below the op that writes the ordering
            # column (limit_pushdown checks this intersection).
            order_by = self.config.get("order_by") or []
            reads = set()
            for o in order_by:
                if isinstance(o, str):
                    reads.add(o.split()[0])
                elif isinstance(o, (list, tuple)) and o:
                    reads.add(str(o[0]))
                else:
                    return None  # unparseable ordering spec: fail closed
            return reads
        return None


def lift(op_configs: list[dict]) -> list[OpSpec]:
    """Config dicts -> OpSpec list (plan/lift.py analogue)."""
    return [OpSpec(c["type"], {k: v for k, v in c.items() if k != "type"}) for c in op_configs]


def lower(specs: list[OpSpec]) -> list[dict]:
    """OpSpec list -> config dicts (plan/lower.py analogue)."""
    return [{"type": s.type, **s.config} for s in specs]
