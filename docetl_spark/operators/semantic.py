"""Semantic operators: map / parallel_map / filter / reduce driven by a
ModelBackend (LLM or deterministic fake).

Reference semantics:
- map          /root/reference/docetl/operations/map.py:35-714
  (prompt rendered per row with ``{{ input }}``; typed output merged over
  the row ``{**item, **output}`` map.py:513; ``drop_keys`` after merge)
- parallel_map /root/reference/docetl/operations/map.py:717-985
  (N independent prompts filling disjoint key sets, merged)
- filter       /root/reference/docetl/operations/filter.py:23-224
  (single-bool output schema; decision key popped from survivors)
- reduce       /root/reference/docetl/operations/reduce.py:44-1053
  (group by key(s) or ``_all``; prompt sees ``{{ inputs }}``;
  ``pass_through`` first-row fields; ``_counts_prereduce_<name>``)

Spark realization: Arrow-batched ``mapInPandas`` (row ops) and
``groupBy().applyInPandas`` (reduce). The backend call sits inside the
UDF, so per-executor batching/caching lives in the backend; model
latency parallelizes across partitions. Gleaning/validation retries and
fold/merge reduce strategies are backend-loop concerns layered on the
same UDF shape (fold/merge: TODO round 2 — one-shot per group today,
which matches the reference's default batch strategy reduce.py:987-1053).
"""

from __future__ import annotations

import jinja2
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..backend import ModelBackend
from ..types import schema_of

_ALL = "_all"
_env = jinja2.Environment(undefined=jinja2.StrictUndefined)


def render_prompt(template: str, context: dict) -> str:
    """strict_render analogue (validation.py:42-122): undefined vars raise."""
    return _env.from_string(template).render(**context)


def _merged_schema(df: DataFrame, output_schema: dict, drop: set[str]) -> T.StructType:
    declared = schema_of(output_schema)
    fields = [
        f for f in df.schema.fields if f.name not in declared.fieldNames() and f.name not in drop
    ]
    return T.StructType(fields + [f for f in declared.fields if f.name not in drop])


def semantic_map(
    df: DataFrame,
    prompt: str,
    output_schema: dict,
    backend: ModelBackend,
    *,
    drop_keys: list[str] | None = None,
    limit: int | None = None,
) -> DataFrame:
    if not output_schema and drop_keys:
        return df.drop(*drop_keys)  # drop-keys-only fast path (map.py:358-372)
    if limit is not None:
        df = df.limit(limit)
    drop = set(drop_keys or [])
    out_schema = _merged_schema(df, output_schema, drop)
    out_names = out_schema.fieldNames()

    def run(batches):
        for pdf in batches:
            rows = pdf.to_dict("records")
            out = []
            for row in rows:
                rendered = render_prompt(prompt, {"input": row})
                res = backend.complete(rendered, output_schema, row)
                merged = {**row, **res}
                out.append({k: merged.get(k) for k in out_names})
            yield pd.DataFrame(out, columns=out_names)

    return df.mapInPandas(run, schema=out_schema)


def semantic_parallel_map(
    df: DataFrame,
    prompts: list[dict],
    output_schema: dict,
    backend: ModelBackend,
    *,
    drop_keys: list[str] | None = None,
) -> DataFrame:
    """``prompts`` entries: {"prompt": str, "output_keys": [k, ...]} — each
    fills a disjoint slice of the declared schema (map.py:717-985)."""
    drop = set(drop_keys or [])
    out_schema = _merged_schema(df, output_schema, drop)
    out_names = out_schema.fieldNames()

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.to_dict("records"):
                merged = dict(row)
                for spec in prompts:
                    sub_schema = {k: output_schema[k] for k in spec["output_keys"]}
                    rendered = render_prompt(spec["prompt"], {"input": row})
                    merged.update(backend.complete(rendered, sub_schema, row))
                out.append({k: merged.get(k) for k in out_names})
            yield pd.DataFrame(out, columns=out_names)

    return df.mapInPandas(run, schema=out_schema)


def semantic_filter(
    df: DataFrame,
    prompt: str,
    output_schema: dict,
    backend: ModelBackend,
) -> DataFrame:
    keys = [k for k in output_schema]
    if len(keys) != 1 or str(output_schema[keys[0]]).lower() not in ("bool", "boolean"):
        raise ValueError("filter output schema must be exactly one boolean key (filter.py:53-71)")
    decision_key = keys[0]
    names = df.schema.fieldNames()

    def run(batches):
        for pdf in batches:
            keep = []
            for row in pdf.to_dict("records"):
                rendered = render_prompt(prompt, {"input": row})
                res = backend.complete(rendered, output_schema, row)
                keep.append(bool(res.get(decision_key)))
            yield pdf[pd.Series(keep, index=pdf.index)] if len(pdf) else pdf

    return df.mapInPandas(run, schema=df.schema).select(*names)


def semantic_reduce(
    df: DataFrame,
    reduce_key: str | list[str],
    prompt: str,
    output_schema: dict,
    backend: ModelBackend,
    *,
    name: str = "reduce",
    pass_through: bool = False,
    add_count: bool = True,
    sort_within_group: list | None = None,
) -> DataFrame:
    """One backend call per group over the full item list (the reference's
    batch strategy). ``sort_within_group`` pins item order inside the
    prompt (Spark group iteration order is nondeterministic otherwise —
    required for reproducible/oracle-checkable outputs)."""
    keys = [reduce_key] if isinstance(reduce_key, str) else list(reduce_key)
    global_agg = keys == [_ALL]
    count_col = f"_counts_prereduce_{name}"

    declared = schema_of(output_schema)
    fields: list[T.StructField] = []
    if not global_agg:
        fields += [f for f in df.schema.fields if f.name in keys]
    if pass_through:
        claimed = set(declared.fieldNames()) | set(keys) | {count_col}
        fields += [f for f in df.schema.fields if f.name not in claimed and f.name not in keys]
    fields += list(declared.fields)
    if add_count:
        fields.append(T.StructField(count_col, T.LongType(), True))
    out_schema = T.StructType(fields)
    out_names = out_schema.fieldNames()

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        if sort_within_group:
            pdf = pdf.sort_values(sort_within_group, kind="mergesort")
        items = pdf.to_dict("records")
        rendered = render_prompt(prompt, {"inputs": items, "reduce_key": {k: items[0][k] for k in keys if not global_agg}})
        res = backend.complete(rendered, output_schema, items)
        row: dict = {}
        if pass_through and items:
            row.update(items[0])
        if not global_agg:
            for k in keys:
                row[k] = items[0][k]
        row.update(res)
        if add_count:
            row[count_col] = len(items)
        return pd.DataFrame([{k: row.get(k) for k in out_names}], columns=out_names)

    grouped = df.groupBy(F.lit(1).alias("_g")) if global_agg else df.groupBy(*keys)
    return grouped.applyInPandas(agg, schema=out_schema)
