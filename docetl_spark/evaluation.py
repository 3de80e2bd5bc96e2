"""User-pluggable pipeline evaluation (reference utils_evaluation.py).

The reference lets a user drop a file containing one function decorated
with ``@docetl.register_eval`` taking (dataset_file_path,
results_file_path) and returning a metrics dict; the runner applies it
to every optimizer candidate's materialized output and marks the
cost-vs-metric Pareto frontier (utils_evaluation.py:14-210).

Spark-first re-expression: evaluation functions take **DataFrames**
(dataset, results) — metrics are computed with Spark aggregations, so an
eval over a 100 TB result never collects rows to the driver; loading
from a file path is a thin wrapper that reads parquet/json first. The
frontier marking reproduces the reference's dominance rule exactly
(lower-cost & >=-metric, or equal-cost & >-metric dominates).
"""

from __future__ import annotations

import importlib.util
import inspect
from pathlib import Path
from typing import Any, Callable


def register_eval(func: Callable) -> Callable:
    """Mark ``func`` as the module's evaluation function
    (reference utils_evaluation.py:14-31). The function signature is
    ``(dataset_df, results_df) -> dict[str, Any]``."""
    func._docetl_eval = True
    return func


def load_custom_evaluate_func(
    evaluation_file_path: str,
) -> Callable:
    """Load the single ``@register_eval``-decorated function from a
    Python file (reference utils_evaluation.py:34-92: zero or multiple
    decorated functions are errors)."""
    func_path = Path(evaluation_file_path)
    if not func_path.exists():
        raise ValueError(f"Evaluation file not found: {evaluation_file_path}")
    module_name = f"docetl_spark_eval_{func_path.stem}_{abs(hash(str(func_path)))}"
    spec = importlib.util.spec_from_file_location(module_name, func_path)
    if spec is None or spec.loader is None:
        raise ValueError(f"Could not load module from: {evaluation_file_path}")
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)

    found = [
        (name, obj)
        for name, obj in inspect.getmembers(module, inspect.isfunction)
        if getattr(obj, "_docetl_eval", False)
    ]
    if not found:
        raise ValueError(
            f"{evaluation_file_path} must contain one @register_eval function; "
            f"found none"
        )
    if len(found) > 1:
        raise ValueError(
            f"{evaluation_file_path} contains multiple @register_eval "
            f"functions: {[n for n, _ in found]}; only one is allowed"
        )
    return found[0][1]


def identify_pareto_frontier(
    eval_results: list[dict[str, Any]], metric_key: str
) -> list[dict[str, Any]]:
    """Mark each result dict with ``on_frontier`` using the reference's
    dominance rule (utils_evaluation.py:139-210): dominated iff another
    point has (lower cost AND >= metric) or (equal cost AND > metric).
    Results missing either key are left off the frontier untouched."""
    valid = [r for r in eval_results if metric_key in r and "cost" in r]
    for r in eval_results:
        r["on_frontier"] = False
    for cand in valid:
        dominated = any(
            other is not cand
            and (
                (other["cost"] < cand["cost"] and other[metric_key] >= cand[metric_key])
                or (other["cost"] == cand["cost"] and other[metric_key] > cand[metric_key])
            )
            for other in valid
        )
        if not dominated:
            cand["on_frontier"] = True
    return eval_results


def evaluate_candidates(
    candidates: list,
    materialize: Callable[[Any], "object"],
    eval_fn: Callable,
    dataset_df,
    *,
    metric_key: str,
) -> list[dict[str, Any]]:
    """Apply a custom eval to every optimizer candidate and mark the
    cost-vs-metric Pareto frontier (the reference runs this over MOAR
    node result files; here ``materialize(candidate)`` returns the
    candidate's result DataFrame — typically a memoized Frame run).

    Each output row: {node_id, cost, <metrics...>, on_frontier}.
    """
    out: list[dict[str, Any]] = []
    for idx, cand in enumerate(candidates):
        results_df = materialize(cand)
        metrics = eval_fn(dataset_df, results_df)
        row = {"node_id": getattr(cand, "applied", idx) or idx, "cost": getattr(cand, "cost", 0.0)}
        row.update(metrics)
        out.append(row)
    return identify_pareto_frontier(out, metric_key)
