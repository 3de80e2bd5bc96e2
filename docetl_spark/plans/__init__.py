from .compiler import run_pipeline
from .directives import PlanStats, estimate_cost, estimate_quality, moar_search, optimize_ops
from .fast_decomposer import DecomposeResult, fast_decompose
from .ir import OpSpec, lift, lower
from .rewrite import rewrite
from .validate import PlanIssue, validate_config
from .yaml_front import run_yaml

__all__ = [
    "DecomposeResult", "OpSpec", "PlanStats", "estimate_cost",
    "estimate_quality", "fast_decompose", "lift",
    "lower", "moar_search", "optimize_ops", "rewrite", "run_pipeline", "run_yaml",
    "PlanIssue", "validate_config",
]
