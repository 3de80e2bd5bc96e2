from .compiler import run_pipeline
from .ir import OpSpec, lift, lower
from .rewrite import rewrite
from .yaml_front import run_yaml

__all__ = ["OpSpec", "lift", "lower", "rewrite", "run_pipeline", "run_yaml"]
