"""YAML entry point: load a pipeline config file and run it.

Reference: ``docetl run pipeline.yaml`` (cli.py:168 ->
runner.py:118-133 DSLRunner.from_yaml). Our YAML schema matches the
config dict consumed by compiler.run_pipeline.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..backend import ModelBackend
from .compiler import run_pipeline


def run_yaml(
    spark: SparkSession,
    path: str,
    *,
    backend: ModelBackend | None = None,
    checkpointer=None,
):
    import yaml

    with open(path) as f:
        config = yaml.safe_load(f)
    return run_pipeline(spark, config, backend=backend, checkpointer=checkpointer)
