"""`df.semantic.*` accessor on pyspark DataFrames.

Reference: the pandas SemanticAccessor (apis/pd_accessors.py:36+) lets
users run semantic ops directly on a DataFrame one op at a time. Here
``install()`` attaches a ``semantic`` property to
``pyspark.sql.DataFrame`` exposing the same verbs; each call returns a
plain DataFrame (eager wiring, lazy Spark execution) and the accessor
tracks op ``history`` per source frame like the reference's accessor
(pd_accessors.py:397-401).

Usage:
    from docetl_spark.accessors import install
    install(backend=FakeBackend())
    out = df.semantic.map("classify {{ input.text }}", {"label": "str"})
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .backend import FakeBackend, ModelBackend
from .frame import SemanticFrame

_default_backend: ModelBackend | None = None


class SemanticAccessor:
    def __init__(self, df: DataFrame, backend: ModelBackend | None = None):
        self._sf = SemanticFrame.from_df(df, backend=backend or _default_backend or FakeBackend())
        self.history: list[str] = []

    def _run(self, name: str, *args, **kw) -> DataFrame:
        out = getattr(self._sf, name)(*args, **kw)
        self.history.append(name)
        return out.df

    # the reference accessor's verb set (pd_accessors.py:42-117)
    def map(self, prompt, output_schema, **kw) -> DataFrame:
        return self._run("map", prompt, output_schema, **kw)

    def filter(self, prompt, output_schema, **kw) -> DataFrame:
        return self._run("filter", prompt, output_schema, **kw)

    def agg(self, reduce_key, prompt, output_schema, **kw) -> DataFrame:
        return self._run("reduce", reduce_key, prompt, output_schema, **kw)

    reduce = agg

    def merge(self, other, *, comparison_prompt, left_keys, right_keys, **kw) -> DataFrame:
        right = other if isinstance(other, DataFrame) else other.df
        return self._run(
            "equijoin", SemanticFrame.from_df(right),
            comparison_prompt=comparison_prompt, left_keys=left_keys, right_keys=right_keys, **kw,
        )

    def split(self, split_key, method, method_kwargs, **kw) -> DataFrame:
        return self._run("split", split_key, method, method_kwargs, **kw)

    def gather(self, content_key, doc_id_key, order_key, **kw) -> DataFrame:
        return self._run("gather", content_key, doc_id_key, order_key, **kw)

    def unnest(self, unnest_key, **kw) -> DataFrame:
        return self._run("unnest", unnest_key, **kw)

    def resolve(self, **kw) -> DataFrame:
        return self._run("resolve", **kw)

    def __getattr__(self, name: str):
        """Delegate every other SemanticFrame verb (rank, topk, cluster,
        dedup_exact, pack_sequences, sample_temperature, ...) so the
        accessor tracks the full engine surface, not just the reference
        accessor's verb set. Frame-returning calls unwrap to DataFrames
        and land in ``history`` like the explicit verbs."""
        if name.startswith("_"):
            raise AttributeError(name)
        target = getattr(self._sf, name)
        if not callable(target):
            raise AttributeError(name)

        def call(*args, **kw):
            out = target(*args, **kw)
            if isinstance(out, SemanticFrame):
                self.history.append(name)
                return out.df
            return out

        return call


def install(backend: ModelBackend | None = None) -> None:
    """Attach the ``semantic`` property to pyspark DataFrames; optional
    process-wide default backend for all accessor calls."""
    global _default_backend
    if backend is not None:
        _default_backend = backend
    if not hasattr(DataFrame, "semantic"):
        DataFrame.semantic = property(lambda self: SemanticAccessor(self))  # type: ignore[attr-defined]
