"""SemanticFrame — the engine's primary user API.

Mirrors the reference's lazy pandas-like ``Frame``
(/root/reference/docetl/frame.py: chained builders -> runner), but here
each builder compiles immediately onto a real Spark DataFrame, so
Catalyst sees the whole declarative plan (predicate pushdown, column
pruning, join selection, AQE) while we keep an op-log for
semantic-layer rewrites and ``explain``.

Laziness falls out of Spark: nothing executes until an action
(collect/show/count/write).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .backend import ModelBackend
from .operators import (
    cluster as cluster_op,
    code_ops,
    equijoin as equijoin_op,
    extract as extract_op,
    gather as gather_op,
    link_resolve as link_resolve_op,
    rank as rank_op,
    resolve as resolve_op,
    sample as sample_op,
    semantic,
    shape,
    web_ops,
)
from .sources import readers


@dataclass(frozen=True)
class SemanticFrame:
    df: DataFrame
    backend: ModelBackend | None = None
    op_log: tuple = field(default_factory=tuple)

    # ------------------------------------------------------------ factory
    @classmethod
    def read_parquet(cls, spark: SparkSession, path: str, *, backend=None) -> "SemanticFrame":
        return cls(readers.read_parquet(spark, path), backend, (("scan", path),))

    @classmethod
    def read_json(cls, spark: SparkSession, path: str, *, backend=None, **kw) -> "SemanticFrame":
        return cls(readers.read_json(spark, path, **kw), backend, (("scan", path),))

    @classmethod
    def read_csv(cls, spark: SparkSession, path: str, *, backend=None, **kw) -> "SemanticFrame":
        return cls(readers.read_csv(spark, path, **kw), backend, (("scan", path),))

    @classmethod
    def read_dir(cls, spark: SparkSession, path: str, *, backend=None, **kw) -> "SemanticFrame":
        return cls(readers.read_dir(spark, path, **kw), backend, (("scan", path),))

    @classmethod
    def from_list(cls, spark: SparkSession, rows: list[dict], *, backend=None, **kw) -> "SemanticFrame":
        return cls(readers.from_list(spark, rows, **kw), backend, (("scan", "<memory>"),))

    @classmethod
    def from_df(cls, df: DataFrame, *, backend=None) -> "SemanticFrame":
        return cls(df, backend, (("scan", "<dataframe>"),))

    def _next(self, df: DataFrame, op: str, **conf) -> "SemanticFrame":
        return SemanticFrame(df, self.backend, self.op_log + ((op, conf),))

    def _require_backend(self, op: str) -> ModelBackend:
        if self.backend is None:
            raise ValueError(f"{op} is a semantic op and needs a ModelBackend (backend=...)")
        return self.backend

    # ------------------------------------------------------- native layer
    def select(self, *cols) -> "SemanticFrame":
        return self._next(self.df.select(*cols), "select")

    def with_columns(self, **exprs) -> "SemanticFrame":
        out = self.df
        for name, expr in exprs.items():
            out = out.withColumn(name, F.expr(expr) if isinstance(expr, str) else expr)
        return self._next(out, "with_columns", cols=list(exprs))

    def where(self, condition) -> "SemanticFrame":
        cond = F.expr(condition) if isinstance(condition, str) else condition
        return self._next(self.df.filter(cond), "where")

    def join(self, other: "SemanticFrame | DataFrame", on, how: str = "inner", *, broadcast: bool = False) -> "SemanticFrame":
        right = other.df if isinstance(other, SemanticFrame) else other
        right = F.broadcast(right) if broadcast else right
        return self._next(self.df.join(right, on, how), "join", how=how)

    def group_agg(self, keys: list[str], **aggs) -> "SemanticFrame":
        exprs = [(F.expr(a) if isinstance(a, str) else a).alias(name) for name, a in aggs.items()]
        return self._next(self.df.groupBy(*keys).agg(*exprs), "group_agg", keys=keys)

    def order_by(self, *cols) -> "SemanticFrame":
        return self._next(self.df.orderBy(*cols), "order_by")

    def limit(self, n: int) -> "SemanticFrame":
        return self._next(self.df.limit(n), "limit", n=n)

    def union(self, other: "SemanticFrame") -> "SemanticFrame":
        return self._next(self.df.unionByName(other.df), "union")

    def distinct(self) -> "SemanticFrame":
        return self._next(self.df.distinct(), "distinct")

    # --------------------------------------------------------- code ops
    def code_map(self, fn: Callable[[dict], dict], output_schema: dict, *, drop_keys=None) -> "SemanticFrame":
        return self._next(code_ops.code_map(self.df, fn, output_schema, drop_keys=drop_keys), "code_map")

    def code_filter(self, predicate, *, limit=None) -> "SemanticFrame":
        return self._next(code_ops.code_filter(self.df, predicate, limit=limit), "code_filter")

    def code_reduce(self, reduce_key, fn, output_schema: dict, **kw) -> "SemanticFrame":
        return self._next(code_ops.code_reduce(self.df, reduce_key, fn, output_schema, **kw), "code_reduce")

    # -------------------------------------------------------- shape ops
    def split(self, split_key: str, method: str, method_kwargs: dict, **kw) -> "SemanticFrame":
        return self._next(shape.split(self.df, split_key, method, method_kwargs, **kw), "split")

    def unnest(self, unnest_key: str, **kw) -> "SemanticFrame":
        return self._next(shape.unnest(self.df, unnest_key, **kw), "unnest")

    def unnest_columns(self, column: str) -> "SemanticFrame":
        return self._next(shape.unnest_columns(self.df, column), "unnest_columns")

    def add_uuid(self, id_key: str = "uuid_id", **kw) -> "SemanticFrame":
        return self._next(shape.add_uuid(self.df, id_key, **kw), "add_uuid")

    def gather(self, content_key: str, doc_id_key: str, order_key: str, **kw) -> "SemanticFrame":
        return self._next(gather_op.gather(self.df, content_key, doc_id_key, order_key, **kw), "gather")

    # ------------------------------------------------------- sample ops
    def sample(self, method: str, samples: Any = None, **kw) -> "SemanticFrame":
        fn = {
            "first": sample_op.sample_first,
            "uniform": sample_op.sample_uniform,
            "custom": sample_op.sample_custom,
            "outliers": sample_op.sample_outliers,
            "top_embedding": sample_op.sample_top_embedding,
            "top_fts": sample_op.sample_top_fts,
        }[method]
        args = (self.df, samples) if samples is not None else (self.df,)
        return self._next(fn(*args, **kw), f"sample:{method}")

    def topk(self, method: str, k: int, **kw) -> "SemanticFrame":
        if method == "embedding":
            return self._next(
                sample_op.sample_top_embedding(self.df, kw.pop("query_vector"), k, name=kw.pop("name", "topk"), **kw),
                "topk:embedding",
            )
        if method == "fts":
            return self._next(
                sample_op.sample_top_fts(self.df, kw.pop("query"), k, name=kw.pop("name", "topk"), **kw),
                "topk:fts",
            )
        if method == "llm_compare":
            # delegate to rank, take the head (topk.py:208-261); the rank
            # scoring method rides in as rank_method (default likert)
            be = self._require_backend("topk llm_compare")
            ranked = rank_op.rank(self.df, be, method=kw.pop("rank_method", "likert"), **kw)
            return self._next(ranked.filter(F.col(kw.get("rank_col", "_rank")) <= k), "topk:llm_compare")
        raise ValueError(f"unknown topk method {method!r}")

    # ----------------------------------------------------- semantic ops
    def map(self, prompt: str, output_schema: dict, **kw) -> "SemanticFrame":
        be = self._require_backend("map")
        return self._next(semantic.semantic_map(self.df, prompt, output_schema, be, **kw), "map")

    def parallel_map(self, prompts: list[dict], output_schema: dict, *, drop_keys=None) -> "SemanticFrame":
        be = self._require_backend("parallel_map")
        return self._next(
            semantic.semantic_parallel_map(self.df, prompts, output_schema, be, drop_keys=drop_keys),
            "parallel_map",
        )

    def filter(self, prompt: str, output_schema: dict, **kw) -> "SemanticFrame":
        be = self._require_backend("filter")
        return self._next(semantic.semantic_filter(self.df, prompt, output_schema, be, **kw), "filter")

    def reduce(self, reduce_key, prompt: str, output_schema: dict, **kw) -> "SemanticFrame":
        be = self._require_backend("reduce")
        return self._next(semantic.semantic_reduce(self.df, reduce_key, prompt, output_schema, be, **kw), "reduce")

    def resolve(self, *, id_col: str, comparison_prompt: str, output_schema: dict, **kw) -> "SemanticFrame":
        be = self._require_backend("resolve")
        return self._next(
            resolve_op.resolve(
                self.df, be, id_col=id_col, comparison_prompt=comparison_prompt,
                output_schema=output_schema, **kw,
            ),
            "resolve",
        )

    def equijoin(self, other: "SemanticFrame | DataFrame", *, comparison_prompt: str,
                 left_keys: list[str], right_keys: list[str], **kw) -> "SemanticFrame":
        be = self._require_backend("equijoin")
        right = other.df if isinstance(other, SemanticFrame) else other
        return self._next(
            equijoin_op.equijoin(
                self.df, right, be, comparison_prompt=comparison_prompt,
                left_keys=left_keys, right_keys=right_keys, **kw,
            ),
            "equijoin",
        )

    def rank(self, *, method: str = "embedding", **kw) -> "SemanticFrame":
        be = self._require_backend("rank")
        return self._next(rank_op.rank(self.df, be, method=method, **kw), "rank")

    def extract(self, prompt: str, document_keys: list[str], **kw) -> "SemanticFrame":
        be = self._require_backend("extract")
        return self._next(
            extract_op.extract(self.df, be, prompt=prompt, document_keys=document_keys, **kw), "extract"
        )

    def cluster(self, *, id_col: str, embedding_keys: list[str] | None = None, **kw) -> "SemanticFrame":
        be = self.backend if kw.get("embedding_col") else self._require_backend("cluster")
        return self._next(
            cluster_op.cluster(self.df, be, id_col=id_col, embedding_keys=embedding_keys, **kw), "cluster"
        )

    def link_resolve(self, *, id_key: str, link_key: str, **kw) -> "SemanticFrame":
        be = self._require_backend("link_resolve")
        return self._next(
            link_resolve_op.link_resolve(self.df, be, id_key=id_key, link_key=link_key, **kw),
            "link_resolve",
        )

    # --------------------------------------------------- external-IO ops
    def web_search(self, *, query_col: str, **kw) -> "SemanticFrame":
        return self._next(web_ops.web_search(self.df, query_col=query_col, **kw), "web_search")

    def web_fetch(self, *, url_col: str, **kw) -> "SemanticFrame":
        return self._next(web_ops.web_fetch(self.df, url_col=url_col, **kw), "web_fetch")

    # ---------------------------------------------------------- actions
    def schema(self):
        return self.df.schema

    def plan(self) -> list:
        return [op for op, *_ in self.op_log]

    def explain(self, mode: str = "formatted"):
        return self.df.explain(mode)

    def collect(self) -> list[dict]:
        return [r.asDict(recursive=True) for r in self.df.collect()]

    def show(self, n: int = 5, truncate: bool = True):
        return self.df.show(n, truncate=truncate)

    def count(self) -> int:
        return self.df.count()

    def to_pandas(self):
        return self.df.toPandas()

    def cache(self) -> "SemanticFrame":
        return self._next(self.df.cache(), "cache")

    def write_parquet(self, path: str, mode: str = "overwrite"):
        readers.write_output(self.df, path if path.endswith(".parquet") or "." not in path.rsplit("/", 1)[-1] else path, mode=mode)

    def write_json(self, path: str, mode: str = "overwrite"):
        self.df.write.mode(mode).json(path)

    def write_csv(self, path: str, mode: str = "overwrite"):
        self.df.write.mode(mode).option("header", "true").csv(path)
