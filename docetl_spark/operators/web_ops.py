"""Web operators: web_search / web_fetch (external-I/O side effects).

Reference semantics:
- web_search  /root/reference/docetl/operations/web_search.py (SERP scrape
  -> list of {title, description, url} per row)
- web_fetch   /root/reference/docetl/operations/web_fetch.py (URL ->
  markdown string per row)

Spark realization: both are per-row external HTTP calls, executed inside
``mapInPandas`` so each executor runs its own rate-limited client; the
network stack (requests/playwright/markdownify) is NOT available in this
container, so the fetch function itself is pluggable: callers inject
``fetch_fn`` (tests inject a deterministic fake), and the default raises
``NotImplementedError`` with a clear message. The Spark-side plumbing —
schema, batching, rate limiting, per-partition client reuse — is real.
"""

from __future__ import annotations

import time
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

SEARCH_RESULT_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("title", T.StringType(), True),
            T.StructField("description", T.StringType(), True),
            T.StructField("url", T.StringType(), True),
        ]
    )
)


def _default_fetch(*_args, **_kwargs):
    raise NotImplementedError(
        "web operators need a network client; inject fetch_fn= (requests/"
        "playwright are not available in this environment)"
    )


def web_search(
    df: DataFrame,
    *,
    query_col: str,
    output_col: str = "search_results",
    max_results: int = 10,
    requests_per_second: float = 1.0,
    fetch_fn: Callable[[str, int], list[dict]] | None = None,
) -> DataFrame:
    """Adds ``output_col``: list of {title, description, url} per row.
    ``fetch_fn(query, max_results)`` runs once per row inside the
    executor, throttled to ``requests_per_second`` per partition."""
    fn = fetch_fn or _default_fetch
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField(output_col, SEARCH_RESULT_TYPE, True)])
    names = out_schema.fieldNames()
    min_interval = 1.0 / requests_per_second if requests_per_second else 0.0

    def run(batches):
        last = 0.0
        for pdf in batches:
            results = []
            for q in pdf[query_col]:
                wait = min_interval - (time.monotonic() - last)
                if wait > 0:
                    time.sleep(wait)
                last = time.monotonic()
                rows = fn(str(q), max_results) or []
                results.append(
                    [
                        {
                            "title": r.get("title"),
                            "description": r.get("description"),
                            "url": r.get("url"),
                        }
                        for r in rows[:max_results]
                    ]
                )
            pdf = pdf.copy()
            pdf[output_col] = results
            yield pdf[names]

    return df.mapInPandas(run, schema=out_schema)


def web_fetch(
    df: DataFrame,
    *,
    url_col: str,
    output_col: str = "content",
    requests_per_second: float = 1.0,
    fetch_fn: Callable[[str], str] | None = None,
    convert: str | None = "markdown",
) -> DataFrame:
    """Adds ``output_col``: fetched-page markdown per row (fetch.py's
    url -> markdown contract), same throttling model as web_search.

    ``convert="markdown"`` (default) runs fetched bodies that LOOK like
    HTML (leading ``<`` / doctype) through the stdlib markdown converter
    (functions/html.py — the reference's markitdown/markdownify step);
    non-HTML bodies (plain text, JSON, pre-converted markdown from an
    injected fetcher) pass through untouched — the HTML parser's
    whitespace collapse would destroy their line structure.
    ``convert=None`` keeps every raw body."""
    raw_fn = fetch_fn or _default_fetch
    if convert == "markdown":
        from ..functions.html import html_to_markdown

        def fn(u: str) -> str:
            body = raw_fn(u)
            head = (body or "").lstrip()[:200].lower()
            if head.startswith("<!doctype") or head.startswith("<"):
                return html_to_markdown(body)
            return body
    elif convert is None:
        fn = raw_fn
    else:
        raise ValueError(f"web_fetch convert must be 'markdown' or None, got {convert!r}")
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField(output_col, T.StringType(), True)])
    names = out_schema.fieldNames()
    min_interval = 1.0 / requests_per_second if requests_per_second else 0.0

    def run(batches):
        last = 0.0
        for pdf in batches:
            contents = []
            for u in pdf[url_col]:
                wait = min_interval - (time.monotonic() - last)
                if wait > 0:
                    time.sleep(wait)
                last = time.monotonic()
                contents.append(fn(str(u)))
            pdf = pdf.copy()
            pdf[output_col] = contents
            yield pdf[names]

    return df.mapInPandas(run, schema=out_schema)
