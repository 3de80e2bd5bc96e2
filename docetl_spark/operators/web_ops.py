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


# ---------------------------------------------------------- real providers
# The reference drives Playwright SERP scrapes (web_search.py:12 — brave/
# bing/google/duckduckgo) and converts fetched documents via markitdown/
# markdownify (web_fetch.py). Those clients aren't installable in this
# sandbox, so every provider below is gated behind an import probe and
# resolves to None when unavailable — the injectable ``fetch_fn`` seam
# (and its deterministic FakeFetcher test path) stays the primary
# interface, and the HTML->results parsing is a pure function unit tests
# cover without any network.

_SERP_URLS = {
    "duckduckgo": "https://html.duckduckgo.com/html/?q={q}",
    "bing": "https://www.bing.com/search?q={q}",
    "brave": "https://search.brave.com/search?q={q}",
    "google": "https://www.google.com/search?q={q}",
}


def _has_module(name: str) -> bool:
    import importlib.util

    try:
        return importlib.util.find_spec(name) is not None
    except (ImportError, ValueError):
        return False


def parse_serp_html(html: str, max_results: int = 10) -> list[dict]:
    """Best-effort SERP result extraction from an HTML results page
    (DuckDuckGo html-endpoint markup and similar: result links carry a
    ``result__a``-style class, snippets a ``result__snippet`` class;
    falls back to h2/h3-wrapped anchors). Pure function — the network
    client is injected around it, so tests feed canned pages."""
    from html.parser import HTMLParser

    class _P(HTMLParser):
        def __init__(self):
            super().__init__()
            self.results: list[dict] = []
            self._in_link = False
            self._in_snip = False
            self._href = None
            self._title: list[str] = []
            self._snip: list[str] = []
            self._heading_depth = 0
            self._anchor_in_heading = False

        def handle_starttag(self, tag, attrs):
            a = dict(attrs)
            cls = a.get("class", "") or ""
            if tag in ("h2", "h3"):
                self._heading_depth += 1
            if tag == "a" and ("result__a" in cls or self._heading_depth > 0):
                self._flush()
                self._in_link = True
                self._anchor_in_heading = self._heading_depth > 0
                self._href = a.get("href")
            elif "result__snippet" in cls:  # snippets are anchors on DDG
                self._in_snip = True

        def handle_endtag(self, tag):
            if tag in ("h2", "h3") and self._heading_depth:
                self._heading_depth -= 1
            if tag == "a" and self._in_link:
                self._in_link = False
            if self._in_snip and tag in ("a", "div", "span", "p", "td"):
                self._in_snip = False

        def handle_data(self, data):
            if self._in_link:
                self._title.append(data)
            elif self._in_snip:
                self._snip.append(data)

        def _flush(self):
            if self._href and self._title:
                self.results.append(
                    {
                        "title": "".join(self._title).strip(),
                        "description": "".join(self._snip).strip() or None,
                        "url": self._href,
                    }
                )
            self._title, self._snip, self._href = [], [], None

        def close(self):
            super().close()
            self._flush()

    p = _P()
    p.feed(html or "")
    p.close()
    return p.results[:max_results]


def make_requests_serp_fetcher(engine: str = "duckduckgo", timeout: float = 15.0):
    """``fetch_fn(query, max_results)`` over plain HTTP (requests) + the
    pure HTML parser. None when requests is unavailable."""
    if not _has_module("requests"):
        return None
    url_tpl = _SERP_URLS[engine]

    def fetch(query: str, max_results: int) -> list[dict]:
        import urllib.parse

        import requests  # noqa: PLC0415

        resp = requests.get(
            url_tpl.format(q=urllib.parse.quote_plus(query)),
            headers={"User-Agent": "Mozilla/5.0 (compatible; docetl-spark)"},
            timeout=timeout,
        )
        resp.raise_for_status()
        return parse_serp_html(resp.text, max_results)

    return fetch


def make_playwright_serp_fetcher(engine: str = "duckduckgo", timeout_ms: int = 20000):
    """``fetch_fn(query, max_results)`` via a Playwright-rendered SERP
    (the reference's client shape, web_search.py:12) — needed for
    engines that require JS rendering. One browser per executor process,
    launched lazily on first call. None when playwright is unavailable."""
    if not _has_module("playwright"):
        return None
    url_tpl = _SERP_URLS[engine]
    state: dict = {}

    def fetch(query: str, max_results: int) -> list[dict]:
        import urllib.parse

        if "page" not in state:
            from playwright.sync_api import sync_playwright  # noqa: PLC0415

            pw = sync_playwright().start()
            browser = pw.chromium.launch(headless=True)
            state["pw"], state["browser"] = pw, browser
            state["page"] = browser.new_page()
        page = state["page"]
        page.goto(url_tpl.format(q=urllib.parse.quote_plus(query)), timeout=timeout_ms)
        page.wait_for_load_state("domcontentloaded")
        return parse_serp_html(page.content(), max_results)

    return fetch


def resolve_serp_fetcher(provider: str = "auto", engine: str = "duckduckgo"):
    """Best available real SERP client, or None (callers fall back to
    the injectable seam / NotImplementedError)."""
    if provider == "requests":
        return make_requests_serp_fetcher(engine)
    if provider == "playwright":
        return make_playwright_serp_fetcher(engine)
    if provider == "auto":
        return make_playwright_serp_fetcher(engine) or make_requests_serp_fetcher(engine)
    raise ValueError(f"unknown web_search provider {provider!r}")


def make_http_fetcher(timeout: float = 30.0, use_markitdown: str = "auto"):
    """``fetch_fn(url) -> str`` over requests, with markitdown document
    conversion (pdf/docx/xlsx — the reference's web_fetch conversion
    step) when that package is importable; HTML bodies are left for
    web_fetch's own HTML->markdown converter. None without requests."""
    if not _has_module("requests"):
        return None
    md_ok = use_markitdown in ("auto", "force") and _has_module("markitdown")
    if use_markitdown == "force" and not md_ok:
        raise ImportError("markitdown requested but not importable")

    def fetch(url: str) -> str:
        import requests  # noqa: PLC0415

        resp = requests.get(
            url,
            headers={"User-Agent": "Mozilla/5.0 (compatible; docetl-spark)"},
            timeout=timeout,
        )
        resp.raise_for_status()
        ctype = (resp.headers.get("content-type") or "").lower()
        binary_doc = any(
            k in ctype for k in ("pdf", "officedocument", "msword", "ms-excel", "ms-powerpoint")
        )
        if binary_doc and md_ok:
            import io  # noqa: PLC0415

            from markitdown import MarkItDown  # noqa: PLC0415

            return MarkItDown().convert_stream(io.BytesIO(resp.content)).text_content
        return resp.text

    return fetch


def web_search(
    df: DataFrame,
    *,
    query_col: str,
    output_col: str = "search_results",
    max_results: int = 10,
    requests_per_second: float = 1.0,
    fetch_fn: Callable[[str, int], list[dict]] | None = None,
    provider: str = "auto",
    engine: str = "duckduckgo",
) -> DataFrame:
    """Adds ``output_col``: list of {title, description, url} per row.
    ``fetch_fn(query, max_results)`` runs once per row inside the
    executor, throttled to ``requests_per_second`` per partition. With
    no injected fetch_fn a real provider is resolved when its client
    library is importable (playwright-rendered SERP, else plain
    requests — see resolve_serp_fetcher); otherwise calls raise
    NotImplementedError at execution."""
    fn = fetch_fn or resolve_serp_fetcher(provider, engine) or _default_fetch
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
    ``convert=None`` keeps every raw body. With no injected fetch_fn a
    requests-backed client (plus markitdown pdf/docx conversion when
    importable) is resolved; otherwise calls raise NotImplementedError."""
    raw_fn = fetch_fn or make_http_fetcher() or _default_fetch
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
