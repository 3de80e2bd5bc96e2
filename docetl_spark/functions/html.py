"""HTML -> markdown conversion for web_fetch, stdlib-only.

Reference semantics: docetl's web_fetch converts fetched pages to
markdown via markitdown/markdownify (web_fetch tool). Neither library is
installed here, so this is a small html.parser-based converter covering
the constructs that matter for LLM document pipelines: headings,
paragraphs, line breaks, emphasis, links, images, lists, code spans /
fenced blocks, blockquotes and tables; script/style/head content is
dropped. It is not a full CommonMark serializer — it is the same
"readable text with markdown affordances" contract the reference's
converters provide.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_BLOCK_END = {"p", "div", "section", "article", "header", "footer",
              "table", "tr", "ul", "ol", "blockquote", "pre"}
_SKIP = {"script", "style", "head", "noscript", "template"}
_HEADINGS = {f"h{i}": i for i in range(1, 7)}


class _MarkdownHTMLParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.out: list[str] = []
        self.skip_depth = 0
        self.pre_depth = 0
        self.list_stack: list[str] = []  # "ul" | "ol"
        self.ol_counters: list[int] = []
        self.href: str | None = None
        self.link_text: list[str] = []
        self.in_cell = False

    # -- emit helpers --------------------------------------------------
    def _emit(self, s: str) -> None:
        if self.href is not None:
            self.link_text.append(s)
        else:
            self.out.append(s)

    def _newline(self, n: int = 1) -> None:
        self._emit("\n" * n)

    # -- tag handling --------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self.skip_depth += 1
            return
        if self.skip_depth:
            return
        a = dict(attrs)
        if tag in _HEADINGS:
            self._newline(2)
            self._emit("#" * _HEADINGS[tag] + " ")
        elif tag == "p":
            self._newline(2)
        elif tag == "br":
            self._newline()
        elif tag == "hr":
            self._newline(2)
            self._emit("---")
            self._newline(2)
        elif tag in ("strong", "b"):
            self._emit("**")
        elif tag in ("em", "i"):
            self._emit("*")
        elif tag == "code" and not self.pre_depth:
            self._emit("`")
        elif tag == "pre":
            self._newline(2)
            self._emit("```")
            self._newline()
            self.pre_depth += 1
        elif tag == "a":
            self.href = a.get("href") or ""
            self.link_text = []
        elif tag == "img":
            alt = a.get("alt") or ""
            src = a.get("src") or ""
            self._emit(f"![{alt}]({src})")
        elif tag in ("ul", "ol"):
            self.list_stack.append(tag)
            if tag == "ol":
                self.ol_counters.append(0)
            self._newline()
        elif tag == "li":
            self._newline()
            indent = "  " * (len(self.list_stack) - 1)
            if self.list_stack and self.list_stack[-1] == "ol":
                self.ol_counters[-1] += 1
                self._emit(f"{indent}{self.ol_counters[-1]}. ")
            else:
                self._emit(f"{indent}- ")
        elif tag == "blockquote":
            self._newline(2)
            self._emit("> ")
        elif tag in ("td", "th"):
            self._emit("| " if not self.in_cell else " | ")
            self.in_cell = True
        elif tag == "tr":
            self._newline()
            self.in_cell = False

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if self.skip_depth:
            return
        if tag in ("strong", "b"):
            self._emit("**")
        elif tag in ("em", "i"):
            self._emit("*")
        elif tag == "code" and not self.pre_depth:
            self._emit("`")
        elif tag == "pre":
            self.pre_depth = max(0, self.pre_depth - 1)
            self._newline()
            self._emit("```")
            self._newline(2)
        elif tag == "a":
            text = "".join(self.link_text).strip()
            href = self.href
            self.href = None
            self.out.append(f"[{text}]({href})" if href else text)
        elif tag in ("ul", "ol"):
            if self.list_stack and self.list_stack.pop() == "ol" and self.ol_counters:
                self.ol_counters.pop()
            self._newline()
        elif tag == "tr":
            if self.in_cell:
                self._emit(" |")
            self.in_cell = False
        elif tag in _BLOCK_END:
            self._newline()

    def handle_data(self, data):
        if self.skip_depth:
            return
        if self.pre_depth:
            self._emit(data)
        else:
            # collapse intra-text whitespace; block structure supplies it
            text = re.sub(r"\s+", " ", data)
            if text.strip():
                self._emit(text)


def html_to_markdown(html: str) -> str:
    """Convert an HTML document/fragment to readable markdown."""
    p = _MarkdownHTMLParser()
    try:
        p.feed(html or "")
        p.close()
    except Exception:  # noqa: BLE001 — malformed markup: best-effort text
        pass
    out = "".join(p.out)
    out = re.sub(r"[ \t]+\n", "\n", out)        # trailing spaces
    out = re.sub(r"\n{3,}", "\n\n", out)        # collapse blank runs
    return out.strip()
