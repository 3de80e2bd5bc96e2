"""Parsing tools: per-dataset row-expanding parsers (1 row -> N rows).

Reference: docetl/parsing_tools.py + dataset.py:402-476 — each parser
takes a row (usually carrying a file path or raw bytes) and returns a
list of dicts merged over the row (``item.copy() | res``). Heavy media
parsers (PyMuPDF, python-docx, openpyxl, whisper) are NOT in this
container, so each is gated behind an import-try: the Spark-side
contract (signature, 1->N merge, mapInPandas batching via
readers.apply_parser) is real; the library call raises a clear
ImportError-derived message when the dependency is absent.

Usage:
    df = readers.read_dir(spark, "docs/")          # path, content rows
    df = readers.apply_parser(df, parsers.txt_to_string, schema)
"""

from __future__ import annotations

from typing import Any


def _local_path(p: str) -> str:
    return p[len("file://"):] if p.startswith("file://") else p


def txt_to_string(row: dict) -> list[dict]:
    """Text passthrough parser (parsing_tools.txt_to_string): use the
    already-read ``text`` column (readers.read_dir), decode a binary
    ``content`` column (multimodal.read_binary_dir), else read the path."""
    if row.get("text") is not None:
        return [{"text": row["text"]}]
    if row.get("content") is not None:
        return [{"text": bytes(row["content"]).decode("utf-8", errors="replace")}]
    with open(_local_path(row["path"]), encoding="utf-8", errors="replace") as f:
        return [{"text": f.read()}]


def _require(module: str, feature: str):
    try:
        return __import__(module)
    except ImportError as e:
        raise RuntimeError(
            f"{feature} requires the '{module}' package, which is not installed "
            "in this environment; install it or supply a custom parser"
        ) from e


def pdf_to_string(row: dict) -> list[dict]:
    """PDF text extraction (parsing_tools via PyMuPDF)."""
    fitz = _require("fitz", "pdf_to_string")
    doc = fitz.open(row["path"])
    return [{"text": "\n".join(page.get_text() for page in doc)}]


def docx_to_string(row: dict) -> list[dict]:
    docx = _require("docx", "docx_to_string")
    d = docx.Document(row["path"])
    return [{"text": "\n".join(p.text for p in d.paragraphs)}]


def xlsx_to_string(row: dict) -> list[dict]:
    """One output row per sheet (the reference's per-sheet expansion)."""
    openpyxl = _require("openpyxl", "xlsx_to_string")
    wb = openpyxl.load_workbook(row["path"], read_only=True)
    out = []
    for name in wb.sheetnames:
        ws = wb[name]
        lines = [",".join("" if c is None else str(c) for c in r) for r in ws.iter_rows(values_only=True)]
        out.append({"sheet": name, "text": "\n".join(lines)})
    return out


def pptx_to_string(row: dict) -> list[dict]:
    """PowerPoint text extraction (parsing_tools.pptx_to_string).

    Implemented stdlib-only: a .pptx is a zip of DrawingML XML; text
    lives in ``<a:t>`` runs inside ``ppt/slides/slideN.xml``. With
    ``doc_per_slide`` truthy in the row, one output row per slide
    (mirroring the reference's per-slide option); else one row with
    slides separated by blank lines."""
    import re as _re
    import zipfile
    from xml.etree import ElementTree

    ns = {"a": "http://schemas.openxmlformats.org/drawingml/2006/main"}
    slides: list[str] = []
    with zipfile.ZipFile(_local_path(row["path"])) as z:
        names = [n for n in z.namelist()
                 if _re.fullmatch(r"ppt/slides/slide\d+\.xml", n)]
        names.sort(key=lambda n: int(_re.search(r"(\d+)\.xml$", n).group(1)))
        for n in names:
            root = ElementTree.fromstring(z.read(n))
            # one line per paragraph (<a:p>), runs concatenated
            lines = []
            for para in root.iter("{%s}p" % ns["a"]):
                runs = [t.text or "" for t in para.iter("{%s}t" % ns["a"])]
                if any(runs):
                    lines.append("".join(runs))
            slides.append("\n".join(lines))
    if row.get("doc_per_slide"):
        return [{"slide": i + 1, "text": s} for i, s in enumerate(slides)]
    return [{"text": "\n\n".join(slides)}]


def azure_di_to_string(row: dict) -> list[dict]:
    """Azure Document Intelligence parser (parsing_tools azure path).
    Requires the azure-ai-formrecognizer SDK + credentials; gated like
    the other heavy parsers."""
    _require("azure.ai.formrecognizer", "azure_di_to_string")
    raise RuntimeError(
        "azure document intelligence requires network credentials not "
        "available in this environment"
    )


def whisper_speech_to_text(row: dict) -> list[dict]:
    _require("whisper", "whisper_speech_to_text")
    raise RuntimeError("whisper transcription is not available in this environment")


def custom_parser(source: str, entry: str = "parse"):
    """Compile a user parser from source (dataset.py:442-453's exec'd
    parser contract): must define ``{entry}(row) -> list[dict]``."""
    ns: dict[str, Any] = {}
    exec(source, ns)  # noqa: S102 — trusted pipeline config, reference parity
    if entry not in ns:
        raise ValueError(f"custom parser source must define {entry}(row)")
    return ns[entry]
