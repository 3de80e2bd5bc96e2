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


def azure_di_to_string(row: dict, *, client=None) -> list[dict]:
    """Azure Document Intelligence OCR parser (reference
    parsing_tools.py:275-340): ``prebuilt-read`` analysis of the file at
    ``row["path"]``, page text assembled line-by-line. The SDK client
    builds from ``DOCUMENTINTELLIGENCE_ENDPOINT`` /
    ``DOCUMENTINTELLIGENCE_API_KEY`` env vars behind an import probe (the
    web_ops provider pattern); inject ``client`` to test the assembly
    without network. One output row per document."""
    if client is None:
        import os  # noqa: PLC0415

        _require("azure.ai.documentintelligence", "azure_di_to_string")
        from azure.ai.documentintelligence import (  # noqa: PLC0415
            DocumentIntelligenceClient,
        )
        from azure.core.credentials import AzureKeyCredential  # noqa: PLC0415

        key = os.getenv("DOCUMENTINTELLIGENCE_API_KEY")
        endpoint = os.getenv("DOCUMENTINTELLIGENCE_ENDPOINT")
        if not key or not endpoint:
            raise ValueError(
                "azure_di_to_string needs DOCUMENTINTELLIGENCE_API_KEY and "
                "DOCUMENTINTELLIGENCE_ENDPOINT environment variables"
            )
        client = DocumentIntelligenceClient(
            endpoint=endpoint, credential=AzureKeyCredential(key)
        )
    with open(_local_path(row["path"]), "rb") as f:
        poller = client.begin_analyze_document("prebuilt-read", f)
    result = poller.result()
    pages = []
    for i, page in enumerate(getattr(result, "pages", None) or []):
        lines = [ln.content for ln in (getattr(page, "lines", None) or [])]
        pages.append(f"Page {i + 1}:\n" + "\n".join(lines))
    text = "\n\n".join(pages) if pages else (getattr(result, "content", "") or "")
    return [{"text": text}]


def whisper_speech_to_text(row: dict, *, transcribe_fn=None) -> list[dict]:
    """Speech-to-text via litellm's whisper-1 transcription (reference
    parsing_tools.py:53-96): files over 25 MB chunk into 10-minute
    segments with 30-second overlap (pydub) and yield one output row per
    chunk — the reference's list[str] return maps to the 1->N parser
    contract. ``transcribe_fn(file_obj) -> str`` is injectable so the
    chunking/merge plumbing tests without network."""
    import os  # noqa: PLC0415

    path = _local_path(row["path"])
    if transcribe_fn is None:
        litellm = _require("litellm", "whisper_speech_to_text")

        def transcribe_fn(f):  # noqa: PLR0206 — provider default
            return litellm.transcription(model="whisper-1", file=f).text

    if os.path.getsize(path) > 25 * 1024 * 1024:
        import io  # noqa: PLC0415

        pydub = _require("pydub", "whisper_speech_to_text (>25MB chunking)")
        audio = pydub.AudioSegment.from_file(path)
        chunk_ms, overlap_ms = 10 * 60 * 1000, 30 * 1000
        out = []
        for i, start in enumerate(range(0, len(audio), chunk_ms - overlap_ms)):
            buf = io.BytesIO()
            buf.name = f"chunk_{i}_{os.path.basename(path)}.mp3"
            audio[start : start + chunk_ms].export(buf, format="mp3")
            buf.seek(0)
            out.append({"chunk": i, "text": transcribe_fn(buf)})
        return out
    with open(path, "rb") as f:
        # chunk=0 on the single-file path too: one dataset mixing large
        # (chunked) and small audio files must yield ONE row schema, or
        # downstream schema inference/union breaks
        return [{"chunk": 0, "text": transcribe_fn(f)}]


def custom_parser(source: str, entry: str = "parse"):
    """Compile a user parser from source (dataset.py:442-453's exec'd
    parser contract): must define ``{entry}(row) -> list[dict]``."""
    ns: dict[str, Any] = {}
    exec(source, ns)  # noqa: S102 — trusted pipeline config, reference parity
    if entry not in ns:
        raise ValueError(f"custom parser source must define {entry}(row)")
    return ns[entry]
