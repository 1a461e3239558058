"""Format-sniffing text extraction — the front door for a MIXED dump.

A real crawl/document dump is never one format: PDFs next to DOCX next
to notebooks next to plain text. This module sniffs each blob by MAGIC
BYTES (extension is a hint, content decides) and routes it to the right
pure-bytes extractor from the sibling sources — so a user can point the
engine at a directory and get one unified (path, kind, text) frame.

Kinds and routing:

- ``pdf``   — ``%PDF`` magic → :func:`sources.pdf.extract_pdf_pages`
  (pages join with form feeds, the classic multi-page text convention)
- ``docx``  — ZIP magic + a ``word/document.xml`` part →
  :func:`sources.docx.extract_docx_text`
- ``ipynb`` — JSON object with a ``cells`` list →
  :func:`sources.ipynb.to_script` (code verbatim, markdown commented)
- ``warc``  — ``WARC/`` magic (plain or gzip) → response payloads,
  joined with form feeds; HTML payloads stay raw here (chain
  ``textprep.html_extract`` Spark-side on the tagged rows)
- ``html``  — a leading ``<`` with an html/doctype tag → text passes
  through RAW with the tag (extraction is the Spark-side codegen chain)
- ``text``  — decodes as UTF-8 → passes through
- ``binary``— everything else → NULL text (images/media route to the
  ``multimodal`` family instead)

The dispatcher is a pure function over bytes (unit-testable without
Spark) inside one Arrow ``mapInPandas`` stage; nothing shuffles.
"""

from __future__ import annotations

import gzip
import io
import zipfile

from pyspark.sql import DataFrame, SparkSession

AUTOEXTRACT_DDL = "kind string, text string, _kpf_source string"

PAGE_SEP = "\x0c"  # form feed between PDF pages / WARC records


def sniff_format(content: bytes) -> str:
    """Magic-byte format sniff (content decides; extensions lie in a
    crawl). Returns one of pdf/docx/zip/ipynb/warc/gzip/html/text/binary."""
    head = bytes(content[:512])
    if head.startswith(b"%PDF"):
        return "pdf"
    if head.startswith(b"PK\x03\x04"):
        return "zip"  # refined to docx by the part listing
    if head.startswith(b"WARC/"):
        return "warc"
    if head.startswith(b"\x1f\x8b"):
        return "gzip"
    stripped = head.lstrip()
    if stripped[:1] == b"{" and b'"cells"' in bytes(content[:4096]):
        return "ipynb"
    low = stripped[:64].lower()
    if low.startswith(b"<!doctype html") or low.startswith(b"<html"):
        return "html"
    try:
        bytes(content).decode("utf-8")
        return "text"
    except UnicodeDecodeError:
        return "binary"


def extract_auto(content: bytes) -> tuple[str, str | None]:
    """(kind, text) for one blob — the pure dispatcher. Container
    formats extract here; html/text pass through for the Spark-side
    chains; undecodable bytes yield ('binary', None)."""
    from kusto_pre_forge_spark.sources.docx import extract_docx_text
    from kusto_pre_forge_spark.sources.ipynb import notebook_cells, to_script
    from kusto_pre_forge_spark.sources.pdf import extract_pdf_pages
    from kusto_pre_forge_spark.sources.warc import (
        iter_warc_records,
        parse_http_response,
    )

    kind = sniff_format(content)
    data = bytes(content)
    if kind == "gzip":
        try:
            data = gzip.decompress(data)
        except OSError:
            return "binary", None
        inner = sniff_format(data)
        kind = inner if inner != "gzip" else "binary"
    if kind == "pdf":
        return "pdf", PAGE_SEP.join(extract_pdf_pages(data))
    if kind == "zip":
        try:
            zf = zipfile.ZipFile(io.BytesIO(data))
            names = set(zf.namelist())
        except zipfile.BadZipFile:
            return "binary", None
        if "word/document.xml" in names:
            return "docx", extract_docx_text(data)[0]
        return "zip", None  # generic archives route to read_zip_lines
    if kind == "ipynb":
        cells = notebook_cells(data)
        if cells:
            return "ipynb", to_script(cells)
        kind = "text"  # JSON that wasn't a notebook — fall through
    if kind == "warc":
        payloads = []
        for headers, block in iter_warc_records(data):
            if headers.get("warc-type", "").lower() != "response":
                continue
            status, _, body = parse_http_response(block)
            payloads.append(
                (body if status is not None else block).decode(
                    "utf-8", "replace"
                )
            )
        return "warc", PAGE_SEP.join(payloads)
    if kind in ("html", "text"):
        return kind, data.decode("utf-8", "replace")
    return "binary", None


def extract_text_blobs(blobs: DataFrame) -> DataFrame:
    """(path, content) rows → (kind, text, _kpf_source): the mixed-dump
    front door. One Arrow map stage; chain ``textprep.html_extract`` /
    ``markdown_extract`` on the tagged html/text rows Spark-side."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                kind, text = extract_auto(content)
                rows.append({"kind": kind, "text": text, "_kpf_source": p})
            cols = [c.split()[0] for c in AUTOEXTRACT_DDL.split(", ")]
            yield pd.DataFrame(rows, columns=cols)

    return blobs.select("path", "content").mapInPandas(
        batches, AUTOEXTRACT_DDL
    )


def read_text_auto(spark: SparkSession, path: str) -> DataFrame:
    """Point the engine at a mixed directory/glob; get one typed text
    frame back, format-sniffed per blob."""
    bf = spark.read.format("binaryFile").load(path)
    return extract_text_blobs(bf)
