"""MediaWiki XML dump source — the Wikipedia-corpus front door.

Wikipedia (and every MediaWiki wiki) publishes its content as XML
export dumps (`<mediawiki><page><revision><text>` — the schema at
https://www.mediawiki.org/xml/export-0.10.xsd), compressed bz2
(`pages-articles.xml.bz2`, ~20 GB for enwiki). Wikipedia is a standard
high-quality LLM pretraining source, so this continues the
document-input family (reference parity: the reference's format
dispatch throws for anything beyond txt,
code/KustoPreForgeLib/EtlRun.cs:87-89).

Two read paths, the house convention:

- :func:`read_mediawiki` — ``binaryFile`` + one Arrow map stage; bz2 /
  gzip peel per blob (dumps ship compressed; magic decides, the
  extension lies).
- :func:`read_mediawiki_stream` — PAST the 2 GiB ``binaryFile``
  ceiling: paths distribute one-per-task, each worker opens the file
  through ``bz2.BZ2File`` / ``gzip.open`` and runs ``iterparse``
  INCREMENTALLY, clearing each ``<page>`` element after it yields — a
  20 GB enwiki dump holds ONE page in memory at a time. This is the
  only correct posture for real dumps: enwiki exceeds the JVM byte[]
  ceiling immediately.

Rows are one per page: (page_no, title, ns, page_id, redirect, text).
Full-history dumps carry many ``<revision>`` blocks per page — the
LAST one (the latest) wins, matching the pages-articles convention.
The page TEXT is raw wikitext; chain
``textprep.wikitext_extract`` Spark-side for prose (the html_extract
posture — extraction is a codegen projection, not Python).

Stdlib-only (``xml.etree.ElementTree`` iterparse, ``bz2``, ``gzip``);
the forge writer emits schema-valid dumps for tests/oracles.
"""

from __future__ import annotations

import bz2
import gzip
import io
import zlib
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession

MEDIAWIKI_DDL = (
    "page_no int, title string, ns int, page_id long, "
    "redirect string, text string, _kpf_source string"
)

_COLS = [c.split()[0] for c in MEDIAWIKI_DDL.split(", ")]


def is_mediawiki(data: bytes) -> bool:
    """Head probe: a ``<mediawiki`` root element within the first
    512 bytes (after any XML declaration / BOM / whitespace). Pure
    bytes — compressed dumps peel before probing."""
    head = bytes(data[:512]).lstrip(b"\xef\xbb\xbf \t\r\n")
    if head.startswith(b"<?xml"):
        end = head.find(b"?>")
        if end < 0:
            return False
        head = head[end + 2 :].lstrip()
    return head.startswith(b"<mediawiki")


def _local(tag: str) -> str:
    """Strip the `{namespace-uri}` prefix iterparse attaches."""
    return tag.rsplit("}", 1)[-1]


def _page_row(elem, page_no: int) -> dict:
    title, ns, page_id, redirect, text = None, None, None, None, None
    for child in elem:
        t = _local(child.tag)
        if t == "title":
            title = child.text or ""
        elif t == "ns":
            try:
                ns = int(child.text or "0")
            except ValueError:
                ns = None
        elif t == "id" and page_id is None:
            try:
                page_id = int(child.text or "0")
            except ValueError:
                page_id = None
        elif t == "redirect":
            redirect = child.get("title", "")
        elif t == "revision":
            # last revision wins (full-history dumps list oldest first)
            for rchild in child:
                if _local(rchild.tag) == "text":
                    text = rchild.text or ""
    return {
        "page_no": page_no,
        "title": title,
        "ns": ns,
        "page_id": page_id,
        "redirect": redirect,
        "text": text,
    }


def iter_mediawiki_pages(fileobj) -> "iter":
    """Incremental page iterator over an (already-decompressed) XML
    stream: yields one row dict per ``<page>``, clearing each element
    after use so memory stays one-page-bounded regardless of dump
    size — the standard iterparse idiom for multi-GB XML."""
    page_no = 0
    # grab the root once so cleared pages detach from it (otherwise the
    # root accumulates every cleared-but-referenced child)
    context = ET.iterparse(fileobj, events=("start", "end"))
    root = None
    for event, elem in context:
        if event == "start":
            if root is None:
                root = elem
            continue
        if _local(elem.tag) == "page":
            yield _page_row(elem, page_no)
            page_no += 1
            elem.clear()
            if root is not None:
                # drop the completed child from the root's child list
                try:
                    root.remove(elem)
                except ValueError:
                    pass


def _peel(data: bytes) -> bytes:
    """bz2 / gzip transparent decompression (dumps ship compressed;
    magic decides). Raises on corrupt streams — the caller's
    quarantine posture handles it."""
    if data[:3] == b"BZh":
        return bz2.decompress(data)
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    return data


def parse_mediawiki_pages(data: bytes) -> list[dict]:
    """Pure function: dump bytes (plain / .bz2 / .gz) → page row
    dicts. Unit-testable without Spark."""
    try:
        payload = _peel(bytes(data))
        return list(iter_mediawiki_pages(io.BytesIO(payload)))
    except (OSError, EOFError, ValueError, zlib.error, ET.ParseError):
        return []


def parse_mediawiki_blobs(blobs: DataFrame) -> DataFrame:
    """(path, content) blob rows → one row per page (MEDIAWIKI_DDL) —
    pure Arrow map stage, the sibling-reader posture. Chain
    ``textprep.wikitext_extract`` on ``text`` for prose."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for row in parse_mediawiki_pages(content):
                    rows.append({**row, "_kpf_source": p})
            yield pd.DataFrame(rows, columns=_COLS)

    return blobs.select("path", "content").mapInPandas(
        batches, MEDIAWIKI_DDL
    )


def read_mediawiki(spark: SparkSession, path: str) -> DataFrame:
    """Read a MediaWiki dump directory/glob (plain / .bz2 / .gz) as
    one typed row per page. Blobs must fit the 2 GiB ``binaryFile``
    ceiling — real enwiki dumps don't; use
    :func:`read_mediawiki_stream` there."""
    bf = spark.read.format("binaryFile").load(path)
    return parse_mediawiki_blobs(bf)


def read_mediawiki_stream(spark: SparkSession, path: str) -> DataFrame:
    """MediaWiki dumps PAST the 2 GiB ceiling: paths distribute via
    exact one-file-per-task slicing, each worker opens its file
    through the matching decompressor (``bz2.BZ2File`` — bz2 is what
    Wikimedia actually publishes — / ``gzip.open`` / plain) and
    iterparse yields one page at a time; pages stream out in Arrow
    batches without the dump ever materializing. Output is pinned
    row-identical to :func:`read_mediawiki` in tests; bare remote
    schemes refuse with the mount workaround named (the
    ``worker_local_path`` contract)."""
    import pandas as pd

    from kusto_pre_forge_spark.sources.blob import (
        exact_path_slices,
        worker_local_path,
    )

    paths = exact_path_slices(spark, path, max_files_per_task=1)

    def _open(raw):
        with open(raw, "rb") as probe:
            head = probe.read(3)
        if head[:3] == b"BZh":
            return bz2.BZ2File(raw, "rb")
        if head[:2] == b"\x1f\x8b":
            return gzip.open(raw, "rb")
        return open(raw, "rb")

    def batches(it):
        for pdf in it:
            for p in pdf["path"]:
                raw = worker_local_path(p)
                # Pass 1 — validate the WHOLE blob streaming (rows
                # discarded, O(1) memory): a corrupt dump must yield
                # ZERO rows, identical to read_mediawiki's quarantine,
                # never a partial prefix. Pass 2 then re-streams and
                # emits; the 2x decompress buys the row-identical
                # contract without buffering an unbounded dump.
                try:
                    with _open(raw) as f:
                        for _ in iter_mediawiki_pages(f):
                            pass
                except (OSError, EOFError, ValueError, zlib.error, ET.ParseError):
                    continue
                rows: list[dict] = []
                with _open(raw) as f:
                    for row in iter_mediawiki_pages(f):
                        rows.append({**row, "_kpf_source": p})
                        if len(rows) >= 1024:
                            yield pd.DataFrame(rows, columns=_COLS)
                            rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=_COLS)

    return paths.mapInPandas(batches, MEDIAWIKI_DDL)


# --------------------------------------------------- fixture-forging writer


def mediawiki_bytes(pages: list[dict], compress: str | None = None) -> bytes:
    """Forge a schema-valid dump. Each page dict: title, ns, page_id,
    text, optional redirect, optional ``old_texts`` (earlier revisions,
    to pin last-revision-wins). ``compress``: None / 'bz2' / 'gzip'."""
    parts = [
        '<?xml version="1.0" encoding="utf-8"?>\n'
        '<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/" '
        'version="0.10" xml:lang="en">\n'
        "  <siteinfo><sitename>forge</sitename></siteinfo>\n"
    ]
    for pg in pages:
        parts.append("  <page>\n")
        parts.append(f"    <title>{escape(pg['title'])}</title>\n")
        parts.append(f"    <ns>{int(pg.get('ns', 0))}</ns>\n")
        parts.append(f"    <id>{int(pg['page_id'])}</id>\n")
        if pg.get("redirect") is not None:
            parts.append(
                '    <redirect title="%s" />\n'
                % escape(pg["redirect"], {'"': "&quot;"})
            )
        revs = list(pg.get("old_texts", [])) + [pg.get("text", "")]
        for rno, rtext in enumerate(revs, start=1):
            parts.append(
                "    <revision>\n"
                f"      <id>{int(pg['page_id']) * 100 + rno}</id>\n"
                '      <text xml:space="preserve">'
                f"{escape(rtext)}</text>\n"
                "    </revision>\n"
            )
        parts.append("  </page>\n")
    parts.append("</mediawiki>\n")
    raw = "".join(parts).encode("utf-8")
    if compress == "bz2":
        return bz2.compress(raw)
    if compress == "gzip":
        return gzip.compress(raw)
    return raw
