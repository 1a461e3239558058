"""Format-sniffing auto-extraction (sources/autoextract.py) — the
mixed-dump front door: magic bytes decide, extensions lie."""

import gzip

from kusto_pre_forge_spark.sources import autoextract as A
from kusto_pre_forge_spark.sources import docx as D
from kusto_pre_forge_spark.sources import ipynb as N
from kusto_pre_forge_spark.sources import pdf as P
from kusto_pre_forge_spark.sources import warc as W


def test_dispatch_matrix():
    cases = [
        (P.pdf_bytes(["p1", "p2"]), "pdf", "p1\x0cp2"),
        (P.pdf_bytes_xrefstream(["modern"]), "pdf", "modern"),
        (D.docx_bytes("doc text\nline"), "docx", "doc text\nline"),
        (N.ipynb_bytes([("code", "x = 1")]), "ipynb", "x = 1"),
        (
            W.write_warc([W.warc_record_bytes("u", b"body text")]),
            "warc",
            "body text",
        ),
        # whole-file gzip: sniff recurses into the member
        (
            gzip.compress(W.write_warc([W.warc_record_bytes("u", b"gz")])),
            "warc",
            "gz",
        ),
        (b"<html><body>raw</body></html>", "html", "<html><body>raw</body></html>"),
        (b"<!DOCTYPE html><p>x</p>", "html", "<!DOCTYPE html><p>x</p>"),
        (b"plain utf8 text", "text", "plain utf8 text"),
        (b"\x00\x01\xff\xfe binary \x80", "binary", None),
        # JSON that is not a notebook falls through to text
        (b'{"not": "a notebook", "cells": 3}', "text", '{"not": "a notebook", "cells": 3}'),
        (b"", "text", ""),
    ]
    for blob, want_kind, want_text in cases:
        kind, text = A.extract_auto(blob)
        assert (kind, text) == (want_kind, want_text), (want_kind, kind)


def test_generic_zip_is_not_docx():
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("data.csv", "a,b\n1,2\n")
    kind, text = A.extract_auto(buf.getvalue())
    assert kind == "zip" and text is None


def test_read_text_auto_spark(spark, tmp_path):
    """End-to-end over a mixed directory with DELIBERATELY WRONG
    extensions — content decides; plan stays a pure map stage."""
    (tmp_path / "a.txt").write_bytes(P.pdf_bytes(["pdf body"]))
    (tmp_path / "b.pdf").write_bytes(D.docx_bytes("docx body"))
    (tmp_path / "c.dat").write_bytes(b"plain body")
    df = A.read_text_auto(spark, str(tmp_path / "*"))
    got = {
        r._kpf_source.rsplit("/", 1)[-1]: (r.kind, r.text)
        for r in df.collect()
    }
    assert got == {
        "a.txt": ("pdf", "pdf body"),
        "b.pdf": ("docx", "docx body"),
        "c.dat": ("text", "plain body"),
    }
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_auto_streaming_landing(spark, tmp_path):
    """A mixed dump dropped into a streaming landing dir: every arriving
    blob is sniffed and extracted through the same pure map stage as the
    batch front door."""
    from kusto_pre_forge_spark.streaming.ingest import StreamingEtl

    land = tmp_path / "auto_landing"
    land.mkdir()
    (land / "one").write_bytes(P.pdf_bytes(["pdf page"]))
    (land / "two").write_bytes(D.docx_bytes("docx body"))
    (land / "three").write_bytes(b"plain text blob")
    etl = StreamingEtl(
        spark,
        str(land),
        str(tmp_path / "ckpt_auto"),
        str(tmp_path / "out_auto"),
        schema=None,
        fmt="auto",
        max_files_per_trigger=1,
    )
    q = (
        etl._source()
        .writeStream.format("memory")
        .queryName("auto_mem")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_auto"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM auto_mem").collect()
    got = {r._kpf_source.rsplit("/", 1)[-1]: (r.kind, r.text) for r in rows}
    assert got == {
        "one": ("pdf", "pdf page"),
        "two": ("docx", "docx body"),
        "three": ("text", "plain text blob"),
    }
