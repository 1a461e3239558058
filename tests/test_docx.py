"""DOCX text-extraction source (sources/docx.py) — ECMA-376 package
parsing via stdlib zipfile + the wordprocessingml text subset."""

import io
import zipfile

from kusto_pre_forge_spark.sources import docx as D


def test_forge_roundtrip_exact():
    texts = [
        "hello world\nsecond paragraph",
        'entities & <tags> and "quotes"\nwith\ttabs',
        "",
        "café ü 中文 🙂",
        "\nleading blank paragraph",
        "trailing\n",
    ]
    for t in texts:
        got, n = D.extract_docx_text(D.docx_bytes(t))
        assert got == t, (repr(t), repr(got))
        assert n == len(t.split("\n"))


def test_document_xml_constructs():
    """<w:t> runs concatenate in order, <w:tab/> → TAB, <w:br/> →
    newline, numeric + named entities decode, attribute-bearing and
    self-closed paragraph forms both count."""
    xml = (
        "<w:document><w:body>"
        "<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b&#65;&#x42;&amp;</w:t>"
        "<w:br/><w:t>c</w:t></w:r></w:p>"
        '<w:p w:rsidR="00A"><w:r><w:t xml:space="preserve"> padded </w:t></w:r></w:p>'
        "<w:p/>"
        "</w:body></w:document>"
    )
    assert D.document_xml_text(xml) == "a\tbAB&\nc\n padded \n"


def test_non_package_inputs_yield_empty():
    assert D.extract_docx_text(b"not a zip at all") == ("", 0)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("other.txt", "x")
    assert D.extract_docx_text(buf.getvalue()) == ("", 0)


def test_read_docx_spark_layer(spark, tmp_path):
    docs = {"a.docx": "alpha\nbeta", "b.docx": "solo"}
    for name, text in docs.items():
        (tmp_path / name).write_bytes(D.docx_bytes(text))
    df = D.read_docx(spark, str(tmp_path / "*.docx"))
    got = {
        r._kpf_source.rsplit("/", 1)[-1]: (r.text, r.n_paragraphs)
        for r in df.collect()
    }
    assert got == {"a.docx": ("alpha\nbeta", 2), "b.docx": ("solo", 1)}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "docx parse must stay a pure map stage"


def test_docx_streaming_landing(spark, tmp_path):
    from kusto_pre_forge_spark.streaming.ingest import StreamingEtl

    land = tmp_path / "docx_landing"
    land.mkdir()
    (land / "a.docx").write_bytes(D.docx_bytes("first\nsecond"))
    (land / "b.docx").write_bytes(D.docx_bytes("other"))
    etl = StreamingEtl(
        spark,
        str(land),
        str(tmp_path / "ckpt_docx"),
        str(tmp_path / "out_docx"),
        schema=None,
        fmt="docx",
        max_files_per_trigger=1,
    )
    q = (
        etl._source()
        .writeStream.format("memory")
        .queryName("docx_mem")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_docx"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM docx_mem").collect()
    got = {r._kpf_source.rsplit("/", 1)[-1]: r.text for r in rows}
    assert got == {"a.docx": "first\nsecond", "b.docx": "other"}
