"""Attribute-row XML source (the Stack Exchange dump shape)."""

import bz2
import gzip

import pytest

from kusto_pre_forge_spark.sources import xmlrows as XR


def _dump(**kw):
    rows = [
        dict(Id=1, PostTypeId=1, Title='Q "quoted" & <tagged>',
             Body="<p>body &amp; prose</p>", Score=-3),
        dict(Id=2, PostTypeId=2, ParentId=1, Body="<p>answer</p>", Score=7),
    ]
    return XR.xml_rows_bytes(rows, **kw)


ATTRS = ["Id", "PostTypeId", "ParentId", "Title", "Body", "Score"]


def test_parse_rows_unescape_and_nulls():
    rows = XR.parse_xml_rows(_dump(), ATTRS)
    assert [r["row_no"] for r in rows] == [0, 1]
    # quoteattr escaping round-trips quotes, ampersands, angle brackets
    assert rows[0]["Title"] == 'Q "quoted" & <tagged>'
    # an ALREADY-escaped entity in the source string stays escaped-once
    assert rows[0]["Body"] == "<p>body &amp; prose</p>"
    assert rows[0]["Score"] == "-3"
    assert rows[0]["ParentId"] is None  # missing attribute -> NULL
    assert rows[1]["ParentId"] == "1"


@pytest.mark.parametrize("comp", [None, "bz2", "gzip"])
def test_compression_peel(comp):
    assert len(XR.parse_xml_rows(_dump(compress=comp), ATTRS)) == 2


def test_7z_refuses_loudly():
    with pytest.raises(NotImplementedError, match="7z"):
        XR._peel(b"7z\xbc\xaf\x27\x1c junk")


def test_garbage_quarantines_empty():
    assert XR.parse_xml_rows(b"<posts><row unclosed", ATTRS) == []
    assert XR.parse_xml_rows(b"BZh9 corrupt", ATTRS) == []


def test_custom_row_tag():
    raw = b'<badges><badge UserId="5" Name="Teacher"/></badges>'
    rows = XR.parse_xml_rows(raw, ["UserId", "Name"], row_tag="badge")
    assert rows == [{"row_no": 0, "UserId": "5", "Name": "Teacher"}]


def test_batch_and_stream_reads_identical(spark, tmp_path):
    d = tmp_path / "se"
    d.mkdir()
    (d / "Posts.xml").write_bytes(_dump())
    (d / "Posts2.xml.bz2").write_bytes(_dump(compress="bz2"))
    (d / "Posts3.xml.gz").write_bytes(_dump(compress="gzip"))
    batch = XR.read_xml_rows(spark, str(d), ATTRS).toPandas()
    stream = XR.read_xml_rows_stream(spark, str(d), ATTRS).toPandas()
    key = ["_kpf_source", "row_no"]
    b = batch.sort_values(key).reset_index(drop=True)
    s = stream.sort_values(key).reset_index(drop=True)
    assert len(b) == 6
    assert b.equals(s)


def test_stream_refuses_remote_scheme(spark):
    with pytest.raises(Exception, match="scheme"):
        XR.read_xml_rows_stream(spark, "s3://bucket/se", ATTRS).collect()


def test_7z_hatch_extracts_inner_xml(monkeypatch):
    """r14: the py7zr import-try hatch — a .7z Stack Exchange dump
    peels to its inner .xml where the wheel is importable (stub pin);
    the loud refusal (test_7z_refuses_loudly) holds where it is not."""
    import io as _io
    import sys
    import types

    xml = b'<posts><row Id="1" PostTypeId="1" /></posts>'

    class _FI:
        filename = "Posts.xml"
        uncompressed = len(xml)
        is_directory = False

    class _SZ:
        def __init__(self, fileobj):
            assert fileobj.read(6) == b"7z\xbc\xaf\x27\x1c"

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def list(self):
            return [_FI()]

        def reset(self):
            pass

        def read(self, names):
            return {"Posts.xml": _io.BytesIO(xml)}

    fake = types.ModuleType("py7zr")
    fake.SevenZipFile = _SZ
    monkeypatch.setitem(sys.modules, "py7zr", fake)
    blob = b"7z\xbc\xaf\x27\x1c" + b"\x00" * 16
    rows = XR.parse_xml_rows(blob, ["Id", "PostTypeId"])
    assert rows == [{"row_no": 0, "Id": "1", "PostTypeId": "1"}]
