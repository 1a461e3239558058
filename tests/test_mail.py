"""Mail source (sources/mail.py): mbox framing, from-stuffing, MIME
part selection, header decoding, the Spark layer."""

from kusto_pre_forge_spark.sources import mail as M


def test_mbox_roundtrip_and_framing():
    msgs_in = [
        {"subject": "Hello", "from_addr": "a@x.org",
         "date": "Mon, 1 Jan 2024 00:00:00 +0000",
         "body": "line one\nFrom the start\nmore"},
        {"subject": "Re: Hello", "from_addr": "b@y.org",
         "date": "Tue, 2 Jan 2024 00:00:00 +0000", "body": "reply body"},
        {"subject": "empty", "from_addr": "c@z.net", "date": "", "body": ""},
    ]
    got = M.parse_mbox_messages(M.mbox_bytes(msgs_in))
    assert [m["msg_no"] for m in got] == [0, 1, 2]
    for want, m in zip(msgs_in, got):
        assert m["subject"] == want["subject"]
        assert m["from_addr"] == want["from_addr"]
        assert m["body"] == want["body"], (want, m)
        assert m["content_kind"] == "text"


def test_eml_multipart_and_encoded_headers():
    eml = (
        b"From: =?utf-8?b?SsO8cmdlbg==?= <j@x.de>\n"
        b"Subject: =?utf-8?q?caf=C3=A9_report?=\n"
        b'Content-Type: multipart/alternative; boundary="BB"\n'
        b"MIME-Version: 1.0\n\n"
        b"--BB\n"
        b"Content-Type: text/html\n\n"
        b"<p>html first</p>\n"
        b"--BB\n"
        b"Content-Type: text/plain\n\n"
        b"plain wins\n"
        b"--BB--\n"
    )
    (m,) = M.parse_mbox_messages(eml)
    assert m["subject"] == "café report"
    assert "Jürgen" in m["from_addr"]
    assert m["body"] == "plain wins" and m["content_kind"] == "text"
    # html-only mail falls back to raw html for the Spark-side chain
    eml2 = (
        b"From: a@b.c\nSubject: s\nContent-Type: text/html\n\n<p>only</p>\n"
    )
    (m2,) = M.parse_mbox_messages(eml2)
    assert m2["content_kind"] == "html" and m2["body"] == "<p>only</p>"


def test_mail_spark_layer(spark, tmp_path):
    mb = M.mbox_bytes(
        [{"subject": f"s{i}", "from_addr": f"u{i}@x.org", "date": "",
          "body": f"body {i}"} for i in range(3)]
    )
    (tmp_path / "a.mbox").write_bytes(mb)
    rows = sorted(
        (r.msg_no, r.subject, r.body)
        for r in M.read_mbox(spark, str(tmp_path / "*.mbox")).collect()
    )
    assert rows == [(i, f"s{i}", f"body {i}") for i in range(3)]
    df = M.read_mbox(spark, str(tmp_path / "*.mbox"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
