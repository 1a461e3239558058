"""RTF source: destination-aware state machine + forge roundtrips."""

import pytest

from kusto_pre_forge_spark.sources import rtf as R


ROUNDTRIP = [
    "Hello world",
    "Two\nlines and\ttab",
    "Braces {x} and back\\slash",
    "Accents: é ü ñ — “quoted” …",
    "CJK 中文 and emoji \U0001F600 and combining é",  # non-BMP surrogate pair
    "",
]


@pytest.mark.parametrize("t", ROUNDTRIP)
def test_forge_roundtrip(t):
    got, _ = R.extract_rtf_text(R.rtf_bytes(t))
    assert got == t


def test_probe():
    assert R.is_rtf(R.rtf_bytes("x"))
    assert not R.is_rtf(b"{\\ansi}")
    assert R.extract_rtf_text(b"not rtf") == ("", 0)


def test_hand_document_destinations_escapes_bin():
    doc = (
        b"{\\rtf1\\ansi\\uc1{\\fonttbl{\\f0 Calibri;}}"
        b"{\\info{\\author Secret}}\n"
        b"Caf\\'e9 costs \\u8364? 5{\\*\\unknowndest hidden}\\par\n"
        b"Second\\tab col\\bin4 {}{}after}"
    )
    got, n_groups = R.extract_rtf_text(doc)
    # fonttbl/info/\*-destinations skipped entirely (incl. 'Secret'),
    # \'hh cp1252 escape decoded, \uN? emits the char and \uc1 swallows
    # the '?', \bin's 4 raw bytes (which LOOK like braces) never scanned
    assert got == "Café costs € 5\nSecond\tcolafter"
    assert n_groups == 6


def test_uc2_swallows_two_fallback_chars():
    doc = b"{\\rtf1\\ansi\\uc2 A\\u8364??B}"
    assert R.extract_rtf_text(doc)[0] == "A€B"


def test_negative_u_param_wraps_signed16():
    # U+20AC encodes as 8364; U+D83D (high surrogate) as -10179
    doc = b"{\\rtf1\\ansi\\uc1 \\u-10179?\\u-8701?}"
    assert R.extract_rtf_text(doc)[0] == "\U0001F603"


def test_raw_crlf_not_text():
    doc = b"{\\rtf1\\ansi\r\nplain\r\nwords}"
    assert R.extract_rtf_text(doc)[0] == "plainwords"


def test_spark_read(spark, tmp_path):
    d = tmp_path / "rtf"
    d.mkdir()
    (d / "a.rtf").write_bytes(R.rtf_bytes("doc one\nline two"))
    (d / "b.rtf").write_bytes(R.rtf_bytes("doc two"))
    rows = {r["_kpf_source"].rsplit("/", 1)[-1]: r["text"]
            for r in R.read_rtf(spark, str(d)).collect()}
    assert rows == {"a.rtf": "doc one\nline two", "b.rtf": "doc two"}


def test_front_door_routes_rtf():
    from kusto_pre_forge_spark.sources import autoextract as A

    kind, text = A.extract_auto(R.rtf_bytes("front door prose"))
    assert (kind, text) == ("rtf", "front door prose")
    assert A.sniff_format(b"{\\rtf1\\ansi hi}") == "rtf"


def test_uc_skip_resets_at_group_close():
    # \uN's fallback-skip protocol is GROUP-scoped: a \u escape that
    # ends its group must not swallow the first char after `}`
    doc = b"{\\rtf1\\ansi A{\\uc1 \\u8364}B}"
    assert R.extract_rtf_text(doc)[0] == "A€B"
