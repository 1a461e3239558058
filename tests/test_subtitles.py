"""Subtitle source (sources/subtitles.py): SRT + WebVTT parsing, cue
timing arithmetic, multi-line cue text, the Spark layer."""

from kusto_pre_forge_spark.sources import subtitles as S


def test_srt_roundtrip_and_timing():
    cues = [
        (0, 1500, "first line\nsecond line"),
        (61_000, 3_601_250, "over an hour"),
        (90_500, 92_000, "café — unicode ok"),
    ]
    got = S.parse_subtitles(S.srt_bytes(cues))
    assert [g["cue_no"] for g in got] == [0, 1, 2]
    assert got[0]["start_s"] == 0.0 and got[0]["end_s"] == 1.5
    assert got[0]["text"] == "first line\nsecond line"
    assert got[1]["end_s"] == 3601.25
    assert got[2]["text"] == "café — unicode ok"
    assert all(g["dialect"] == "srt" for g in got)


def test_vtt_notes_settings_and_bom():
    cues = [(250, 1000, "hello"), (1000, 2000, "world")]
    data = S.vtt_bytes(cues)
    got = S.parse_subtitles(data)
    assert [g["text"] for g in got] == ["hello", "world"]
    assert got[0]["start_s"] == 0.25
    assert all(g["dialect"] == "vtt" for g in got)
    # NOTE block must not become a cue
    assert len(got) == 2
    # BOM tolerated
    got2 = S.parse_subtitles("﻿".encode("utf-8") + data)
    assert got2 == got


def test_subtitles_spark_layer(spark, tmp_path):
    (tmp_path / "a.srt").write_bytes(
        S.srt_bytes([(0, 1000, "one"), (1000, 2000, "two")])
    )
    (tmp_path / "b.vtt").write_bytes(S.vtt_bytes([(0, 500, "vee")]))
    df = S.read_subtitles(spark, str(tmp_path / "*"))
    got = sorted(
        (r._kpf_source.rsplit("/", 1)[-1], r.cue_no, r.text, r.dialect)
        for r in df.collect()
    )
    assert got == [
        ("a.srt", 0, "one", "srt"),
        ("a.srt", 1, "two", "srt"),
        ("b.vtt", 0, "vee", "vtt"),
    ]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
