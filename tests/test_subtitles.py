"""SRT/WebVTT text extraction: rule-list parity between the Spark
chain and the Python mirror, dialect detection, scaffolding removal."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.functions.subtitles import (
    py_subtitle_text,
    subtitle_kind,
    subtitle_text,
)

SRT = """1
00:00:01,000 --> 00:00:04,000
Hello <i>world</i> &amp; friends

2
00:00:05,500 --> 00:00:07,000
Second line one
{\\an8}Second line two

3
00:01:00,000 --> 00:01:02,000
Third
"""

VTT = """WEBVTT Kind: captions; Language: en

NOTE this is a comment
spanning two lines

STYLE
::cue { color: red }

cue-1
00:00:01.000 --> 00:00:04.000 align:start position:10%
<v Speaker One>Hi there</v>

00:00:05.000 --> 00:00:06.000
<c.yellow>Colored</c> text
"""


def test_srt_extraction(spark):
    df = spark.createDataFrame([(SRT,)], "s string")
    got = df.select(subtitle_text(F.col("s")).alias("t"),
                    subtitle_kind(F.col("s")).alias("k")).collect()[0]
    assert got["k"] == "srt"
    assert got["t"] == ("Hello world & friends\n"
                        "Second line one\nSecond line two\nThird")
    assert py_subtitle_text(SRT) == got["t"]


def test_vtt_extraction(spark):
    df = spark.createDataFrame([(VTT,)], "s string")
    got = df.select(subtitle_text(F.col("s")).alias("t"),
                    subtitle_kind(F.col("s")).alias("k")).collect()[0]
    assert got["k"] == "vtt"
    assert got["t"] == "Hi there\nColored text"
    assert py_subtitle_text(VTT) == got["t"]


def test_kind_detection_negative(spark):
    df = spark.createDataFrame(
        [("just some text\nwith lines",), ("12:00 not a cue",)],
        "s string",
    )
    assert [r[0] for r in df.select(subtitle_kind(F.col("s"))).collect()] \
        == [None, None]


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126)
               | st.sampled_from("\n<>&{}\\-"),
               min_size=0, max_size=200))
def test_rule_parity_duckdb_vs_python(s):
    """Property: DuckDB's RE2 executes the published rule list exactly
    like the Python mirror on arbitrary input — the cross-engine gate
    precondition (the Spark/Java side is pinned by the fixed tests)."""
    import duckdb

    from sample_dms_kinesis_rds_mariadb_spark.functions.subtitles import (
        SUBTITLE_RULES,
    )

    con = duckdb.connect()
    expr = "s"
    for pat, rep in SUBTITLE_RULES:
        p = pat.replace("'", "''")
        r = rep.replace("\\", "\\\\").replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    got = con.execute(f"SELECT {expr} FROM (SELECT ? AS s)", [s]).fetchone()[0]
    assert got == py_subtitle_text(s)


def test_review_fixes_stray_angle_note_words_bom(spark):
    """Review fixes: a stray '<' in cue text never swallows text to a
    later '>;' NOTE-prefixed words are not comment blocks; a BOM'd
    WEBVTT still detects and cleans."""
    srt = ("1\n00:00:01,000 --> 00:00:02,000\ni <3 subs\n\n"
           "2\n00:00:03,000 --> 00:00:04,000\nx > y wins\n\n"
           "3\n00:00:05,000 --> 00:00:06,000\n"
           "NOTEBOOK sales rose\n")
    assert py_subtitle_text(srt) == (
        "i <3 subs\nx > y wins\nNOTEBOOK sales rose"
    )
    # ... while a true 'NOTE ' line IS the WebVTT comment form and
    # drops — the documented cross-dialect contract
    assert "wording" not in py_subtitle_text(
        srt + "\n4\n00:00:07,000 --> 00:00:08,000\nNOTE the wording\n"
    )
    # VTT karaoke timestamps and voice tags still strip
    vtt = ("WEBVTT\n\n00:00:01.000 --> 00:00:04.000\n"
           "<v Ann>One<00:00:02.000> two</v>\n")
    assert py_subtitle_text(vtt) == "One two"
    bom_vtt = "﻿" + vtt
    df = spark.createDataFrame([(bom_vtt,)], "s string")
    got = df.select(subtitle_text(F.col("s")).alias("t"),
                    subtitle_kind(F.col("s")).alias("k")).collect()[0]
    assert got["k"] == "vtt" and got["t"] == "One two"
    # real VTT NOTE blocks (NOTE + space, NOTE alone) still drop
    noted = ("WEBVTT\n\nNOTE a comment\nmore comment\n\n"
             "NOTE\nbare-form comment\n\n"
             "00:00:01.000 --> 00:00:02.000\ncue text\n")
    assert py_subtitle_text(noted) == "cue text"
