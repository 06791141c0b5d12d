"""Subtitle text extraction (SRT / WebVTT) as pure column expressions
— subtitles are the highest-quality parallel/transcript text a video
crawl carries, and their cue scaffolding (counters, timestamps, cue
settings, styling) must go before the text is usable for training.

Same design as ``functions/html.py``: ONE published rule list applied
as a codegen ``regexp_replace`` chain, a Python mirror for parity
tests, and patterns restricted to what Java regex, RE2 (DuckDB) and
Python ``re`` all execute identically (no lookaround, no
backreferences) so the operator is cross-engine hash-gateable.

Extraction contract:
- the ``WEBVTT`` header line and VTT ``NOTE``/``STYLE``/``REGION``
  blocks (up to their blank line) drop
- every timestamp line (``... --> ...``, SRT comma or VTT dot form,
  with or without cue settings) drops TOGETHER with the line before it
  (only ever an SRT counter, a VTT cue id, or blank — never cue text)
- inline markup drops: HTML-ish tags (``<i> <b> <c.cls> <v Name>``)
  and ASS-style ``{\\an8}`` overrides
- the five named entities decode (``&amp;`` last)
- each cue's lines survive as text lines; blank-line runs collapse so
  the output is one line per cue line, trimmed
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SUBTITLE_RULES: tuple[tuple[str, str], ...] = (
    (r"^﻿", ""),  # optional BOM (the WebVTT spec allows it)
    # VTT comment/style/region blocks: the tag line plus following
    # non-empty lines. Per spec NOTE is followed by space/newline and
    # STYLE/REGION stand alone — 'NOTEBOOK was...' cue text is NOT a
    # comment block and must survive
    (r"(?m)^(?:NOTE[ \t][^\n]*|NOTE|STYLE|REGION)$\n?(?:[^\n]+\n?)*", ""),
    (r"(?m)^WEBVTT[^\n]*$", ""),
    # a timestamp line TOGETHER with the line before it: that line is
    # only ever an SRT counter, a VTT cue identifier, or blank — never
    # cue text (text follows the timestamp) — so consuming the pair
    # drops counters and ids without a digits-only rule that could eat
    # legitimate numeric cue text
    (r"(?m)^[^\n]*\n[^\n]*-->[^\n]*$", ""),
    (r"(?m)^[^\n]*-->[^\n]*$", ""),  # timestamp at document start
    # inline tags: must LOOK like a tag (letter-initial, or a VTT
    # karaoke timestamp, or a close tag) and stay on one line — a
    # stray '<' in cue text ('i <3 subs', '5 < 6') must never swallow
    # text to the next '>' lines or cues away
    (r"</?[A-Za-z][^<>\n]*>|<[0-9:.]+>", ""),
    (r"\{\\[^}]*\}", ""),  # ASS override blocks
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&apos;", "'"),
    (r"&amp;", "&"),
    (r"[ \t\r]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{2,}", "\n"),
    (r"^\n+|\n+$", ""),
    (r"^ +| +$", ""),
)


def subtitle_kind(col: Column) -> Column:
    """'vtt' | 'srt' | NULL — WEBVTT magic, else the SRT cue shape
    (a counter line followed by a comma-millisecond timestamp)."""
    stripped = F.ltrim(F.regexp_replace(col, "^﻿", ""))
    return (
        F.when(stripped.startswith("WEBVTT"), F.lit("vtt"))
        .when(
            col.rlike(r"(?m)^\d+\s*\n\d{2}:\d{2}:\d{2},\d{3}\s*-->"),
            F.lit("srt"),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def subtitle_text(col: Column) -> Column:
    """Cue text only, one line per cue line — the published rule list
    as a codegen chain. NULL in ⇒ NULL out."""
    out = col
    for pat, rep in SUBTITLE_RULES:
        out = F.regexp_replace(out, pat, rep)
    return out


def py_subtitle_text(s: str) -> str:
    """Independent-execution Python mirror (same rule list, Python
    ``re``) for parity tests."""
    import re

    for pat, rep in SUBTITLE_RULES:
        s = re.sub(pat, rep, s)
    return s
