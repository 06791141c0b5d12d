"""HLS playlist parsing (RFC 8216, .m3u8) — the text half of the HLS
pair whose binary half is :mod:`operators.mpegts`: a crawl that hits
`.ts` segments hits the playlists that index them, and the playlist is
where the stream-level truth lives (total duration, variant ladder,
codecs, encryption).

Master playlists yield the variant ladder (BANDWIDTH / RESOLUTION /
CODECS / URI per ``#EXT-X-STREAM-INF``); media playlists yield the
segment list with per-segment ``#EXTINF`` durations (summed into the
total), target duration, media-sequence, VOD-vs-live
(``#EXT-X-ENDLIST``), and whether segments are encrypted
(``#EXT-X-KEY`` with a method other than NONE). The attribute-list
grammar (comma-separated ``KEY=VALUE`` with quoted strings that may
contain commas) is tokenized per the RFC, not split naively.

Failure posture: not-a-playlist raises ``ValueError``; unknown tags
are skipped (the RFC requires clients to ignore unrecognized tags), a
malformed attribute list degrades to the attributes parsed so far.

At scale: playlists are kilobytes; the parse is one linear pass per
payload inside the same Arrow ``mapInPandas`` sweep as the binary
containers.
"""

from __future__ import annotations


def is_m3u8(content: bytes) -> bool:
    head = content.removeprefix(b"\xef\xbb\xbf").lstrip()
    return head[:7] == b"#EXTM3U"


def parse_attribute_list(s: str) -> dict[str, str]:
    """RFC 8216 §4.2: AttributeName=AttributeValue pairs, comma
    separated; quoted-string values may contain commas."""
    out: dict[str, str] = {}
    i, n = 0, len(s)
    while i < n:
        eq = s.find("=", i)
        if eq < 0:
            break
        key = s[i:eq].strip()
        j = eq + 1
        if j < n and s[j] == '"':
            end = s.find('"', j + 1)
            if end < 0:
                break  # unterminated quote: keep what we have
            out[key] = s[j + 1 : end]
            i = end + 1
            if i < n and s[i] == ",":
                i += 1
        else:
            end = s.find(",", j)
            if end < 0:
                end = n
            out[key] = s[j:end].strip()
            i = end + 1
    return out


def parse_m3u8(content: bytes) -> dict:
    """One playlist → metadata dict.

    Master: ``{kind:'master', variants:[{bandwidth,width,height,codecs,
    uri}...], max_bandwidth, best_resolution}``. Media:
    ``{kind:'media', n_segments, duration_sec, target_duration,
    media_sequence, ended, encrypted, segment_uris}``.
    """
    try:
        text = content.decode("utf-8", "replace")
    except AttributeError:  # already str
        text = content
    lines = [line.strip() for line in text.splitlines()]
    # leading blank lines are tolerated, matching is_m3u8's lstrip —
    # the sniff and the parse must accept the same documents
    while lines and not lines[0]:
        lines.pop(0)
    if not lines or not lines[0].lstrip("﻿").startswith("#EXTM3U"):
        raise ValueError("not an M3U8 playlist (no #EXTM3U)")

    variants: list[dict] = []
    pending_inf: dict | None = None
    segments: list[tuple[float, str]] = []
    pending_dur: float | None = None
    target_duration = None
    media_sequence = 0
    ended = False
    encrypted = False

    for line in lines[1:]:
        if not line:
            continue
        if line.startswith("#EXT-X-STREAM-INF:"):
            pending_inf = parse_attribute_list(line.partition(":")[2])
        elif line.startswith("#EXTINF:"):
            dur = line.partition(":")[2].split(",", 1)[0].strip()
            try:
                pending_dur = float(dur)
            except ValueError:
                pending_dur = None
        elif line.startswith("#EXT-X-TARGETDURATION:"):
            try:
                target_duration = float(line.partition(":")[2])
            except ValueError:
                pass
        elif line.startswith("#EXT-X-MEDIA-SEQUENCE:"):
            try:
                media_sequence = int(line.partition(":")[2])
            except ValueError:
                pass
        elif line.startswith("#EXT-X-ENDLIST"):
            ended = True
        elif line.startswith("#EXT-X-KEY:"):
            attrs = parse_attribute_list(line.partition(":")[2])
            if attrs.get("METHOD", "NONE").upper() != "NONE":
                encrypted = True
        elif line.startswith("#"):
            continue  # unrecognized tag / comment: RFC says ignore
        else:  # a URI line
            if pending_inf is not None:
                w = h = None
                res = pending_inf.get("RESOLUTION", "")
                if "x" in res.lower():
                    a, _, b = res.lower().partition("x")
                    if a.isdigit() and b.isdigit():
                        w, h = int(a), int(b)
                try:
                    bw = int(pending_inf.get("BANDWIDTH", "0"))
                except ValueError:
                    bw = 0
                variants.append({
                    "bandwidth": bw,
                    "width": w,
                    "height": h,
                    "codecs": pending_inf.get("CODECS"),
                    "uri": line,
                })
                pending_inf = None
            elif pending_dur is not None:
                segments.append((pending_dur, line))
                pending_dur = None

    if variants:
        best = max(variants, key=lambda v: (v["width"] or 0) * (v["height"] or 0))
        return {
            "kind": "master",
            "variants": variants,
            "max_bandwidth": max(v["bandwidth"] for v in variants),
            "width": best["width"],
            "height": best["height"],
            "codecs": best["codecs"],
        }
    return {
        "kind": "media",
        "n_segments": len(segments),
        "duration_sec": sum(d for d, _ in segments) if segments else None,
        "target_duration": target_duration,
        "media_sequence": media_sequence,
        "ended": ended,
        "encrypted": encrypted,
        "segment_uris": [u for _, u in segments],
    }
