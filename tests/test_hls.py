"""HLS playlist parsing (RFC 8216): attribute-list grammar, master
variant ladder, media-playlist duration arithmetic, live-vs-VOD,
encryption detection — fixtures composed per the RFC's own examples."""

from __future__ import annotations

import pytest

from sample_dms_kinesis_rds_mariadb_spark.operators.hls import (
    is_m3u8,
    parse_attribute_list,
    parse_m3u8,
)


def test_attribute_list_grammar():
    attrs = parse_attribute_list(
        'BANDWIDTH=1280000,CODECS="avc1.640028,mp4a.40.2",'
        "RESOLUTION=1920x1080,FRAME-RATE=29.97"
    )
    # the quoted value keeps its comma; the split never breaks on it
    assert attrs["CODECS"] == "avc1.640028,mp4a.40.2"
    assert attrs["BANDWIDTH"] == "1280000"
    assert attrs["RESOLUTION"] == "1920x1080"
    assert attrs["FRAME-RATE"] == "29.97"
    # unterminated quote degrades to what was parsed so far
    assert parse_attribute_list('A=1,B="oops')["A"] == "1"


def test_master_playlist_variant_ladder():
    m3u8 = b"""#EXTM3U
#EXT-X-STREAM-INF:BANDWIDTH=800000,RESOLUTION=640x360,CODECS="avc1.42e00a,mp4a.40.2"
low/index.m3u8
#EXT-X-STREAM-INF:BANDWIDTH=2800000,RESOLUTION=1920x1080,CODECS="avc1.640028,mp4a.40.2"
high/index.m3u8
"""
    assert is_m3u8(m3u8)
    m = parse_m3u8(m3u8)
    assert m["kind"] == "master" and len(m["variants"]) == 2
    assert m["max_bandwidth"] == 2800000
    # best_resolution drives the reported dims
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["codecs"] == "avc1.640028,mp4a.40.2"
    assert m["variants"][0]["uri"] == "low/index.m3u8"


def test_media_playlist_vod():
    m3u8 = b"""#EXTM3U
#EXT-X-VERSION:3
#EXT-X-TARGETDURATION:10
#EXT-X-MEDIA-SEQUENCE:0
#EXTINF:9.009,
seg0.ts
#EXTINF:9.009,first title
seg1.ts
#EXTINF:3.003,
seg2.ts
#EXT-X-ENDLIST
"""
    m = parse_m3u8(m3u8)
    assert m["kind"] == "media" and m["n_segments"] == 3
    assert m["duration_sec"] == pytest.approx(21.021)
    assert m["target_duration"] == 10.0
    assert m["ended"] is True and m["encrypted"] is False
    assert m["segment_uris"] == ["seg0.ts", "seg1.ts", "seg2.ts"]


def test_media_playlist_live_and_encrypted():
    m3u8 = b"""#EXTM3U
#EXT-X-TARGETDURATION:6
#EXT-X-MEDIA-SEQUENCE:2680
#EXT-X-KEY:METHOD=AES-128,URI="https://k.example/key",IV=0x1234
#EXTINF:6.0,
s2680.ts
#EXTINF:6.0,
s2681.ts
"""
    m = parse_m3u8(m3u8)
    assert m["ended"] is False  # live: no ENDLIST
    assert m["encrypted"] is True
    assert m["media_sequence"] == 2680
    none_key = m3u8.replace(b"METHOD=AES-128", b"METHOD=NONE")
    assert parse_m3u8(none_key)["encrypted"] is False


def test_not_a_playlist_raises_and_unknown_tags_skip():
    with pytest.raises(ValueError):
        parse_m3u8(b"GET / HTTP/1.1")
    assert not is_m3u8(b"plain text")
    m = parse_m3u8(b"#EXTM3U\n#EXT-X-FUTURE-TAG:x=1\n#EXTINF:2.0,\na.ts\n")
    assert m["n_segments"] == 1  # unknown tag ignored per RFC


def test_media_sweep_dispatches_m3u8():
    from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
        media_container_metadata,
    )

    master = (b"#EXTM3U\n"
              b'#EXT-X-STREAM-INF:BANDWIDTH=2800000,RESOLUTION=1280x720,'
              b'CODECS="avc1.640028,mp4a.40.2"\nhigh.m3u8\n')
    m = media_container_metadata(master)
    assert m["container"] == "m3u8"
    assert (m["width"], m["height"]) == (1280, 720)
    assert m["video_codec"] == "avc1.640028"
    assert m["audio_codec"] == "mp4a.40.2"
    media = b"#EXTM3U\n#EXTINF:6.0,\na.ts\n#EXTINF:4.5,\nb.ts\n#EXT-X-ENDLIST\n"
    m2 = media_container_metadata(media)
    assert m2["container"] == "m3u8"
    assert m2["duration_sec"] == 10.5 and m2["width"] is None


def test_review_fixes_bom_blank_lines_codec_classes():
    """Review fixes: BOM/blank-line-tolerant sniff AND parse agree;
    Dolby Vision classifies as video; text codecs (wvtt) classify as
    neither; the sniff is the single implementation."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
        _classify_hls_codecs,
        media_container_metadata,
    )

    blank_led = b"\n\n#EXTM3U\n#EXTINF:2.0,\na.ts\n#EXT-X-ENDLIST\n"
    assert is_m3u8(blank_led)
    assert parse_m3u8(blank_led)["n_segments"] == 1
    bom = b"\xef\xbb\xbf#EXTM3U\n#EXTINF:2.0,\na.ts\n"
    assert is_m3u8(bom) and parse_m3u8(bom)["n_segments"] == 1
    assert media_container_metadata(blank_led)["container"] == "m3u8"
    got = _classify_hls_codecs("dvh1.05.06,ec-3")
    assert got == {"video_codec": "dvh1.05.06", "audio_codec": "ec-3"}
    got = _classify_hls_codecs("wvtt,mp4a.40.2")
    assert got == {"video_codec": None, "audio_codec": "mp4a.40.2"}
    assert _classify_hls_codecs(None) == {"video_codec": None,
                                          "audio_codec": None}
