"""Charset sniffing/decoding (XmlDoc getCharset + iana_charset analogue)."""

from __future__ import annotations

from open_source_search_engine_spark.functions.charset import (
    decode_content, normalize_label, sniff_charset)


def test_bom_detection_beats_everything():
    body = "héllo".encode("utf-16-le")
    assert sniff_charset(b"\xff\xfe" + body,
                         "text/html; charset=iso-8859-1") == ("utf-16-le",
                                                              "bom")
    assert sniff_charset(b"\xfe\xff" + "héllo".encode("utf-16-be"))[0] == \
        "utf-16-be"
    assert sniff_charset(b"\xef\xbb\xbfabc") == ("utf-8-sig", "bom")
    assert sniff_charset(b"\xff\xfe\x00\x00" + "x".encode("utf-32-le"))[0] \
        == "utf-32-le"


def test_http_header_charset_param():
    assert sniff_charset(b"abc", "text/html; charset=utf-8") == ("utf-8",
                                                                 "http")
    # quoted value, case-insensitive, alias-normalized
    assert sniff_charset(b"abc", 'Text/HTML; Charset="ISO-8859-1"') == \
        ("cp1252", "http")
    assert sniff_charset(b"abc", "text/html; charset=x-sjis")[0] == \
        "shift_jis"
    assert sniff_charset(b"abc", "text/html; charset=gb2312")[0] == "gb18030"
    # unknown label falls through to the probe
    assert sniff_charset(b"abc", "text/html; charset=klingon") == \
        ("utf-8", "utf8-probe")


def test_meta_tag_charset():
    html5 = b'<html><meta charset="windows-1252"><body>'
    assert sniff_charset(html5) == ("cp1252", "meta")
    legacy = (b'<meta http-equiv="Content-Type" '
              b'content="text/html; charset=iso-8859-1">')
    assert sniff_charset(legacy) == ("cp1252", "meta")
    # http header wins over meta
    assert sniff_charset(html5, "text/html; charset=utf-8") == ("utf-8",
                                                                "http")


def test_probe_and_fallback():
    assert sniff_charset("naïve".encode("utf-8")) == ("utf-8", "utf8-probe")
    # bytes invalid as utf-8 -> cp1252 fallback (every byte decodes)
    assert sniff_charset(b"caf\xe9") == ("cp1252", "fallback")
    text, codec, source = decode_content(b"caf\xe9")
    assert (text, codec, source) == ("café", "cp1252", "fallback")


def test_decode_round_trips_and_strips_bom():
    text, codec, source = decode_content(
        b"\xff\xfe" + "héllo ☃".encode("utf-16-le"))
    assert (text, codec, source) == ("héllo ☃", "utf-16-le", "bom")
    text, _, _ = decode_content(b"\xef\xbb\xbfabc")
    assert text == "abc"   # utf-8-sig consumes the BOM itself


def test_decode_never_raises_on_mislabel():
    # declared shift_jis but actually utf-8 bytes: replacement chars, no
    # exception (Unicode.cpp best-effort conversion)
    raw = "日本語テキスト".encode("utf-8")
    text, codec, _ = decode_content(raw, "text/html; charset=shift_jis")
    assert codec == "shift_jis" and isinstance(text, str)
    assert decode_content(b"", None) == ("", "utf-8", "empty")
    assert decode_content(None, None)[2] == "empty"


def test_label_normalization():
    assert normalize_label("UTF8") == "utf-8"
    assert normalize_label("latin1") == "cp1252"
    assert normalize_label("us-ascii") == "cp1252"
    assert normalize_label("not-a-charset") is None


def test_spark_charset_query_all_round_trip(spark):
    from open_source_search_engine_spark.queries import QUERIES
    rows = QUERIES["content_charset_decode"](
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    assert all(r["round_trip"] for r in rows)
    sources = {r["charset_source"] for r in rows}
    assert {"bom", "http", "meta", "utf8-probe"} <= sources
    by_variant = {r["doc_id"] % 5: r["charset"] for r in rows}
    assert by_variant[1] == "utf-16-le"
    assert by_variant[2] == "cp1252"
    assert by_variant[4] == "shift_jis"
