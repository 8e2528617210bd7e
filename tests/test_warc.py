"""WARC 1.1 per-record-gzip container walk: grammar validation,
multi-member boundaries from the DEFLATE stream, corruption sweep.
Full-corpus value gate: warc_record_stats."""

from __future__ import annotations

import zlib

import pytest

from advisorydatapipeline_spark.operators.warc import (
    HTTP_HEADER,
    build_warc_gz,
    parse_warc_gz,
    warc_stats,
)


def test_roundtrip_and_stats():
    html = b"<html><body>Hello &amp; world</body></html>"
    recs = parse_warc_gz(build_warc_gz(42, html))
    n, nr, uri, st, octets = warc_stats(recs)
    assert (n, nr, st) == (3, 1, 200)
    assert uri == "https://site42.com/page42"
    assert octets == len(html)
    types = [h["WARC-Type"] for h, _ in recs]
    assert types == ["warcinfo", "request", "response"]
    for h, body in recs:
        assert int(h["Content-Length"]) == len(body)


def test_member_boundaries_without_length_fields():
    # concatenated members must split exactly even when bodies
    # contain CRLFCRLF and gzip-magic-looking bytes
    html = b"\x1f\x8b\r\n\r\nWARC/1.1 fake " * 20
    recs = parse_warc_gz(build_warc_gz(7, html))
    assert len(recs) == 3
    assert recs[2][1] == HTTP_HEADER + html


def test_corruption_sweep_no_silent_wrong_stats():
    html = b"<p>content with some length to it</p>"
    good = build_warc_gz(5, html)
    want = warc_stats(parse_warc_gz(good))
    for i in range(len(good)):
        bad = good[:i] + bytes([good[i] ^ 0xFF]) + good[i + 1 :]
        try:
            got = warc_stats(parse_warc_gz(bad))
            assert got == want, f"silent corruption at byte {i}"
        except ValueError:
            pass


def test_truncation_and_garbage():
    good = build_warc_gz(5, b"<p>x</p>")
    for cut in (1, 10, len(good) // 2, len(good) - 1):
        with pytest.raises(ValueError):
            parse_warc_gz(good[:cut])
    with pytest.raises(ValueError):
        parse_warc_gz(b"")
    with pytest.raises(ValueError):
        parse_warc_gz(b"not a warc at all")


def test_content_length_mismatch_rejected():
    # hand-build a record whose Content-Length lies by one
    rec = (b"WARC/1.1\r\nWARC-Type: warcinfo\r\n"
           b"Content-Length: 3\r\n\r\nABCD\r\n\r\n")
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    payload = co.compress(rec) + co.flush()
    with pytest.raises(ValueError):
        parse_warc_gz(payload)


def test_version_check():
    rec = b"WARC/0.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    with pytest.raises(ValueError):
        parse_warc_gz(co.compress(rec) + co.flush())
