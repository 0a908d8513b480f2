"""Unit tests for the WARC parser + HTML extractor (pipeline/warc.py):
Content-Length framing past in-payload decoys, record-type handling,
HTTP parsing, and the text-extraction rules the oracle leans on."""

from __future__ import annotations

import pytest

from hive_clone_spark.pipeline.warc import (
    _DECOY,
    extract_text,
    parse_http_response,
    parse_warc,
    synth_html,
    synth_warc_file,
)


def test_framing_survives_in_payload_decoy():
    """Every response payload contains a blank CRLF line followed by
    'WARC/1.1' — split-on-blank-line parsing would produce phantom
    records; length framing must not."""
    blob = synth_warc_file([(1, "alpha"), (2, "beta")])
    assert b"\r\n\r\nWARC/1.1 decoy" in blob
    recs = parse_warc(blob)
    types = [r["headers"]["warc-type"] for r in recs]
    assert types == ["warcinfo", "request", "response", "request", "response"]


def test_payload_bytes_match_declared_length():
    blob = synth_warc_file([(5, "some text here")])
    for rec in parse_warc(blob):
        assert len(rec["payload"]) == int(rec["headers"]["content-length"])


def test_bad_version_line_raises():
    blob = synth_warc_file([(1, "x")])
    # corrupt the framing so the walker lands mid-payload
    broken = blob.replace(b"Content-Length", b"Content-Lxngth", 1)
    with pytest.raises((ValueError, KeyError)):
        parse_warc(broken)


def test_http_response_parse():
    blob = synth_warc_file([(9, "payload body")])
    resp = [r for r in parse_warc(blob) if r["headers"]["warc-type"] == "response"]
    status, headers, body = parse_http_response(resp[0]["payload"])
    assert status == 200
    assert headers["content-type"] == "text/html"
    assert int(headers["content-length"]) == len(body)


def test_extract_strips_script_comment_tags_and_unescapes():
    html = synth_html(13, "a < b & c")
    text = extract_text(html)
    assert text == "doc 13 a < b & c link 1 link 2 link 3"
    assert "var x" not in text
    assert "decoy" not in text
    assert "href" not in text


def test_extract_collapses_whitespace():
    assert extract_text("<p>a\n\n  b\t c</p>") == "a b c"


def test_zero_links_for_multiple_of_five():
    text = extract_text(synth_html(10, "t"))
    assert text == "doc 10 t"


def test_decoy_constant_has_blank_line():
    assert "\r\n\r\n" in _DECOY


# ---------------------------------------------------------------------------
# .warc.gz: concatenated per-record gzip members (round-7 verdict task 3)
# ---------------------------------------------------------------------------
def test_gzip_file_parses_identically_to_plain():
    docs = [(1, "alpha"), (2, "beta < & >"), (7, "gamma")]
    plain = parse_warc(synth_warc_file(docs))
    gz = parse_warc(synth_warc_file(docs, gzip_records=True))
    assert [(r["headers"], r["payload"]) for r in gz] == [
        (r["headers"], r["payload"]) for r in plain
    ]


def test_each_record_is_its_own_gzip_member():
    """The spec-conformant (and Common-Crawl-actual) layout: one gzip
    member per record, so a reader can start at any member boundary.
    Count members by walking them and check 1 record per member."""
    from hive_clone_spark.pipeline.warc import gunzip_members

    docs = [(1, "a"), (2, "b")]
    blob = synth_warc_file(docs, gzip_records=True)
    members = gunzip_members(blob)
    assert len(members) == 1 + 2 * len(docs)  # warcinfo + (req, resp) per doc
    for m in members:
        assert len(parse_warc(m)) == 1


def test_member_boundaries_are_exact():
    """Re-concatenating the individually re-compressed members must
    reproduce a parseable stream, and a member walk must consume the
    whole input (no inter-member slack)."""
    import zlib

    from hive_clone_spark.pipeline.warc import gunzip_members

    blob = synth_warc_file([(3, "x"), (4, "y")], gzip_records=True)
    members = gunzip_members(blob)
    total = 0
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(31)
        d.decompress(blob[pos:])
        consumed = len(blob) - pos - len(d.unused_data)
        assert consumed > 0
        total += consumed
        pos += consumed
    assert total == len(blob)
    assert b"".join(members)[:5] == b"WARC/"


def test_truncated_gzip_member_raises():
    blob = synth_warc_file([(1, "x")], gzip_records=True)
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(blob[:-10])


def test_mixed_plain_then_gzip_corpus():
    """p_warc_extract feeds both framings through one parser — emulate
    the two file kinds and check the union of records round-trips."""
    plain = parse_warc(synth_warc_file([(11, "p")]))
    gz = parse_warc(synth_warc_file([(12, "g")], gzip_records=True))
    uris = [
        r["headers"].get("warc-target-uri")
        for r in plain + gz
        if r["headers"]["warc-type"] == "response"
    ]
    assert uris == ["https://ex.test/11", "https://ex.test/12"]


def test_chunked_response_dechunks():
    from hive_clone_spark.pipeline.warc import parse_http_response

    body = b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    payload = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + body
    )
    status, headers, out = parse_http_response(payload)
    assert status == 200 and out == b"hello world"


def test_chunk_extension_ignored():
    from hive_clone_spark.pipeline.warc import parse_http_response

    payload = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"3;ext=val\r\nabc\r\n0\r\n\r\n"
    )
    assert parse_http_response(payload)[2] == b"abc"


def test_chunk_framing_errors_raise():
    import pytest as _pytest

    from hive_clone_spark.pipeline.warc import _dechunk

    with _pytest.raises(ValueError):
        _dechunk(b"3\r\nabcX\r\n0\r\n\r\n")  # missing chunk CRLF
    with _pytest.raises(ValueError):
        _dechunk(b"3\r\nabc\r\n0\r\nTrailer: x\r\n\r\n")  # trailers


def test_synth_mixes_chunked_records():
    from hive_clone_spark.pipeline.warc import (
        parse_http_response,
        parse_warc,
        synth_warc_file,
        synth_html,
        extract_text,
    )

    docs = [(i, f"text for doc {i}") for i in range(4, 16)]
    data = synth_warc_file(docs)
    seen_chunked = seen_identity = 0
    for rec in parse_warc(data):
        if rec["headers"].get("warc-type") != "response":
            continue
        status, hh, body = parse_http_response(rec["payload"])
        doc_id = int(rec["headers"]["warc-target-uri"].rsplit("/", 1)[1])
        if doc_id % 6 == 1:
            assert hh.get("transfer-encoding") == "chunked"
            seen_chunked += 1
        else:
            seen_identity += 1
        # framing-independent invariant: body is the exact HTML
        assert body.decode() == synth_html(doc_id, f"text for doc {doc_id}")
        assert extract_text(body.decode()).startswith(f"doc {doc_id}")
    assert seen_chunked >= 2 and seen_identity >= 8
