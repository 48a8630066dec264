"""WARC source: synthesize a WARC/1.0 file (plain + gzip), parse it into
the page shape, and check record filtering, HTTP header stripping, and
the byte-identical html_to_text invariant."""

import gzip

from ccer.sources.warc import parse_warc_bytes, read_warc


def _record(wtype, url, date, http_body):
    body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + http_body
        if wtype == b"response"
        else http_body
    )
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + wtype + b"\r\n"
        b"WARC-Target-URI: " + url + b"\r\n"
        b"WARC-Date: " + date + b"\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n"
    )
    return head + b"\r\n" + body + b"\r\n\r\n"


def _warc_bytes():
    return (
        _record(
            b"warcinfo", b"", b"2024-01-01T00:00:00Z", b"software: synthetic\r\n"
        )
        + _record(
            b"response",
            b"https://example.org/a",
            b"2024-03-05T12:00:00Z",
            b"<html><head><title>A</title></head><body><p>Hello A</p></body></html>",
        )
        + _record(
            b"request",
            b"https://example.org/a",
            b"2024-03-05T12:00:00Z",
            b"GET /a HTTP/1.1\r\n",
        )
        + _record(
            b"response",
            b"https://example.org/b",
            b"2024-03-05T13:00:00Z",
            b"<html><body><p>Hello B</p></body></html>",
        )
    )


def test_parse_warc_bytes_plain_and_gzip():
    raw = _warc_bytes()
    for blob in (raw, gzip.compress(raw)):
        recs = list(parse_warc_bytes(blob))
        assert [r[0] for r in recs] == [
            "https://example.org/a",
            "https://example.org/b",
        ]
        # HTTP headers stripped: payload starts at the html
        assert recs[0][2].startswith(b"<html>")
        assert recs[0][1] == "2024-03-05T12:00:00Z"


def test_parse_warc_truncated_tail():
    raw = _warc_bytes() + b"WARC/1.0\r\nWARC-Type: response\r\ngarbage"
    assert len(list(parse_warc_bytes(raw))) == 2


def test_committed_fixture_matches_driver_oracle():
    """Drift guard for the driver-gated ``warc_parse`` query: re-derive
    the expected rows from the COMMITTED fixture bytes with the plain-
    Python parser + text kernel and assert they equal the VALUES literal
    in SQL_WARC_PARSE (via DuckDB). Any change to the fixture, the
    record grammar, or html_to_text that forgets to regenerate the
    oracle (jobs/make_warc_fixture.py) fails here, not in the driver."""
    import hashlib
    import os

    import duckdb

    from ccer.functions.normalize import html_to_text
    from ccer.plans.driver_queries import SQL_WARC_PARSE

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    rows = []
    for name in ("cc_sample.warc", "cc_sample.warc.gz"):
        with open(os.path.join(fixdir, name), "rb") as fh:
            blob = fh.read()
        for url, ts, body in parse_warc_bytes(blob):
            text = html_to_text(body)
            rows.append(
                (
                    url,
                    ts.replace("T", " ").rstrip("Z"),
                    len(body),
                    hashlib.md5(text.encode("utf-8")).hexdigest(),
                )
            )
    expected = duckdb.sql(SQL_WARC_PARSE).fetchall()
    assert sorted(rows) == sorted(expected)


def test_read_warc_page_shape(spark, tmp_path):
    from ccer.functions.normalize import html_to_text

    p = tmp_path / "seg.warc.gz"
    p.write_bytes(gzip.compress(_warc_bytes()))
    df = read_warc(spark, str(p))
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {"https://example.org/a", "https://example.org/b"}
    assert df.columns == ["url", "warc_ts", "html", "text", "lang"]
    a = rows["https://example.org/a"]
    assert a["warc_ts"].year == 2024 and a["warc_ts"].hour == 12
    # byte-identical invariant: text == canonical kernel over the html
    assert a["text"] == html_to_text(bytes(a["html"]))
    assert "Hello A" in a["text"]
