"""Regenerate the committed deterministic WARC fixtures used by the
driver-gated ``warc_parse`` query (ccer/plans/driver_queries.py) and
print the expected rows it must produce.

Two files under tests/fixtures/:

- ``cc_sample.warc``     plain WARC/1.0: warcinfo + 3 responses +
                         1 request + 1 metadata record + a truncated
                         tail record (must be skipped, not fatal)
- ``cc_sample.warc.gz``  whole-file gzip (mtime=0 so the bytes are
                         reproducible) with 2 more responses

The expected rows are computed HERE with the plain-Python parser +
text kernel (no Spark), so the driver's oracle — a VALUES literal —
is derived independently of the Spark plan under test. Re-run this
script after any intentional change to ``parse_warc_bytes`` or
``html_to_text`` and paste the printed SQL into SQL_WARC_PARSE.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ccer.functions.normalize import html_to_text  # noqa: E402
from ccer.sources.warc import parse_warc_bytes  # noqa: E402

FIXDIR = os.path.join(REPO, "tests", "fixtures")


def record(wtype: bytes, url: bytes, date: bytes, http_body: bytes) -> bytes:
    body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        + http_body
        if wtype == b"response"
        else http_body
    )
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + wtype + b"\r\n"
        + (b"WARC-Target-URI: " + url + b"\r\n" if url else b"")
        + b"WARC-Date: " + date + b"\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n"
    )
    return head + b"\r\n" + body + b"\r\n\r\n"


HTML_ALPHA = (
    b"<html><head><title>Alpha &amp; Omega</title>"
    b"<style>p { color: red; }</style></head>"
    b"<body><h1>Alpha</h1><script>var x = 1;</script>"
    b"<p>First  paragraph with &quot;entities&quot; &lt;ok&gt;.</p>"
    b"<p>Second paragraph.</p><!-- hidden comment --></body></html>"
)
HTML_BETA = (
    b"<html><body><div>Beta page</div><ul><li>one</li><li>two</li></ul>"
    b"</body></html>"
)
HTML_ALPHA_RSS = HTML_ALPHA.replace(b"Second paragraph.", b"Second paragraph!")
HTML_GAMMA = (
    b"<html><head><title>Gamma</title></head><body>"
    b"<p>Caf\xc3\xa9 r\xc3\xa9sum\xc3\xa9 \xe2\x80\x94 unicode survives.</p>"
    b"</body></html>"
)
HTML_DELTA = b"<html><body><pre>delta\nraw\nlines</pre></body></html>"


def plain_warc() -> bytes:
    return (
        record(b"warcinfo", b"", b"2024-01-01T00:00:00Z", b"software: synthetic\r\n")
        + record(
            b"response",
            b"https://example.com/articles/alpha",
            b"2024-03-05T12:00:00Z",
            HTML_ALPHA,
        )
        + record(
            b"request",
            b"https://example.com/articles/alpha",
            b"2024-03-05T12:00:00Z",
            b"GET /articles/alpha HTTP/1.1\r\n",
        )
        + record(
            b"response",
            b"https://example.com/articles/beta",
            b"2024-03-05T13:30:45Z",
            HTML_BETA,
        )
        + record(
            b"metadata",
            b"https://example.com/articles/beta",
            b"2024-03-05T13:30:45Z",
            b"fetchTimeMs: 12\r\n",
        )
        + record(
            b"response",
            b"https://example.com/articles/alpha?ref=rss",
            b"2024-03-06T02:10:00Z",
            HTML_ALPHA_RSS,
        )
        # truncated tail: header cut mid-stream — parser must stop cleanly
        + b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://exa"
    )


def gz_warc() -> bytes:
    raw = record(
        b"response",
        b"https://example.net/pages/gamma",
        b"2024-04-01T08:15:30Z",
        HTML_GAMMA,
    ) + record(
        b"response",
        b"https://example.net/pages/delta",
        b"2024-04-01T09:00:00Z",
        HTML_DELTA,
    )
    import io

    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    return buf.getvalue()


def main() -> None:
    os.makedirs(FIXDIR, exist_ok=True)
    plain = plain_warc()
    gzb = gz_warc()
    with open(os.path.join(FIXDIR, "cc_sample.warc"), "wb") as fh:
        fh.write(plain)
    with open(os.path.join(FIXDIR, "cc_sample.warc.gz"), "wb") as fh:
        fh.write(gzb)

    rows = []
    for blob in (plain, gzb):
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
    rows.sort()
    print("expected rows (url, warc_ts_iso, n_html_bytes, text_md5):")
    for r in rows:
        print("  ", r)
    values = ",\n    ".join(
        f"('{u}', '{t}', {n}, '{m}')" for u, t, n, m in rows
    )
    print("\nSQL_WARC_PARSE = \"\"\"\nSELECT * FROM (VALUES\n    " + values)
    print(") AS t(url, warc_ts_iso, n_html_bytes, text_md5)\n\"\"\"")


if __name__ == "__main__":
    main()
