"""WARC → pages source: parse Common-Crawl-style WARC files into the
input_hint page shape ``(url, warc_ts, html, text, lang)`` with no
external dependencies (no warcio in this environment — the parser below
implements the WARC/1.0 record grammar directly: header block terminated
by CRLFCRLF, body of exactly Content-Length bytes, records separated by
CRLFCRLF).

Scale shape: files load via Spark's ``binaryFile`` source (one row per
file — WARC segments are ~1 GB, the unit a real crawl pipeline
schedules anyway; ``maxPartitionBytes`` has no effect on binaryFile, so
parallelism == number of files, matching how Common Crawl publishes
80k+ segments per snapshot). Record splitting + header parsing runs in
one ``mapInPandas`` pass per file (Arrow-batched, no per-record Python
round trips through the JVM), emitting only ``response`` records. Text
extraction reuses the canonical ``html_to_text`` kernel — the same
byte-identical function the featurizer uses.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGE_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_CRLF2 = b"\r\n\r\n"


def parse_warc_bytes(raw: bytes) -> Iterator[tuple]:
    """Yield (url, warc_ts_str, body_bytes) for every ``response`` record.

    Tolerant of gzip (whole-file or per-record member concatenation —
    the Common Crawl layout — handled by gzip's multi-member decompress)
    and of trailing junk; malformed records are skipped, not fatal
    (crawl files contain truncated tails in practice).
    """
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    pos = 0
    n = len(raw)
    while pos < n:
        head_end = raw.find(_CRLF2, pos)
        if head_end < 0:
            return
        header_blob = raw[pos:head_end]
        if not header_blob.lstrip().startswith(b"WARC/"):
            return
        headers = {}
        for line in header_blob.split(b"\r\n")[1:]:
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            return
        body = raw[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        # records are separated by two CRLFs
        while raw[pos : pos + 2] == b"\r\n":
            pos += 2
        if headers.get(b"warc-type") != b"response":
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts = headers.get(b"warc-date", b"").decode("ascii", "replace")
        # body is an HTTP response: strip its status line + headers
        http_end = body.find(_CRLF2)
        payload = body[http_end + 4 :] if http_end >= 0 else body
        if url:
            yield url, ts, payload


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC file(s) into the page table shape. ``path`` accepts the
    same globs as ``binaryFile`` (dir, *.warc, *.warc.gz)."""
    from pyspark.sql import functions as F

    from ccer.functions.normalize import html_to_text

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tss, bodies, texts = [], [], [], []
            for raw in pdf["content"]:
                for url, ts, body in parse_warc_bytes(bytes(raw)):
                    urls.append(url)
                    tss.append(ts)
                    bodies.append(body)
                    texts.append(html_to_text(body))
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype="object"),
                    "warc_ts_raw": pd.Series(tss, dtype="object"),
                    "html": pd.Series(bodies, dtype="object"),
                    "text": pd.Series(texts, dtype="object"),
                }
            )

    parsed = files.mapInPandas(
        parse, "url string, warc_ts_raw string, html binary, text string"
    )
    return parsed.select(
        "url",
        F.to_timestamp("warc_ts_raw").alias("warc_ts"),
        "html",
        "text",
        F.lit(None).cast("string").alias("lang"),
    )
