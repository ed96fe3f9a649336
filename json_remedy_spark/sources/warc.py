"""WARC source: read Common-Crawl-style WARC files into the
input_hint page table ``(url, warc_ts, html)``.

Real 100 TB crawls arrive as ~1 GB ``.warc(.gz)`` files (ISO 28500:
records framed as ``WARC/1.0\\r\\n<headers>\\r\\n\\r\\n<payload>``;
response-record payloads are an HTTP message whose body is the page).
The FILE is the unit of parallelism — Spark lists the directory,
assigns whole files to tasks (``binaryFile`` source), and each task
parses its file sequentially, which is exactly how production CC jobs
shard (one task per WARC, 64k WARCs per crawl).  Records stream out
of a generator, so a task holds one file + one Arrow batch, not the
exploded file.

Whole-file and multi-member gzip are handled (``gzip.decompress``
concatenates members, which covers per-record-gzipped archives read
as one blob).

``build_warc_bytes`` is the deterministic serializer used by tests:
parser and serializer are independent code paths, so the round-trip
equality check is non-circular.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGE_SCHEMA = "url string, warc_ts timestamp, html binary"

_CRLF = b"\r\n"


def build_warc_bytes(records: list[dict]) -> bytes:
    """Serialize ``[{url, ts (datetime), html (bytes), status?}]`` as
    a minimal valid WARC/1.0 byte stream of response records (each
    payload a complete HTTP message)."""
    out = io.BytesIO()
    for r in records:
        status = r.get("status", 200)
        http = (
            f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: text/html\r\n"
            f"Content-Length: {len(r['html'])}\r\n\r\n"
        ).encode() + r["html"]
        headers = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: response" + _CRLF
            + b"WARC-Target-URI: " + r["url"].encode() + _CRLF
            + b"WARC-Date: " + r["ts"].strftime("%Y-%m-%dT%H:%M:%SZ").encode() + _CRLF
            + b"Content-Length: " + str(len(http)).encode() + _CRLF
        )
        out.write(headers + _CRLF + http + _CRLF + _CRLF)
    return out.getvalue()


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """Yield ``{url, ts, html}`` for every response record.  Non-
    response records (warcinfo, request, metadata) are skipped; a
    malformed tail truncates cleanly rather than raising — a damaged
    archive must cost its remaining records, not the job."""
    if data[:2] == b"\x1f\x8b":  # gzip magic (whole-file or members)
        data = gzip.decompress(data)
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        head_end = data.find(_CRLF + _CRLF, start)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[start:head_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts_raw = headers.get("warc-date", "")
        try:
            ts = _dt.datetime.strptime(ts_raw, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            ts = None
        # payload = HTTP message; page bytes follow the header block
        split = body.find(_CRLF + _CRLF)
        html = body[split + 4 :] if split >= 0 else body
        yield {"url": url, "ts": ts, "html": html}


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """``(url, warc_ts, html)`` from a directory/glob of .warc(.gz)
    files.  binaryFile listing + one generator per file; column
    pruning upstream of this source is moot (WARC is a stream format
    — this op IS the columnarization, after which everything is
    parquet/Iceberg)."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def gen(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                rows = list(parse_warc_bytes(bytes(blob)))
                if rows:
                    yield pd.DataFrame(
                        {
                            "url": [r["url"] for r in rows],
                            "warc_ts": [r["ts"] for r in rows],
                            "html": [r["html"] for r in rows],
                        }
                    )

    return files.mapInPandas(gen, schema=PAGE_SCHEMA)
