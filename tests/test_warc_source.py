"""WARC source round-trips: the serializer (build_warc_bytes) and the
parser (parse_warc_bytes / read_warc_pages) are independent code
paths, so byte-equality through the pair is a non-circular check."""

import datetime as dt
import gzip

from json_remedy_spark.sources.warc import (
    build_warc_bytes,
    parse_warc_bytes,
    read_warc_pages,
)

RECORDS = [
    {"url": "https://a.com/1", "ts": dt.datetime(2026, 1, 2, 3, 4, 5),
     "html": b"<html><body>alpha</body></html>"},
    {"url": "https://b.org/2", "ts": dt.datetime(2026, 2, 3, 4, 5, 6),
     "html": "<html>\xe9t\xe9 page</html>".encode("utf-8")},
    {"url": "https://c.net/3", "ts": dt.datetime(2026, 3, 4, 5, 6, 7),
     "html": b"<html>" + b"\xff\xfe" + b"raw bytes</html>"},  # invalid UTF-8 preserved
]


def test_parse_roundtrip_plain_and_gzip():
    blob = build_warc_bytes(RECORDS)
    for data in (blob, gzip.compress(blob)):
        got = list(parse_warc_bytes(data))
        assert [(r["url"], r["ts"], r["html"]) for r in got] == [
            (r["url"], r["ts"], r["html"]) for r in RECORDS
        ]


def test_parse_skips_non_response_and_truncated_tail():
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n")
    blob = info + build_warc_bytes(RECORDS[:1]) + b"WARC/1.0\r\nWARC-Type: resp"  # damaged tail
    got = list(parse_warc_bytes(blob))
    assert len(got) == 1 and got[0]["url"] == RECORDS[0]["url"]


def test_read_warc_pages_spark(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "part-0.warc").write_bytes(build_warc_bytes(RECORDS[:2]))
    (d / "part-1.warc.gz").write_bytes(gzip.compress(build_warc_bytes(RECORDS[2:])))
    rows = {r["url"]: r for r in read_warc_pages(spark, str(d)).collect()}
    assert set(rows) == {r["url"] for r in RECORDS}
    for r in RECORDS:
        got = rows[r["url"]]
        assert bytes(got["html"]) == r["html"]
        assert got["warc_ts"] == r["ts"]


def test_warc_to_input_table_text_extraction(spark, tmp_path):
    """The composed WARC -> (url, warc_ts, html) -> html_to_text chain
    recovers the page's visible text."""
    from pyspark.sql import functions as F

    from json_remedy_spark.functions.webgraph import html_to_text

    d = tmp_path / "w"
    d.mkdir()
    recs = [{"url": "https://x.com/p", "ts": dt.datetime(2026, 1, 1),
             "html": b"<html><script>no</script><body>hello <b>crawl</b> world</body></html>"}]
    (d / "f.warc").write_bytes(build_warc_bytes(recs))
    pages = read_warc_pages(spark, str(d))
    out = pages.select(
        "url", html_to_text(F.col("html").cast("string")).alias("text")
    ).collect()[0]
    assert out["text"] == "hello crawl world"
