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


def test_corpus_job_warc_input(spark, tmp_path):
    """--input-format warc: archives columnarize in-job, robots-noindex
    pages are dropped map-side, and the pipeline runs to an output."""
    import duckdb

    from jobs.run_corpus_pipeline import build_parser, run

    body = ("the quick brown fox jumps over the lazy dog and then it runs away "
            "with a happy smile because this is what foxes do in the morning "
            "when the sun is shining and the birds are singing in the trees ") * 3
    good = f"<html><body><p>{body}</p></body></html>".encode()
    noidx = (b'<html><head><meta name="robots" content="noindex"></head>'
             b"<body>" + body.encode() + b"</body></html>")
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "a.warc").write_bytes(build_warc_bytes([
        {"url": "https://keep.com/p", "ts": dt.datetime(2026, 1, 1), "html": good},
        {"url": "https://drop.com/p", "ts": dt.datetime(2026, 1, 1), "html": noidx},
    ]))
    out = str(tmp_path / "out")
    msg = run(spark, build_parser().parse_args(
        ["--input", str(d), "--input-format", "warc", "--output", out]
    ))
    assert " in -> " in msg
    urls = [r[0] for r in duckdb.sql(f"SELECT url FROM read_parquet('{out}/*.parquet')").fetchall()]
    assert "https://drop.com/p" not in urls


def test_warc_roundtrip_hypothesis():
    """Property fuzz: arbitrary payload bytes (including CRLF runs and
    WARC-looking content) survive the serialize->parse round trip."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    payload = st.binary(min_size=0, max_size=400)
    urls = st.from_regex(r"https://[a-z]{1,8}\.com/[a-z0-9]{0,6}", fullmatch=True)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(urls, payload), min_size=1, max_size=5))
    def check(items):
        recs = [
            {"url": u, "ts": dt.datetime(2026, 1, 1, 0, 0, i % 60), "html": b}
            for i, (u, b) in enumerate(items)
        ]
        got = list(parse_warc_bytes(build_warc_bytes(recs)))
        assert [(g["url"], g["html"]) for g in got] == [(r["url"], r["html"]) for r in recs]

    check()


def test_corpus_job_warc_main_content(spark, tmp_path):
    """--main-content on the WARC path: nav/footer chrome is absent
    from the stored text while the article body survives."""
    import duckdb

    from jobs.run_corpus_pipeline import build_parser, run

    # keep needs a repairable JSON payload (keep_expr: repaired != '""')
    body = ("the quick brown fox jumps over the lazy dog and then it runs away "
            "with a happy smile because this is what foxes do in the morning "
            "when the sun rises over the hills and the birds start to sing "
            "while the river flows quietly past the old stone bridge in town "
            "and the baker opens the shop to sell warm bread to the people "
            "who record the event as {'fox': True, 'count': 3,} every day "
            "before they go back to the fields to work until the evening")
    # the footer carries a JSON-ish tracking blob: without block
    # classification it would reach the repair kernel alongside the
    # article's payload and corrupt the extracted document
    page = (
        '<html><body><div><a href="/">Home</a> <a href="/a">About</a> '
        '<a href="/c">Contact</a> <a href="/d">Docs</a></div>'
        f"<p>{body}</p>"
        '<footer>© <a href="/l">Legal</a> <a href="/p">Priv</a> '
        "<a href=\"/t\">Terms</a> {'spam': 99}</footer>"
        "</body></html>"
    ).encode()
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "a.warc").write_bytes(build_warc_bytes([
        {"url": "https://keep.com/p", "ts": dt.datetime(2026, 1, 1), "html": page},
    ]))
    out = str(tmp_path / "out")
    msg = run(spark, build_parser().parse_args(
        ["--input", str(d), "--input-format", "warc", "--main-content",
         "--output", out]
    ))
    assert " in -> 1 out" in msg
    text = duckdb.sql(
        f"SELECT text FROM read_parquet('{out}/*.parquet')").fetchone()[0]
    # only the article block fed the repair kernel: the payload is the
    # body's JSON, and the footer's tracking blob never reached it
    assert text == '{"fox":true,"count":3}'
    assert "spam" not in text
