"""WARC source: synthetic archive round-trip (plain + gzip-member),
record fields, HTML text extraction, document projection, plan shape."""

import gzip

import pytest

from autoprepad_spark.sources import warc as W

HTML = (
    b"<html><head><title>T</title><style>p{color:red}</style>"
    b"<script>var x=1;</script></head>"
    b"<body><!-- c --><p>Hello &amp; welcome</p><p>Second&nbsp;para</p>"
    b"</body></html>"
)


def _record(headers: dict, block: bytes) -> bytes:
    head = "".join(f"{k}: {v}\r\n" for k, v in headers.items())
    return (
        f"WARC/1.0\r\n{head}Content-Length: {len(block)}\r\n\r\n"
    ).encode() + block + b"\r\n\r\n"


def _http_response(body: bytes, ctype=b"text/html; charset=utf-8") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype
        + b"\r\nServer: x\r\n\r\n" + body
    )


def _make_warc() -> list[bytes]:
    return [
        _record(
            {"WARC-Type": "warcinfo", "WARC-Record-ID": "<urn:uuid:0>",
             "Content-Type": "application/warc-fields"},
            b"software: synthetic\r\n",
        ),
        _record(
            {"WARC-Type": "request", "WARC-Record-ID": "<urn:uuid:1>",
             "WARC-Target-URI": "http://example.com/",
             "Content-Type": "application/http;msgtype=request"},
            b"GET / HTTP/1.1\r\nHost: example.com\r\n\r\n",
        ),
        _record(
            {"WARC-Type": "response", "WARC-Record-ID": "<urn:uuid:2>",
             "WARC-Target-URI": "http://example.com/",
             "WARC-Date": "2024-01-02T03:04:05Z",
             "Content-Type": "application/http;msgtype=response"},
            _http_response(HTML),
        ),
        _record(
            {"WARC-Type": "response", "WARC-Record-ID": "<urn:uuid:3>",
             "WARC-Target-URI": "http://example.com/404",
             "Content-Type": "application/http;msgtype=response"},
            b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\ngone",
        ),
    ]


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    recs = _make_warc()
    (d / "plain.warc").write_bytes(b"".join(recs))
    # Common Crawl layout: one gzip member per record
    (d / "members.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in recs)
    )
    return str(d)


def test_reference_parser_roundtrip(warc_dir):
    recs = list(W.parse_warc_bytes("f", b"".join(_make_warc())))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "request", "response", "response",
    ]
    ok = recs[2]
    assert ok["record_id"] == "<urn:uuid:2>"
    assert ok["target_uri"] == "http://example.com/"
    assert ok["http_status"] == 200
    assert ok["http_content_type"].startswith("text/html")
    assert ok["payload"] == HTML
    assert recs[3]["http_status"] == 404


def test_read_warc_both_layouts(spark, warc_dir):
    df = W.read_warc(spark, warc_dir).cache()
    try:
        rows = df.collect()
        assert len(rows) == 8  # 4 records x 2 files
        by_file = {}
        for r in rows:
            by_file.setdefault(r["warc_file"].rsplit("/", 1)[-1], []).append(r)
        for recs in by_file.values():
            assert sorted(r["warc_type"] for r in recs) == [
                "request", "response", "response", "warcinfo",
            ]
        gz = [r for r in by_file["members.warc.gz"]
              if r["record_id"] == "<urn:uuid:2>"][0]
        assert bytes(gz["payload"]) == HTML
    finally:
        df.unpersist()


def test_warc_to_documents_and_html_text(spark, warc_dir):
    docs = W.warc_to_documents(W.read_warc(spark, warc_dir)).collect()
    # only the 200 text/html response survives, once per file
    assert len(docs) == 2
    for d in docs:
        assert d["doc_id"] == "<urn:uuid:2>"
        assert d["url"] == "http://example.com/"
        assert d["fetch_date"] == "2024-01-02T03:04:05Z"
        assert d["text"] == "T Hello & welcome Second para"


def test_scan_plan_has_no_shuffle(spark, warc_dir):
    plan = (
        W.warc_to_documents(W.read_warc(spark, warc_dir))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_truncated_trailing_member_is_tolerated(warc_dir):
    full = b"".join(gzip.compress(r) for r in _make_warc())
    recs = list(W.parse_warc_bytes("f", full[: len(full) - 10]))
    # the three complete leading records still parse
    assert [r["warc_type"] for r in recs[:3]] == [
        "warcinfo", "request", "response",
    ]


def test_wet_to_documents(spark, tmp_path):
    text = "Extracted page text.\nSecond line.".encode()
    rec = _record(
        {"WARC-Type": "conversion", "WARC-Record-ID": "<urn:uuid:7>",
         "WARC-Target-URI": "http://example.com/page",
         "WARC-Date": "2024-02-03T00:00:00Z",
         "Content-Type": "text/plain"},
        text,
    )
    (tmp_path / "x.warc.wet.gz").write_bytes(gzip.compress(rec))
    docs = W.wet_to_documents(W.read_warc(spark, str(tmp_path))).collect()
    assert len(docs) == 1
    d = docs[0]
    assert d["doc_id"] == "<urn:uuid:7>"
    assert d["url"] == "http://example.com/page"
    assert d["text"] == "Extracted page text.\nSecond line."
