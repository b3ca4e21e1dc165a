"""WARC source: Common Crawl-style web-archive ingestion.

The reference has no web source (its only ingest is pandas CSV,
/root/reference/main.py:16); this is part of the beyond-reference
training-data surface — the raw-input end of the corpus pipeline
(WARC -> documents -> clean_corpus).

Scale design. A crawl ships as MANY ~1 GB WARC files (Common Crawl
publishes ~64k-90k per monthly crawl), each a concatenation of records,
usually gzip member-per-record so readers can stream without decoding
the whole file. The natural Spark unit of parallelism is therefore the
FILE, not the byte range: ``binaryFile`` lists the files distributedly,
one task parses one file, and 64k files saturate any cluster. Parsing is
``mapInPandas`` (Arrow batches of file rows in, record rows out) with a
stdlib-only parser: ``zlib`` member iteration for gzipped records (magic
``1f 8b``), plain concatenated records otherwise. No whole-crawl state,
no shuffle — the scan is embarrassingly parallel and column pruning
still applies downstream (drop ``payload`` early if only metadata is
needed).

Honest limits, stated: ``binaryFile`` materializes one file per row, so
per-task memory is O(largest file) — correct for the standard ~1 GB
crawl layout, wrong for a single multi-TB WARC (re-split such inputs
upstream). ``spark.sql.files.maxPartitionBytes`` does not chunk binary
files; it only groups small ones.

``html_text_expr`` is a pure Column expression cascade (regexp_replace,
whole-stage codegen — no Python in the hot path): drop script/style/
comment blocks, strip tags, decode the common entities, collapse
whitespace. A heuristic extractor by declaration — boilerplate removal
beyond this is `clean_corpus`'s job (C4 line rules, Gopher gates).
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

#: output schema of read_warc — stable driver contract
WARC_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "http_status int, http_content_type string, payload binary"
)

_GZIP_MAGIC = b"\x1f\x8b"


def _gzip_members(blob: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members (member-per-record
    WARCs) one member at a time — stdlib zlib, no temp files."""
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=47)  # gzip wrapper
        out = d.decompress(blob[pos:])
        if d.eof:
            consumed = len(blob) - pos - len(d.unused_data)
        else:  # truncated trailing member: surface what decoded, stop
            consumed = len(blob) - pos
        yield out + d.flush()
        pos += max(consumed, 1)


def _split_records(blob: bytes) -> Iterator[tuple[dict, bytes]]:
    """(headers, block) per WARC record in a plain (decompressed)
    concatenation. Tolerates the \r\n\r\n record separators and skips
    garbage between records by scanning to the next 'WARC/' magic."""
    pos = 0
    n = len(blob)
    while pos < n:
        start = blob.find(b"WARC/", pos)
        if start < 0:
            return
        head_end = blob.find(b"\r\n\r\n", start)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        for line in blob[start:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = head_end + 4
            continue
        body_start = head_end + 4
        yield headers, blob[body_start : body_start + length]
        pos = body_start + length


def _parse_http_response(block: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) from an HTTP response payload; the
    raw block comes back unharmed when it isn't HTTP."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0 or not block.startswith(b"HTTP/"):
        return None, None, block
    head = block[:sep].split(b"\r\n")
    try:
        status = int(head[0].split(b" ")[1])
    except (IndexError, ValueError):
        return None, None, block
    ctype = None
    for line in head[1:]:
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("utf-8", "replace")
            break
    return status, ctype, block[sep + 4 :]


def parse_warc_bytes(name: str, blob: bytes) -> Iterator[dict]:
    """All records of one WARC file (gzipped-member or plain) as plain
    dicts — the driver-side reference the tests share with the UDF."""
    if blob[:2] == _GZIP_MAGIC:
        stream = b"".join(_gzip_members(blob))
    else:
        stream = blob
    for headers, block in _split_records(stream):
        status, http_ctype, payload = (None, None, block)
        ctype = headers.get("content-type", "")
        if ctype.startswith("application/http"):
            status, http_ctype, payload = _parse_http_response(block)
        yield {
            "warc_file": name,
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": ctype or None,
            "http_status": status,
            "http_content_type": http_ctype,
            "payload": payload,
        }


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Scan a directory/glob of WARC files into one record per row
    (WARC_SCHEMA). File-level parallelism; no shuffle."""
    files = spark.read.format("binaryFile").load(path)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.split(" ")[0] for f in WARC_SCHEMA.split(", ")]
        for pdf in batches:
            rows = [
                rec
                for _, r in pdf.iterrows()
                for rec in parse_warc_bytes(r["path"], bytes(r["content"]))
            ]
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(_parse, WARC_SCHEMA)


def html_text_expr(col: Column | str) -> Column:
    """HTML -> visible text as a codegen expression cascade (no Python):
    drop script/style/comments, strip tags, decode common entities,
    collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.regexp_replace(c, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]+>", " ")
    for ent, rep in (
        ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"),
        ("&gt;", ">"), ("&quot;", "\""), ("&#39;", "'"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def wet_to_documents(records: DataFrame) -> DataFrame:
    """WET files (Common Crawl's pre-extracted text) are WARC files
    whose payload-bearing records are ``conversion`` type with
    ``text/plain`` blocks — same read_warc scan, no HTML pass needed."""
    conv = records.filter(
        (F.col("warc_type") == "conversion")
        & F.col("content_type").startswith("text/plain")
    )
    return conv.select(
        F.col("record_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("fetch_date"),
        F.decode(F.col("payload"), "UTF-8").alias("text"),
    )


def warc_to_documents(records: DataFrame) -> DataFrame:
    """HTML response records -> (doc_id, url, fetch_date, text): the
    corpus-pipeline input frame. Row-local (filter + project); doc_id is
    the WARC record id (globally unique per the spec)."""
    html = records.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("http_content_type").startswith("text/html")
    )
    return html.select(
        F.col("record_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("fetch_date"),
        html_text_expr(
            F.decode(F.col("payload"), "UTF-8")
        ).alias("text"),
    )
