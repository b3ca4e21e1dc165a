"""PII detection/redaction: exact counts, typed redaction, report
aggregation, DuckDB oracle parity, and plan shape (no shuffle/UDF)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from autoprepad_spark.operators.pii import (
    PII_PATTERNS,
    REDACTION_TOKENS,
    pii_profile,
    pii_report,
    redact_pii,
)

DOCS = [
    ("a", "web", "contact john.doe+x@example.co.uk or jane@sub.domain.org"),
    ("b", "web", "server 192.168.1.255 and 10.0.0.1, call 555-123-4567 or +1 800 555-1234"),
    ("c", "books", "ssn 123-45-6789 card 4111-1111-1111-1111 also 1234 5678 9012 3456"),
    ("d", "books", "no pii, just numbers 12345 and 1.5 and a.b"),
    ("e", "web", "edge: a@b.co 999.999.999.999 000-00-0000 +123-456-7890"),
    ("f", "books", ""),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "source", "text"])


def _duck_profile(text: str) -> tuple[dict, str]:
    con = duckdb.connect()
    counts, red = {}, text
    for k, p in PII_PATTERNS.items():
        counts[f"n_{k}"] = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [text, p]
        ).fetchone()[0]
        red = con.execute(
            "SELECT regexp_replace(?, ?, ?, 'g')", [red, p, REDACTION_TOKENS[k]]
        ).fetchone()[0]
    return counts, red


def test_profile_matches_duckdb_oracle(spark):
    rows = {r["doc_id"]: r for r in pii_profile(_docs(spark)).collect()}
    for doc_id, _, text in DOCS:
        counts, red = _duck_profile(text)
        got = rows[doc_id]
        for k, v in counts.items():
            assert got[k] == v, (doc_id, k, got[k], v)
        assert got["n_pii"] == sum(counts.values())
        assert got["text_redacted"] == red, doc_id


def test_redaction_is_typed_and_ordered(spark):
    # cc must win over phone/ssn on a 4x4 digit run; ssn over phone
    out = (
        _docs(spark)
        .filter("doc_id = 'c'")
        .select(redact_pii("text").alias("r"))
        .collect()[0]["r"]
    )
    assert "[CC]" in out and out.count("[CC]") == 2
    assert "[SSN]" in out and "[PHONE]" not in out
    # empty text stays empty, no nulls introduced
    out_f = (
        _docs(spark).filter("doc_id = 'f'")
        .select(redact_pii("text").alias("r")).collect()[0]["r"]
    )
    assert out_f == ""


def test_report_grouped_matches_oracle(spark):
    rep = {r["source"]: r for r in pii_report(_docs(spark), group_col="source").collect()}
    exp = {}
    for doc_id, source, text in DOCS:
        counts, _ = _duck_profile(text)
        e = exp.setdefault(source, {f"n_{k}": 0 for k in PII_PATTERNS} | {"docs_with_pii": 0, "n_docs": 0})
        for k, v in counts.items():
            e[k] += v
        e["docs_with_pii"] += int(sum(counts.values()) > 0)
        e["n_docs"] += 1
    assert set(rep) == set(exp)
    for src, e in exp.items():
        for k, v in e.items():
            assert rep[src][k] == v, (src, k, rep[src][k], v)


def test_plan_is_scan_only(spark):
    """Detection is per-row: the profile plan must contain no exchange
    and no Python UDF (pure codegen regex over one scan)."""
    plan = pii_profile(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEvalPython" not in plan
