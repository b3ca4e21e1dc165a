"""Cross-document paragraph dedup: exact-python oracle parity, keep
semantics, edge cases, and plan shape (windowed keyed exchanges only)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from autoprepad_spark.operators.dedup import (
    split_paragraphs,
    strip_duplicate_paragraphs,
)

DOCS = [
    ("a", "the quick fox\n\ncookie banner text\n\nunique tail a"),
    ("b", "cookie banner text\n\nanother body b"),
    ("c", "COOKIE   banner    TEXT\n\n\nthe quick fox\n\nunique tail c"),
    ("d", "only here once"),
    ("e", "cookie banner text"),  # doc that is ONLY boilerplate
    ("f", "   \n\n  "),  # blank-only doc
]


def _norm(p: str) -> str:
    return re.sub(r"\s+", " ", p.lower()).strip()


def _python_oracle(docs, keep="first"):
    paras = []  # (doc_id, idx, para)
    for doc_id, text in docs:
        for i, p in enumerate(re.split(r"\n\s*\n", text)):
            if p.strip():
                paras.append((doc_id, i, p))
    seen: dict = {}
    for doc_id, i, p in sorted(paras, key=lambda t: (t[0], t[1])):
        seen.setdefault(_norm(p), []).append((doc_id, i, p))
    out = {doc_id: [] for doc_id, _ in docs}
    for occ in seen.values():
        if keep == "first":
            doc_id, i, p = occ[0]
            out[doc_id].append((i, p))
        elif keep == "none" and len(occ) == 1:
            doc_id, i, p = occ[0]
            out[doc_id].append((i, p))
    return {
        doc_id: "\n\n".join(p for _, p in sorted(ps)) for doc_id, ps in out.items()
    }


def _spark_result(spark, keep="first"):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    res = strip_duplicate_paragraphs(df, keep=keep)
    return {r["doc_id"]: r["text"] for r in res.collect()}


def test_keep_first_matches_python_oracle(spark):
    assert _spark_result(spark, "first") == _python_oracle(DOCS, "first")


def test_keep_none_matches_python_oracle(spark):
    assert _spark_result(spark, "none") == _python_oracle(DOCS, "none")


def test_every_normalized_paragraph_survives_exactly_once(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    res = strip_duplicate_paragraphs(df)
    from autoprepad_spark.operators.dedup import normalize_text

    survivors = split_paragraphs(res).select(
        F.md5(normalize_text("para")).alias("h")
    )
    counts = survivors.groupBy("h").count().collect()
    assert all(r["count"] == 1 for r in counts)
    originals = split_paragraphs(df).select(
        F.md5(normalize_text("para")).alias("h")
    )
    assert {r["h"] for r in counts} == {
        r["h"] for r in originals.distinct().collect()
    }


def test_non_text_columns_pass_through(spark):
    df = spark.createDataFrame(
        [("a", "web", "x\n\nx"), ("b", "news", "x")],
        ["doc_id", "source", "text"],
    )
    rows = {r["doc_id"]: r for r in strip_duplicate_paragraphs(df).collect()}
    assert rows["a"]["source"] == "web" and rows["b"]["source"] == "news"
    assert rows["a"]["text"] == "x" and rows["b"]["text"] == ""


def test_deterministic_across_partitioning(spark):
    df1 = spark.createDataFrame(DOCS, ["doc_id", "text"]).repartition(1)
    df8 = spark.createDataFrame(DOCS, ["doc_id", "text"]).repartition(8)
    r1 = {r["doc_id"]: r["text"] for r in strip_duplicate_paragraphs(df1).collect()}
    r8 = {r["doc_id"]: r["text"] for r in strip_duplicate_paragraphs(df8).collect()}
    assert r1 == r8
